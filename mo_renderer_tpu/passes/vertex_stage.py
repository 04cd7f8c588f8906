"""Vertex stage — the batched replacement of gbuffer.vert / shadow vs.

The reference transforms vertices per draw call with push-constant matrices
(gbuffer.vert:31-52, shadow_pass.rs:292-313).  Here ALL meshes transform at
once: per-vertex mesh ids gather the world/normal matrices and one batched
matmul produces every clip/world-space quantity for the frame.  Everything
downstream (raster, interpolation) consumes these arrays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class VertexOutputs:
    world_pos: jnp.ndarray  # (V, 3)
    clip: jnp.ndarray  # (V, 4) camera clip space
    prev_clip: jnp.ndarray  # (V, 4) previous-view clip space (velocity)
    shadow_clip: jnp.ndarray  # (V, 4) light clip space
    inv_w: jnp.ndarray  # (V,) 1/clip.w (perspective-correct barycentrics)
    world_normal: jnp.ndarray  # (V, 3) N = normalize(normal_mat * n)
    world_tangent: jnp.ndarray  # (V, 3) T = normalize(normal_mat * t.xyz)
    world_bitangent: jnp.ndarray  # (V, 3) B = normalize(normal_mat * (n x t)*t.w)
    has_tangent: jnp.ndarray  # (V,) bool (model tangent != 0)

    def tree_flatten(self):
        return tuple(
            getattr(self, f.name) for f in dataclasses.fields(self)
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _normalize(v, eps=1e-20):
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), eps))


def run_vertex_stage(scene, proj_view, prev_proj_view, light_proj_view):
    """scene: SceneBuffers; matrices (4,4) m[row,col]."""
    # gather the per-mesh matrices as FLAT rows: (4,4)-slice gathers can
    # hit XLA's serial windowed-gather emitter (catastrophic at scale —
    # a measured 4.4s for 2M 2D slices, NOTES_PERF.md); 16-wide row
    # gathers always take the fast row path.  At 7K verts both happen to
    # measure the same today, so this is insurance, not a speedup.
    from ..device.sampling import take_rows

    m = scene.mesh_world.shape[0]
    world = take_rows(
        scene.mesh_world.reshape(m, 16), scene.vertex_mesh
    ).reshape(-1, 4, 4)
    nmat = take_rows(
        scene.mesh_normal_mat.reshape(m, 9), scene.vertex_mesh
    ).reshape(-1, 3, 3)

    pos1 = jnp.concatenate(
        [scene.position, jnp.ones_like(scene.position[:, :1])], axis=-1
    )
    world_pos4 = jnp.einsum("vij,vj->vi", world, pos1)
    world_pos = world_pos4[:, :3]

    clip = world_pos4 @ proj_view.T
    prev_clip = world_pos4 @ prev_proj_view.T
    shadow_clip = world_pos4 @ light_proj_view.T
    inv_w = 1.0 / jnp.where(jnp.abs(clip[:, 3]) > 1e-20, clip[:, 3], 1.0)

    # TBN (gbuffer.vert:37-44): bitangentL = cross(n, t.xyz) * t.w in model
    # space; each column normalized after the normal-matrix transform.
    n_model = scene.normal
    t_model = scene.tangent[:, :3]
    bit_model = jnp.cross(n_model, t_model) * scene.tangent[:, 3:4]
    world_normal = _normalize(jnp.einsum("vij,vj->vi", nmat, n_model))
    world_tangent = _normalize(jnp.einsum("vij,vj->vi", nmat, t_model))
    world_bitangent = _normalize(jnp.einsum("vij,vj->vi", nmat, bit_model))
    has_tangent = jnp.any(scene.tangent[:, :3] != 0.0, axis=-1)

    return VertexOutputs(
        world_pos=world_pos,
        clip=clip,
        prev_clip=prev_clip,
        shadow_clip=shadow_clip,
        inv_w=inv_w,
        world_normal=world_normal,
        world_tangent=world_tangent,
        world_bitangent=world_bitangent,
        has_tangent=has_tangent,
    )


# Packed per-triangle corner attributes: one (T, 35) row per triangle so
# the G-buffer pass fetches ALL corner data with a single row gather per
# pixel (XLA TPU gathers cost ~7ns per index; the naive path does 27
# per-corner gathers).  Clip/prev-clip/shadow positions and 1/w are NOT
# packed — they are exact linear functions of world position and are
# recomputed per pixel from the proj-view matrices.
TRI_WP0 = 0          # 3 x world_pos (9)
TRI_N0 = 9           # 3 x world_normal (9)
TRI_T0 = 18          # 3 x world_tangent (9)
TRI_UV0 = 27         # 3 x uv0 (6)
TRI_MAT = 33         # material id (1)
TRI_HANDED = 34      # 0 = no tangent; +-1 = tangent.w handedness sign
TRI_STRIDE = 35      # geometry columns; materials.fast_used_cols rows
                     # follow (resolved per triangle at pack time)
# Corner BITANGENTS are not packed: consumers recompute
# B = cross(N, T) * handed per pixel from the interpolated
# normal/tangent, with the handedness sign folded into TRI_HANDED
# (documented deviation from the reference's per-vertex bitangent,
# gbuffer.vert:37-44 — identical for rotation/uniform-scale transforms
# up to interpolation order; pinned by tests/test_fast_frame.py).
# uv1 is NOT packed: the fast paths sample UV set 0 only (scenes using
# UV1 fall back to gbuffer_pass, which reads scene.uv1 directly).


# Channel-major layout for in-raster attribute interpolation
# (kernels/rasterizer.rasterize_attrs).  The extra columns appended after
# the 16 raster-setup columns are:
#   0..2   per-corner 1/clip_w (perspective correction)
#   3..44  14 interpolated channels x 3 corners (a0, a1, a2 adjacent):
#          wp.xyz, n.xyz, t.xyz, bt.xyz, uv0.uv
#   45     material id (flat per triangle)
#   46     has_tangent (flat)
RA_N_INTERP = 14
RA_EXTRA_COLS = 3 + 3 * RA_N_INTERP + 2  # 47


def pack_raster_attr_columns(tri_attrs, proj_view) -> jnp.ndarray:
    """(T, 35) tri_attrs + proj_view -> (T, 47) extra raster columns.

    Reorders the corner-major tri_attrs rows into channel-major triplets
    and prepends per-corner 1/w so the Pallas raster kernel can do exact
    perspective-correct interpolation in VMEM (the w row of proj_view is
    linear in world position — same identity gbuffer_pass_fast uses).
    Corner bitangents are synthesized here (cross(N, T) * handed — the
    rows no longer carry them) so the kernel still interpolates all 14
    channels unchanged.
    """
    pv3 = proj_view[3]

    def corner_iw(k):
        wp = tri_attrs[:, TRI_WP0 + 3 * k : TRI_WP0 + 3 * (k + 1)]
        w = wp[:, 0] * pv3[0] + wp[:, 1] * pv3[1] + wp[:, 2] * pv3[2] + pv3[3]
        return 1.0 / jnp.where(jnp.abs(w) > 1e-20, w, 1.0)

    handed = tri_attrs[:, TRI_HANDED]
    corner_bt = [
        jnp.cross(
            tri_attrs[:, TRI_N0 + 3 * k : TRI_N0 + 3 * (k + 1)],
            tri_attrs[:, TRI_T0 + 3 * k : TRI_T0 + 3 * (k + 1)],
        ) * handed[:, None]
        for k in range(3)
    ]

    cols = [corner_iw(k)[:, None] for k in range(3)]
    for base, width in (
        (TRI_WP0, 3), (TRI_N0, 3), (TRI_T0, 3),
    ):
        for j in range(width):
            for k in range(3):
                cols.append(tri_attrs[:, base + k * width + j, None])
    for j in range(3):  # bitangent channel triplets
        for k in range(3):
            cols.append(corner_bt[k][:, j, None])
    for j in range(2):  # uv0
        for k in range(3):
            cols.append(tri_attrs[:, TRI_UV0 + k * 2 + j, None])
    cols.append(tri_attrs[:, TRI_MAT, None])
    cols.append(jnp.abs(handed)[:, None])  # has_tangent flag
    return jnp.concatenate(cols, axis=-1)


def pack_triangle_attributes(scene, vs: VertexOutputs,
                             used_cols: tuple = ()) -> jnp.ndarray:
    """(T, 35 + len(used_cols)) f32 corner-attribute rows (gathered per
    pixel downstream).  used_cols (materials.fast_used_cols, static)
    appends that material-table column subset per triangle — the fast
    G-buffer path then reads material constants straight from the row
    instead of a per-pixel one-hot matmul."""
    i0, i1, i2 = (scene.indices[:, k] for k in range(3))

    def corners(attr):  # (V, C) -> (T, 3*C)
        return jnp.concatenate(
            [jnp.take(attr, i, axis=0) for i in (i0, i1, i2)], axis=-1
        )

    mat_idx = jnp.take(scene.mesh_material, scene.tri_mesh, axis=0)
    mat_id = mat_idx.astype(jnp.float32)
    # handedness column: 0 when the mesh has no tangents, else the sign
    # of tangent.w (glTF: +-1, uniform per primitive in practice) — the
    # consumer rebuilds the bitangent as cross(N, T) * handed
    has_t = jnp.take(vs.has_tangent, i0, axis=0).astype(jnp.float32)
    tw = jnp.take(scene.tangent[:, 3], i0, axis=0)
    handed = has_t * jnp.where(tw < 0.0, -1.0, 1.0)
    parts = [
        corners(vs.world_pos),
        corners(vs.world_normal),
        corners(vs.world_tangent),
        corners(scene.uv0),
        mat_id[:, None],
        handed[:, None],
    ]
    if used_cols:
        sel = scene.materials[:, jnp.asarray(used_cols)]
        parts.append(jnp.take(sel, mat_idx, axis=0))
    return jnp.concatenate(parts, axis=-1)
