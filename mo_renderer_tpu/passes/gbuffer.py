"""G-buffer pass — attribute interpolation + texturing over the visibility
buffer (the fused equivalent of gbuffer.vert varyings + gbuffer.frag).

The reference's MRT layout (gbuffer_pass.rs:61-129): base_color rgba8,
position rgba32f, normal rgba16f, emissive rgba16f, ORM rgba8, velocity
rg32f, depth d32.  Here each target is a float32 array (quantization only
at output — can only reduce error).  Deviations from the reference, all
documented:

- ``position`` stores WORLD-space position.  The reference stores
  model-space (gbuffer.frag:69) which only matches world space for
  identity transforms (as in the stock pbr_ibl example) and breaks
  lighting otherwise; with identity transforms the two are equal.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..assets import materials as M
from ..device import sampling
from ..kernels.tonemap import srgb_to_linear
from .vertex_stage import (
    TRI_HANDED,
    TRI_MAT,
    TRI_N0,
    TRI_STRIDE,
    TRI_T0,
    TRI_UV0,
    TRI_WP0,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GBuffer:
    base_color: jnp.ndarray  # (H, W, 3) linear
    position: jnp.ndarray  # (H, W, 3) world space
    normal: jnp.ndarray  # (H, W, 3)
    emissive: jnp.ndarray  # (H, W, 3)
    orm: jnp.ndarray  # (H, W, 3) occlusion, roughness, metallic
    velocity: jnp.ndarray  # (H, W, 2)
    depth: jnp.ndarray  # (H, W)
    mask: jnp.ndarray  # (H, W) bool: covered pixels

    def tree_flatten(self):
        return tuple(
            getattr(self, f.name) for f in dataclasses.fields(self)
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _interp(attr, i0, i1, i2, bb0, bb1, bb2):
    """Perspective-correct interpolation of a (V, C) attribute."""
    a0 = jnp.take(attr, i0, axis=0)
    a1 = jnp.take(attr, i1, axis=0)
    a2 = jnp.take(attr, i2, axis=0)
    return a0 * bb0[..., None] + a1 * bb1[..., None] + a2 * bb2[..., None]


def _normalize(v, eps=1e-20):
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), eps))


def gbuffer_pass(tri, z, b0, b1, scene, vs) -> GBuffer:
    """tri/z/b0/b1: visibility buffer (H, W); scene: SceneBuffers;
    vs: VertexOutputs."""
    h, w = tri.shape
    covered = tri >= 0
    t = jnp.maximum(tri, 0)

    idx = jnp.take(scene.indices, t, axis=0)  # (H, W, 3)
    i0, i1, i2 = idx[..., 0], idx[..., 1], idx[..., 2]

    # perspective correction: q_i = b_i / w_i; B_i = q_i / sum(q)
    iw0 = jnp.take(vs.inv_w, i0, axis=0)
    iw1 = jnp.take(vs.inv_w, i1, axis=0)
    iw2 = jnp.take(vs.inv_w, i2, axis=0)
    b2 = 1.0 - b0 - b1
    q0 = b0 * iw0
    q1 = b1 * iw1
    q2 = b2 * iw2
    qs = q0 + q1 + q2
    qs = jnp.where(jnp.abs(qs) > 1e-20, qs, 1.0)
    bb0, bb1, bb2 = q0 / qs, q1 / qs, q2 / qs

    world_pos = _interp(vs.world_pos, i0, i1, i2, bb0, bb1, bb2)
    uv0 = _interp(scene.uv0, i0, i1, i2, bb0, bb1, bb2)
    uv1 = _interp(scene.uv1, i0, i1, i2, bb0, bb1, bb2)
    n_in = _interp(vs.world_normal, i0, i1, i2, bb0, bb1, bb2)
    t_in = _interp(vs.world_tangent, i0, i1, i2, bb0, bb1, bb2)
    bt_in = _interp(vs.world_bitangent, i0, i1, i2, bb0, bb1, bb2)
    clip = _interp(vs.clip, i0, i1, i2, bb0, bb1, bb2)
    prev_clip = _interp(vs.prev_clip, i0, i1, i2, bb0, bb1, bb2)
    has_tangent = jnp.take(vs.has_tangent, i0, axis=0)  # uniform per mesh

    # material fetch by mesh (bindless.glsl material SSBO analog)
    mesh_id = jnp.take(scene.tri_mesh, t, axis=0)
    mat_id = jnp.take(scene.mesh_material, mesh_id, axis=0)
    mat = jnp.take(scene.materials, mat_id, axis=0)  # (H, W, 24)

    def mat_col(c):
        return mat[..., c]

    def sample_slot(map_col, uv_col):
        layer = mat_col(map_col).astype(jnp.int32)
        uv = jnp.where((mat_col(uv_col) == 0.0)[..., None], uv0, uv1)
        return sampling.sample_array_bilinear(
            scene.textures, layer, uv, sampling.REPEAT
        )

    base_rgba = sample_slot(M.MAT_BASE_COLOR_MAP, M.MAT_BASE_COLOR_UV)
    normal_map = sample_slot(M.MAT_NORMAL_MAP, M.MAT_NORMAL_UV)
    mr = sample_slot(M.MAT_MR_MAP, M.MAT_MR_UV)
    occ = sample_slot(M.MAT_OCCLUSION_MAP, M.MAT_OCCLUSION_UV)
    emis = sample_slot(M.MAT_EMISSIVE_MAP, M.MAT_EMISSIVE_UV)

    base_factor = mat[..., M.MAT_BASE_COLOR_FACTOR : M.MAT_BASE_COLOR_FACTOR + 4]
    base_color = srgb_to_linear(base_rgba[..., :3] * base_factor[..., :3])

    metallic = mr[..., 2] * mat_col(M.MAT_METALLIC_FACTOR)
    roughness = mr[..., 1] * mat_col(M.MAT_ROUGHNESS_FACTOR)
    occlusion = occ[..., 0]

    emissive_factor = mat[..., M.MAT_EMISSIVE_FACTOR : M.MAT_EMISSIVE_FACTOR + 3]
    emissive = emis[..., :3] * emissive_factor

    # normal mapping (gbuffer.frag:55-60): TBN only when tangents exist
    n_geo = _normalize(n_in)
    n_tex = _normalize(normal_map[..., :3] * 2.0 - 1.0)
    n_mapped = _normalize(
        t_in * n_tex[..., 0:1] + bt_in * n_tex[..., 1:2] + n_geo * n_tex[..., 2:3]
    )
    normal = jnp.where(has_tangent[..., None], n_mapped, n_geo)

    # velocity (gbuffer.frag:71-79): NDC01 with y flip, cur - prev
    velocity = _ndc01(clip) - _ndc01(prev_clip)

    # clear values (gbuffer_pass.rs:482-499): zeros + far depth
    m3 = covered[..., None]
    return GBuffer(
        base_color=jnp.where(m3, base_color, 0.0),
        position=jnp.where(m3, world_pos, 0.0),
        normal=jnp.where(m3, normal, 0.0),
        emissive=jnp.where(m3, emissive, 0.0),
        orm=jnp.where(
            m3, jnp.stack([occlusion, roughness, metallic], axis=-1), 0.0
        ),
        velocity=jnp.where(m3, velocity, 0.0),
        depth=z,
        mask=covered,
    )


def _ndc01(c):
    """Clip -> [0,1]^2 NDC with Vulkan y flip (gbuffer.frag:71-79)."""
    wc = jnp.where(jnp.abs(c[..., 3]) > 1e-20, c[..., 3], 1.0)
    a = (c[..., :2] / wc[..., None] + 1.0) * 0.5
    return jnp.stack([a[..., 0], 1.0 - a[..., 1]], axis=-1)


def _homogeneous_barycentrics(wp, pv, nx, ny):
    """Perspective-correct barycentrics straight from world-space corners.

    2D homogeneous rasterization (Olano & Greer): for a pixel at NDC
    (nx, ny) and clip-space corners (x_k, y_k, w_k), the 3D-linear
    interpolation weights satisfy sum_k bb_k (x_k - nx w_k) = 0 and the
    same in y, so bb is proportional to the cross product of
    u = x - nx*w and v = y - ny*w.  No per-corner divisions, and no
    dependency on the raster kernel's screen-space edge values — this is
    what lets the fast path run the slim 2-output visibility kernel.
    """
    def clip_row(p, r):
        return (
            p[..., 0] * pv[r, 0] + p[..., 1] * pv[r, 1]
            + p[..., 2] * pv[r, 2] + pv[r, 3]
        )

    u, v = [], []
    for k in range(3):
        xk = clip_row(wp[k], 0)
        yk = clip_row(wp[k], 1)
        wk = clip_row(wp[k], 3)
        u.append(xk - nx * wk)
        v.append(yk - ny * wk)
    q0 = u[1] * v[2] - u[2] * v[1]
    q1 = u[2] * v[0] - u[0] * v[2]
    q2 = u[0] * v[1] - u[1] * v[0]
    qs = q0 + q1 + q2
    qs = jnp.where(jnp.abs(qs) > 1e-30, qs, 1.0)
    return q0 / qs, q1 / qs, q2 / qs


def pixel_ndc(shape, full_wh, *, cb=False, y0=0):
    """NDC coordinates (nx, ny) of every pixel center of a visibility
    plane — (H, W) full-res, or the (H, W/2) checkerboard domain
    (columns 2j + (y & 1), kernels/decimate.decimate_cols) when cb.
    full_wh is the raster target size (the padded framebuffer that
    triangle_setup mapped NDC onto); y0 is the plane's first global
    pixel row (row-sharded bands)."""
    h, wd = shape
    full_w, full_h = full_wh
    yy = y0 + jnp.arange(h, dtype=jnp.int32)[:, None]
    if cb:
        xx = 2 * jnp.arange(wd, dtype=jnp.int32)[None, :] + (yy & 1)
    else:
        xx = jnp.broadcast_to(jnp.arange(wd, dtype=jnp.int32)[None, :], (h, wd))
    nx = (xx.astype(jnp.float32) + 0.5) * (2.0 / full_w) - 1.0
    ny = (yy.astype(jnp.float32) + 0.5) * (2.0 / full_h) - 1.0
    return nx, jnp.broadcast_to(ny, (h, wd))


def gbuffer_pass_fast(tri, z, b0, b1, scene, tri_attrs, params,
                      slot_map: tuple = (0, 1, 2, 3, 4),
                      cb: bool = False, full_wh=None, y0=0,
                      plane_kernel: bool = False,
                      stack_kernel: bool = False) -> GBuffer:
    """Gather-minimal G-buffer: typically 2-4 gathers per pixel total.

    1. one (T, 35) row gather for all corner attributes (packed by
       vertex_stage.pack_triangle_attributes),
    2. the material row via a one-hot MXU matmul (no gather),
    3. 0-3 texture-stack quad gathers covering the SAMPLED slots;
       constant slots (slot_map[k] < 0, i.e. the slot's layer is a
       uniform color for every material) read their per-material
       constant from the material table instead.

    b0/b1 may be None (the slim visibility kernel): perspective-correct
    barycentrics are then rebuilt per pixel from the packed world-space
    corners via _homogeneous_barycentrics — cb/full_wh/y0 describe the
    pixel domain of ``tri`` (see pixel_ndc).  Clip/prev-clip positions
    are recomputed from world position (exact — linear in it).
    Texturing assumes every slot samples UV set 0 (the caller falls back
    to gbuffer_pass when a material uses UV1).  ``slot_map`` must be the
    scene's ``stack_slots`` (host-read): the static stack layout.
    """
    covered = tri >= 0
    t = jnp.maximum(tri, 0)
    row = sampling.take_rows(tri_attrs, t)  # (H, W, 35 + n_mat)

    pv = params["proj_view"]
    prev_pv = params["prev_proj_view"]

    used_cols = M.fast_used_cols(slot_map)
    # fused attrs->planes Pallas kernel: consumes the gather result
    # in its native channel-minor layout and emits the (H, W) planes
    # directly, so XLA's gather-output relayout copy never exists
    # (kernels/attr_planes.py; cfg.attrs_plane_kernel).  Pixel streams
    # that don't tile into 1024-pixel blocks (e.g. some row-sharded
    # band shapes) silently use the identical XLA math below.
    from ..kernels import attr_planes as AP

    if (
        plane_kernel
        and b0 is None
        and AP.supports(*tri.shape)
        and row.shape[-1] == 35 + len(used_cols)
    ):
        if full_wh is None:
            full_wh = (tri.shape[1] * (2 if cb else 1), tri.shape[0])
        nx, ny = pixel_ndc(tri.shape, full_wh, cb=cb, y0=y0)
        # largest block that tiles the pixel stream (fewer grid steps =
        # better DMA efficiency; measured b32 > b16 > b8 standalone)
        p = tri.shape[0] * tri.shape[1]
        block_rows = next(
            b for b in (32, 16, 8) if p % (b * 128) == 0
        )
        planes = AP.attr_planes(
            row, nx, ny, pv, n_mat=len(used_cols), block_rows=block_rows,
        )
        world_pos = jnp.stack(planes[0:3], axis=-1)
        n_in = jnp.stack(planes[3:6], axis=-1)
        t_in = jnp.stack(planes[6:9], axis=-1)
        bt_in = jnp.stack(planes[9:12], axis=-1)
        uv0 = jnp.stack(planes[12:14], axis=-1)
        mat_id = planes[14].astype(jnp.int32)
        has_tangent = jnp.abs(planes[15]) > 0.5
        mat_cols = jnp.stack(planes[16:], axis=-1)
        wp1 = jnp.concatenate(
            [world_pos, jnp.ones_like(world_pos[..., :1])], -1
        )
        velocity = _ndc01(wp1 @ pv.T) - _ndc01(wp1 @ prev_pv.T)
        return _texture_and_assemble(
            covered, z, world_pos, n_in, t_in, bt_in, uv0, mat_id,
            has_tangent, velocity, scene, slot_map, mat_cols=mat_cols,
            stack_kernel=stack_kernel,
        )

    def corner(base, width, k):
        return row[..., base + width * k : base + width * (k + 1)]

    wp = [corner(TRI_WP0, 3, k) for k in range(3)]

    if b0 is None:
        if full_wh is None:
            full_wh = (tri.shape[1] * (2 if cb else 1), tri.shape[0])
        nx, ny = pixel_ndc(tri.shape, full_wh, cb=cb, y0=y0)
        bb0, bb1, bb2 = _homogeneous_barycentrics(wp, pv, nx, ny)
    else:
        # perspective correction from the raster kernel's screen-space
        # barycentrics: w_k = PV[3] . [wp_k, 1]
        def inv_w(p):
            w = (
                p[..., 0] * pv[3, 0] + p[..., 1] * pv[3, 1]
                + p[..., 2] * pv[3, 2] + pv[3, 3]
            )
            return 1.0 / jnp.where(jnp.abs(w) > 1e-20, w, 1.0)

        b2 = 1.0 - b0 - b1
        q0 = b0 * inv_w(wp[0])
        q1 = b1 * inv_w(wp[1])
        q2 = b2 * inv_w(wp[2])
        qs = q0 + q1 + q2
        qs = jnp.where(jnp.abs(qs) > 1e-20, qs, 1.0)
        bb0, bb1, bb2 = q0 / qs, q1 / qs, q2 / qs

    def interp(base, width):
        return (
            corner(base, width, 0) * bb0[..., None]
            + corner(base, width, 1) * bb1[..., None]
            + corner(base, width, 2) * bb2[..., None]
        )

    world_pos = interp(TRI_WP0, 3)
    n_in = interp(TRI_N0, 3)
    t_in = interp(TRI_T0, 3)
    uv0 = interp(TRI_UV0, 2)
    mat_id = row[..., TRI_MAT].astype(jnp.int32)
    handed = row[..., TRI_HANDED]
    has_tangent = jnp.abs(handed) > 0.5
    # bitangent recomputed per pixel (rows carry no corner bitangents —
    # 35 vs 44 gather bytes/row): B = cross(N, T) * tangent.w.  Matches
    # the reference's interpolated per-vertex bitangent (gbuffer.vert:
    # 37-44) exactly for rotation/uniform-scale transforms, up to
    # interpolation order (cross of interpolants vs interpolated cross —
    # second-order across a triangle; pinned by tests/test_fast_frame.py).
    bt_in = jnp.cross(n_in, t_in) * handed[..., None]

    # clip positions are linear in world pos: interpolate-then-project
    wp1 = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    velocity = _ndc01(wp1 @ pv.T) - _ndc01(wp1 @ prev_pv.T)

    # material columns ride the attrs row (packed per triangle by
    # vertex_stage.pack_triangle_attributes — the row gather is
    # index-count-bound, so they are nearly free here, vs ~1ms/frame
    # for the per-pixel one-hot matmul at 100+ materials)
    mat_cols = row[..., TRI_STRIDE : TRI_STRIDE + len(used_cols)]
    return _texture_and_assemble(
        covered, z, world_pos, n_in, t_in, bt_in, uv0, mat_id, has_tangent,
        velocity, scene, slot_map, mat_cols=mat_cols,
        stack_kernel=stack_kernel,
    )


def _texture_and_assemble(
    covered, z, world_pos, n_in, t_in, bt_in, uv0, mat_id, has_tangent,
    velocity, scene, slot_map, mat_cols=None, stack_kernel=False,
):
    """Shared fast-path tail: material fetch, texture-stack sampling,
    factor application, TBN normal mapping, G-buffer assembly.

    mat_cols: the per-pixel materials.fast_used_cols values when the
    caller already has them (gbuffer_pass_fast reads them off the attrs
    row).  When None (megakernel planes), the material row is fetched
    via a one-hot MXU matmul — the table is tiny (<=256 rows) and a
    matmul beats the gather emitter by ~25ms at 1080p; only the columns
    this path actually reads are multiplied (slot_map is static)."""
    used_cols = M.fast_used_cols(slot_map)
    col_pos = {c: i for i, c in enumerate(used_cols)}
    if mat_cols is not None:
        mat = mat_cols
    else:
        n_mats = scene.materials.shape[0]
        onehot = jax.nn.one_hot(mat_id, n_mats, dtype=jnp.float32)
        mat = jnp.einsum(
            "hwm,mc->hwc", onehot, scene.materials[:, jnp.asarray(used_cols)],
            precision=jax.lax.Precision.HIGHEST,
        )

    def col(c):
        return mat[..., col_pos[c]]

    def cols(c, n):  # contiguous in used_cols (added as ranges above)
        p = col_pos[c]
        return mat[..., p : p + n]

    # texture-stack gathers over the sampled slots only; each material's
    # stack entry has its own native size (MAT_STACK_BASE/SIZE), so the
    # bilinear index math runs with per-pixel sizes (REPEAT wrap)
    n_sampled = sum(1 for p in slot_map if p >= 0)
    if n_sampled > 0:
        base = col(M.MAT_STACK_BASE).astype(jnp.int32)
        se_f = col(M.MAT_STACK_SIZE)
        se_i = se_f.astype(jnp.int32)
        x = uv0[..., 0] * se_f - 0.5
        y = uv0[..., 1] * se_f - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        # REPEAT wrap: stack sizes are powers of two by construction
        # (scene_buffers pads every slot to pow2), so mod is a bitwise
        # AND — integer division is expensive per pixel on the VPU
        x0i = x0.astype(jnp.int32) & (se_i - 1)
        y0i = y0.astype(jnp.int32) & (se_i - 1)
        idx = base + y0i * se_i + x0i
        groups = [scene.texture_stack_a]
        if n_sampled > 2:
            groups.append(scene.texture_stack_b)
        if n_sampled > 4:
            groups.append(scene.texture_stack_c)
        # channels of each slot the assembly below actually reads
        # (base rgb, normal rgb, mr g+b, occlusion r, emissive rgb)
        slot_channels = ((0, 1, 2), (0, 1, 2), (1, 2), (0,), (0, 1, 2))
        px = covered.shape[0] * covered.shape[1]
        sk_rows = next(
            (
                b for b in (256, 240, 160, 128, 96, 64, 32, 16, 8)
                if px % 128 == 0 and (px // 128) % b == 0
            ),
            None,
        )
        use_sk = stack_kernel and sk_rows is not None
        if use_sk:
            # fused unpack+bilinear Pallas kernel consuming the gather
            # results in their native layout (kernels/stack_planes.py —
            # removes the u32 stack-row relayout, ~0.6ms at 1080p)
            from ..kernels import stack_planes as SP

            g_rows = [sampling.take_rows(g, idx) for g in groups]
            out_spec, plane_of = [], {}
            for k in range(5):
                p = slot_map[k]
                if p < 0:
                    continue
                for c in slot_channels[k]:
                    plane_of[(k, c)] = len(out_spec)
                    out_spec.append((p // 2, 4 * (p % 2), 8 * c))
            sk_planes = SP.stack_planes(
                g_rows, fx, fy, out_spec=tuple(out_spec),
                block_rows=sk_rows,
            )
        else:
            stack_row = jnp.concatenate(
                [sampling.take_rows(g, idx) for g in groups], axis=-1
            )  # (H, W, 4*n_sampled) uint32
            w00 = (1 - fx) * (1 - fy)
            w10 = fx * (1 - fy)
            w01 = (1 - fx) * fy
            w11 = fx * fy
    else:
        use_sk = False

    def slot(k):
        quad = stack_row[..., 4 * slot_map[k] : 4 * slot_map[k] + 4]
        chans = []
        for shift in (0, 8, 16, 24):
            v = ((quad >> shift) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
            chans.append(
                v[..., 0] * w00 + v[..., 1] * w10
                + v[..., 2] * w01 + v[..., 3] * w11
            )
        return jnp.stack(chans, axis=-1)  # (H, W, 4)

    def slot3(k):
        """Channels 0..2 of slot k as (H, W, 3)."""
        if slot_map[k] < 0:  # constant layer: per-material table value
            return cols(M.MAT_CONST_BASE + 4 * k, 4)[..., :3]
        if use_sk:
            return jnp.stack(
                [sk_planes[plane_of[(k, c)]] for c in (0, 1, 2)], axis=-1
            )
        return slot(k)[..., :3]

    def slot1(k, c):
        """Channel c of slot k as (H, W)."""
        if slot_map[k] < 0:
            return cols(M.MAT_CONST_BASE + 4 * k, 4)[..., c]
        if use_sk:
            return sk_planes[plane_of[(k, c)]]
        return slot(k)[..., c]

    base_factor = cols(M.MAT_BASE_COLOR_FACTOR, 4)
    base_color = srgb_to_linear(slot3(0) * base_factor[..., :3])
    metallic = slot1(2, 2) * col(M.MAT_METALLIC_FACTOR)
    roughness = slot1(2, 1) * col(M.MAT_ROUGHNESS_FACTOR)
    occlusion = slot1(3, 0)
    emissive = slot3(4) * cols(M.MAT_EMISSIVE_FACTOR, 3)

    n_geo = _normalize(n_in)
    n_tex = _normalize(slot3(1) * 2.0 - 1.0)
    n_mapped = _normalize(
        t_in * n_tex[..., 0:1] + bt_in * n_tex[..., 1:2] + n_geo * n_tex[..., 2:3]
    )
    normal = jnp.where(has_tangent[..., None], n_mapped, n_geo)

    m3 = covered[..., None]
    return GBuffer(
        base_color=jnp.where(m3, base_color, 0.0),
        position=jnp.where(m3, world_pos, 0.0),
        normal=jnp.where(m3, normal, 0.0),
        emissive=jnp.where(m3, emissive, 0.0),
        orm=jnp.where(
            m3, jnp.stack([occlusion, roughness, metallic], axis=-1), 0.0
        ),
        velocity=jnp.where(m3, velocity, 0.0),
        depth=z,
        mask=covered,
    )


def gbuffer_pass_from_planes(tri, z, attrs, mat_plane, ht_plane, scene,
                             params,
                             slot_map: tuple = (0, 1, 2, 3, 4)) -> GBuffer:
    """G-buffer from the megakernel's interpolated planes
    (kernels/rasterizer.rasterize_attrs): the attrs-row gather and the
    per-pixel interpolation have already happened inside the raster loop;
    only texturing and assembly remain.

    attrs: 14 (H, W) planes ordered wp.xyz, n.xyz, t.xyz, bt.xyz, uv0.uv.
    """
    covered = tri >= 0

    def vec(a, b):
        return jnp.stack(attrs[a:b], axis=-1)

    world_pos = vec(0, 3)
    n_in = vec(3, 6)
    t_in = vec(6, 9)
    bt_in = vec(9, 12)
    uv0 = vec(12, 14)
    mat_id = jnp.round(mat_plane).astype(jnp.int32)
    has_tangent = ht_plane > 0.5

    # clip positions are linear in world pos: interpolate-then-project
    pv = params["proj_view"]
    prev_pv = params["prev_proj_view"]
    wp1 = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    velocity = _ndc01(wp1 @ pv.T) - _ndc01(wp1 @ prev_pv.T)

    return _texture_and_assemble(
        covered, z, world_pos, n_in, t_in, bt_in, uv0, mat_id, has_tangent,
        velocity, scene, slot_map,
    )
