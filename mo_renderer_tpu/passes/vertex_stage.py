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
    world = jnp.take(scene.mesh_world, scene.vertex_mesh, axis=0)  # (V,4,4)
    nmat = jnp.take(scene.mesh_normal_mat, scene.vertex_mesh, axis=0)  # (V,3,3)

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
