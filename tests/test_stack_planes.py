"""The fused stack-row unpack+bilinear kernel (kernels/stack_planes.py)
must match the XLA slot() path of gbuffer._texture_and_assemble —
unit-level on random quad rows, and whole-frame via the Renderer
(cfg.stack_plane_kernel)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft
from mo_renderer_tpu.kernels.stack_planes import stack_planes
from mo_renderer_tpu.passes.frame_graph import Renderer


def test_stack_planes_matches_slot_math():
    rng = np.random.default_rng(17)
    h, w = 16, 128
    # two groups: 8-wide (positions 0-1) and 4-wide (position 2)
    ga = jnp.asarray(
        rng.integers(0, 1 << 32, size=(h, w, 8), dtype=np.uint64)
        .astype(np.uint32)
    )
    gb = jnp.asarray(
        rng.integers(0, 1 << 32, size=(h, w, 4), dtype=np.uint64)
        .astype(np.uint32)
    )
    fx = jnp.asarray(rng.uniform(0, 1, size=(h, w)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(0, 1, size=(h, w)).astype(np.float32))

    # reference: the exact slot() math over the concatenated rows
    stack_row = jnp.concatenate([ga, gb], axis=-1)
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy

    def ref(p, c):
        quad = stack_row[..., 4 * p : 4 * p + 4]
        v = ((quad >> (8 * c)) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        return (
            v[..., 0] * w00 + v[..., 1] * w10
            + v[..., 2] * w01 + v[..., 3] * w11
        )

    out_spec = []
    want = []
    for p, c in [(0, 0), (0, 1), (0, 2), (1, 0), (1, 3), (2, 1), (2, 2)]:
        out_spec.append((p // 2, 4 * (p % 2), 8 * c))
        want.append(np.asarray(ref(p, c)))

    got = stack_planes(
        [ga, gb], fx, fy, out_spec=tuple(out_spec), block_rows=8
    )
    for i, (g, r) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), r, rtol=1e-6, atol=1e-6, err_msg=f"plane {i}"
        )


def test_stack_planes_full_frame():
    """Whole-frame pin: cfg.stack_plane_kernel on-vs-off (interpret mode
    on CPU -> identical math, <=1 LSB)."""
    cfg = graft._tiny_config()
    world = graft._tiny_world()
    world.insert_resource(graft._camera(cfg))

    r0 = Renderer(cfg)
    r0.prepare(world)
    f0 = r0.render(world)

    cfg_k = dataclasses.replace(cfg, stack_plane_kernel=True)
    rk = Renderer(cfg_k)
    rk.prepare(world)
    fk = rk.render(world)

    diff = np.abs(fk.astype(int) - f0.astype(int))
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"


def test_both_plane_kernels_full_frame():
    """attrs + stack kernels together (the production combination the
    TPU bench runs)."""
    cfg = graft._tiny_config()
    world = graft._tiny_world()
    world.insert_resource(graft._camera(cfg))

    r0 = Renderer(cfg)
    r0.prepare(world)
    f0 = r0.render(world)

    cfg_k = dataclasses.replace(
        cfg, attrs_plane_kernel=True, stack_plane_kernel=True
    )
    rk = Renderer(cfg_k)
    rk.prepare(world)
    fk = rk.render(world)

    diff = np.abs(fk.astype(int) - f0.astype(int))
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"
    assert (diff > 0).mean() < 0.01
