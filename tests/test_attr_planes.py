"""The fused attrs->planes kernel (kernels/attr_planes.py) must match
the XLA slicing path of gbuffer_pass_fast — unit-level on random rows,
and whole-frame through the Renderer (cfg.attrs_plane_kernel)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft
from mo_renderer_tpu.kernels.attr_planes import attr_planes, supports
from mo_renderer_tpu.passes.frame_graph import Renderer


def _reference_planes(rows, nx, ny, pv, n_mat):
    """The exact math of gbuffer_pass_fast's slicing path, on (H, W, C)."""
    def ch(c):
        return rows[..., c]

    u, v = [], []
    for k in range(3):
        wx, wy, wz = ch(3 * k), ch(3 * k + 1), ch(3 * k + 2)
        xk = wx * pv[0, 0] + wy * pv[0, 1] + wz * pv[0, 2] + pv[0, 3]
        yk = wx * pv[1, 0] + wy * pv[1, 1] + wz * pv[1, 2] + pv[1, 3]
        wk = wx * pv[3, 0] + wy * pv[3, 1] + wz * pv[3, 2] + pv[3, 3]
        u.append(xk - nx * wk)
        v.append(yk - ny * wk)
    q0 = u[1] * v[2] - u[2] * v[1]
    q1 = u[2] * v[0] - u[0] * v[2]
    q2 = u[0] * v[1] - u[1] * v[0]
    qs = q0 + q1 + q2
    qs = jnp.where(jnp.abs(qs) > 1e-30, qs, 1.0)
    bb0, bb1, bb2 = q0 / qs, q1 / qs, q2 / qs

    def interp(base, width, c):
        return (
            ch(base + c) * bb0
            + ch(base + width + c) * bb1
            + ch(base + 2 * width + c) * bb2
        )

    wp = [interp(0, 3, c) for c in range(3)]
    n = [interp(9, 3, c) for c in range(3)]
    t = [interp(18, 3, c) for c in range(3)]
    handed = ch(34)
    bt = [
        (n[1] * t[2] - n[2] * t[1]) * handed,
        (n[2] * t[0] - n[0] * t[2]) * handed,
        (n[0] * t[1] - n[1] * t[0]) * handed,
    ]
    uv = [interp(27, 2, 0), interp(27, 2, 1)]
    mats = [ch(35 + m) for m in range(n_mat)]
    return wp + n + t + bt + uv + [ch(33), handed] + mats


def test_attr_planes_matches_reference_math():
    rng = np.random.default_rng(7)
    h, w, n_mat = 16, 128, 5
    c = 35 + n_mat
    rows = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    nx = jnp.asarray(rng.uniform(-1, 1, size=(h, w)).astype(np.float32))
    ny = jnp.asarray(rng.uniform(-1, 1, size=(h, w)).astype(np.float32))
    pv = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))

    assert supports(h, w)
    got = attr_planes(rows, nx, ny, pv, n_mat=n_mat)
    want = _reference_planes(rows, nx, ny, pv, n_mat)
    assert len(got) == len(want) == 16 + n_mat
    # random rows make the barycentric divide ill-conditioned, and the
    # interpret-mode kernel executes op-by-op while the fused reference
    # uses FMAs — tolerance covers that; the whole-frame tests below pin
    # the production path at the 8-bit-LSB level
    for i, (g, r) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-3, atol=1e-4,
            err_msg=f"plane {i}",
        )


def test_attr_planes_full_frame():
    """Whole-frame pin: cfg.attrs_plane_kernel on-vs-off.  On CPU the
    kernel runs in interpret mode (identical jnp ops), so the frames
    must agree to <=1 8-bit LSB everywhere."""
    cfg = graft._tiny_config()
    world = graft._tiny_world()
    world.insert_resource(graft._camera(cfg))

    r0 = Renderer(cfg)
    r0.prepare(world)
    f0 = r0.render(world)

    cfg_k = dataclasses.replace(cfg, attrs_plane_kernel=True)
    rk = Renderer(cfg_k)
    rk.prepare(world)
    fk = rk.render(world)

    diff = np.abs(fk.astype(int) - f0.astype(int))
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"
    assert (diff > 0).mean() < 0.01, f"diff frac {(diff > 0).mean()}"


def test_attr_planes_full_frame_no_checkerboard():
    cfg = dataclasses.replace(graft._tiny_config(), checkerboard=False)
    world = graft._tiny_world()
    world.insert_resource(graft._camera(cfg))

    r0 = Renderer(cfg)
    r0.prepare(world)
    f0 = r0.render(world)

    cfg_k = dataclasses.replace(cfg, attrs_plane_kernel=True)
    rk = Renderer(cfg_k)
    rk.prepare(world)
    fk = rk.render(world)

    diff = np.abs(fk.astype(int) - f0.astype(int))
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"
