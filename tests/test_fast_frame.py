"""Whole-frame equivalence: fast (gather-minimal) vs reference samplers."""

import functools

import jax
import numpy as np

import __graft_entry__ as graft
from mo_renderer_tpu.passes.frame_graph import (
    Renderer,
    build_camera_params,
    frame_program,
)
from mo_renderer_tpu.passes.present import unpack_rgba8
from mo_renderer_tpu.scene.scene_buffers import find_shadow_light


def test_fast_frame_matches_reference():
    import dataclasses

    # cb off: this test pins the fast SAMPLERS against the reference
    # samplers; the checkerboard approximation has its own budget test
    # (test_fast_budget.py)
    cfg = dataclasses.replace(graft._tiny_config(), checkerboard=False)
    world = graft._tiny_world()
    r = Renderer(cfg)
    r.prepare(world)
    light_pv, _ = find_shadow_light(world)
    params = build_camera_params(graft._camera(cfg), light_pv)
    ibl = r.ibl.maps()

    base = functools.partial(
        frame_program,
        cfg=cfg, pad_w=r.pad_w, pad_h=r.pad_h,
        binned_cap=r._binned_cap, has_shadow_light=True,
    )
    fast = unpack_rgba8(np.asarray(
        jax.jit(
            functools.partial(
                base, fast_sampling=True, slot_map=r._slot_map
            )
        )(r.scene, ibl, params)
    )).astype(np.int32)
    ref = unpack_rgba8(np.asarray(
        jax.jit(functools.partial(base, fast_sampling=False))(
            r.scene, ibl, params
        )
    )).astype(np.int32)

    diff = np.abs(fast - ref)[..., :3]
    # only SH9 irradiance is an approximation; everything else is exact
    # re-layout, so the images should agree to a few LSBs
    assert diff.mean() < 2.0, f"mean |diff| {diff.mean()}"
    assert (diff > 12).mean() < 0.01, f"big-diff fraction {(diff > 12).mean()}"


def test_megakernel_matches_gather_fast_path():
    """rasterize_attrs (in-kernel interpolation) vs the per-pixel attrs
    gather path: same math, different association — a couple of LSBs."""
    import dataclasses

    # cb off for both: the megakernel path never checkerboards, so the
    # comparison must hold the planes path to the same domain
    cfg = dataclasses.replace(graft._tiny_config(), checkerboard=False)
    world = graft._tiny_world()
    r = Renderer(cfg)
    r.prepare(world)
    light_pv, _ = find_shadow_light(world)
    params = build_camera_params(graft._camera(cfg), light_pv)
    ibl = r.ibl.maps()

    def run(mk: bool):
        c = dataclasses.replace(cfg, raster_interp_attrs=mk)
        return unpack_rgba8(np.asarray(
            jax.jit(
                functools.partial(
                    frame_program,
                    cfg=c, pad_w=r.pad_w, pad_h=r.pad_h,
                    binned_cap=r._binned_cap, has_shadow_light=True,
                    fast_sampling=True, slot_map=r._slot_map,
                )
            )(r.scene, ibl, params)
        )).astype(np.int32)

    diff = np.abs(run(True) - run(False))[..., :3]
    assert diff.mean() < 0.1, f"mean |diff| {diff.mean()}"
    assert diff.max() <= 2, f"max |diff| {diff.max()}"
