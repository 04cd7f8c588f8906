"""Whole-stack error budget at PRODUCTION resolution (1920x1088).

The per-knob budget matrix (test_fast_budget.py) pins each fast-path
approximation separately at golden scale (256x128), where per-pixel
texture gradients are ~8x steeper than at 1080p.  This test pins the
FULL production stack — checkerboard shading + quarter-grid PCF +
even-anchor PCF windows + half-res/merged-trilinear specular + half-rate
SSAO, i.e. EngineConfig defaults — against the reference samplers path
(fast_sampling=False: the oracle that mirrors shading_pass.frag
semantics op for op) in ONE comparison at the resolution the bench and
the 60 fps target are quoted at.  A regression in any knob combination
(including cross-terms the pairwise matrix can't see) trips it.

VERDICT round-2 item 3.  Oracle chain: reference samplers path ==
shading_pass.frag semantics (tests/test_shading_units.py et al.); no
Vulkan is available here, so this is the top of the structural-parity
chain documented in NOTES_PERF.md.

Runtime: two 2-Mpix frames on the forced-CPU backend (~2-4 min total);
kept in its own module so the rest of the suite stays fast.
"""

import dataclasses
import functools

import jax
import numpy as np
import pytest

import __graft_entry__ as graft
from mo_renderer_tpu.passes.frame_graph import (
    Renderer,
    build_camera_params,
    frame_program,
)
from mo_renderer_tpu.passes.present import unpack_rgba8
from mo_renderer_tpu.scene.scene_buffers import find_shadow_light
from tests.test_fast_budget import _stress_world

WIDTH, HEIGHT = 1920, 1088  # tile-aligned production framebuffer


@pytest.mark.slow
def test_production_stack_budget_at_1080p():
    # production defaults: every fast knob ON (this is what bench.py and
    # the examples run)
    cfg = dataclasses.replace(
        graft._tiny_config(), width=WIDTH, height=HEIGHT
    )
    assert cfg.checkerboard and cfg.pcf_res_divisor == 4
    assert cfg.pcf_half_anchor and cfg.ssao_res_divisor == 2
    assert cfg.spec_merged_trilinear

    world = _stress_world()
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
        jax.jit(functools.partial(
            base, fast_sampling=True, slot_map=r._slot_map
        ))(r.scene, ibl, params)
    )).astype(np.int32)
    ref = unpack_rgba8(np.asarray(
        jax.jit(functools.partial(base, fast_sampling=False))(
            r.scene, ibl, params
        )
    )).astype(np.int32)

    diff = np.abs(fast - ref)[..., :3]
    mean = diff.mean()
    frac = (diff > 12).mean()
    # Bounds per VERDICT round-2 item 3 (mean <= 0.25 LSB, > 12/255
    # fraction <= 0.1%); measured at head: see the assertion messages.
    assert mean < 0.25, f"whole-stack mean |diff| {mean:.4f} LSB at 1080p"
    assert frac < 0.001, (
        f"whole-stack big-diff fraction {frac:.5%} at 1080p"
    )
    # the frame is non-trivial (shadowed ground + specular gradient)
    assert ref[..., :3].std() > 10.0
