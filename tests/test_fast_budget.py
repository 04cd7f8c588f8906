"""Error-budget matrix for the fast path's resolution approximations.

Each fast-path speed knob trades gather indices for a bounded image
deviation; the bounds were previously only quoted in config.py comments.
Here every knob combination is pinned against the FULL-RATE fast frame
(pcf_res_divisor=1, both spec half-res flags off — itself pinned against
the reference samplers in test_fast_frame) on a stress scene with hard
shadow edges (cube on plane under a low sun) and a roughness 0->1
gradient sphere (exercises the whole specular mip chain).

The asserted bounds are calibrated ~2x above the measured deviation of a
correct implementation, so a regression in any approximation (e.g. the
mask-aware upsampler) trips its specific bound.
"""

import dataclasses
import functools

import jax
import numpy as np
import pytest

import __graft_entry__ as graft
from mo_renderer_tpu.assets.procedural import procedural_model
from mo_renderer_tpu.math.transform import Transform
from mo_renderer_tpu.passes.frame_graph import (
    Renderer,
    build_camera_params,
    frame_program,
)
from mo_renderer_tpu.passes.present import unpack_rgba8
from mo_renderer_tpu.scene.components import DirectionalLight
from mo_renderer_tpu.scene.scene_buffers import find_shadow_light
from mo_renderer_tpu.scene.world import World


def _stress_world():
    """Hard shadow edges + high-roughness gradients in one frame."""
    world = World()
    world.spawn((
        Transform.from_xyz(0.0, -0.5, 0.0),
        procedural_model("plane", size=10.0, roughness=0.3),
    ))
    world.spawn((  # tall cube casting a long, hard-edged shadow
        Transform.from_xyz(0.0, 0.5, 0.0),
        procedural_model("cube", base_color=(0.9, 0.6, 0.3, 1.0)),
    ))
    world.spawn((  # metallic sphere with roughness ramping 0 -> 1
        Transform.from_xyz(1.4, 0.1, 0.6),
        procedural_model(
            "sphere", metallic=1.0, mr_gradient=True,
            base_color=(0.9, 0.9, 0.9, 1.0),
        ),
    ))
    # low sun -> long shadows with crisp edges
    world.spawn((DirectionalLight(
        Transform.from_xyz(8.0, 3.0, 2.0).looking_at((0.0, 0.0, 0.0)),
        (1.0, 1.0, 1.0), 4.0, True,
    ),))
    world.insert_resource(graft._tiny_ibl())
    return world


@pytest.fixture(scope="module")
def budget_setup():
    # checkerboard / half-rate SSAO are their own knobs below; the
    # oracle is full-rate everything
    cfg = dataclasses.replace(
        graft._tiny_config(), checkerboard=False, ssao_res_divisor=1
    )
    world = _stress_world()
    r = Renderer(cfg)
    r.prepare(world)
    light_pv, _ = find_shadow_light(world)
    params = build_camera_params(graft._camera(cfg), light_pv)
    ibl = r.ibl.maps()

    def render(divisor, parent_half, mirror_half, merged=False, cb=False,
               ssao_div=1, pcf_half=False):
        c = dataclasses.replace(
            cfg,
            pcf_res_divisor=divisor,
            spec_parent_mip_half_res=parent_half,
            spec_mirror_half_res=mirror_half,
            spec_merged_trilinear=merged,
            checkerboard=cb,
            ssao_res_divisor=ssao_div,
            pcf_half_anchor=pcf_half,
        )
        return unpack_rgba8(np.asarray(
            jax.jit(functools.partial(
                frame_program,
                cfg=c, pad_w=r.pad_w, pad_h=r.pad_h,
                binned_cap=r._binned_cap, has_shadow_light=True,
                fast_sampling=True, slot_map=r._slot_map,
            ))(r.scene, ibl, params)
        )).astype(np.int32)

    oracle = render(1, False, False)
    return render, oracle


# (divisor, parent_half, mirror_half[, merged]) -> (mean LSB, frac > 12)
BOUNDS = {
    (2, False, False): (0.35, 0.004),
    (4, False, False): (0.60, 0.010),
    (1, True, False): (0.25, 0.004),
    (1, False, True): (0.35, 0.006),
    (4, True, True): (1.00, 0.015),
    # single-gather merged trilinear on top
    # (the coarse tap's 1/4-parent-texel shift adds <= ~1 LSB)
    (4, True, True, True): (1.10, 0.015),
    # + checkerboard shading.  Bounds are calibrated at this 256x128
    # golden scale, where per-pixel texture gradients are ~8x steeper
    # than at 1080p (measured there: mean 0.13 LSB, 0.06% > 12 —
    # scripts/eval_checkerboard.py).
    (4, True, True, True, True): (2.80, 0.060),
    # half-rate SSAO alone (the reference's own semantics at W/2 —
    # its radius scales with the window resolution)
    (1, False, False, False, False, 2): (1.20, 0.020),
    # the production default stack: everything on
    (4, True, True, True, True, 2): (3.20, 0.070),
    # even-anchor PCF windows alone (34MB table): odd-anchored pixels
    # clamp out-of-window bilinear neighbors to the window edge — a
    # <= half-texel penumbra softening
    (1, False, False, False, False, 1, True): (0.50, 0.008),
    # the full production stack INCLUDING the even-anchor PCF table
    (4, True, True, True, True, 2, True): (3.40, 0.075),
}


@pytest.mark.parametrize("knobs", sorted(BOUNDS))
def test_fast_approximation_budget(budget_setup, knobs):
    render, oracle = budget_setup
    mean_bound, frac_bound = BOUNDS[knobs]
    img = render(*knobs)
    diff = np.abs(img - oracle)[..., :3]
    assert diff.mean() < mean_bound, (
        f"{knobs}: mean |diff| {diff.mean():.3f} (bound {mean_bound})"
    )
    frac = (diff > 12).mean()
    assert frac < frac_bound, (
        f"{knobs}: {frac:.4%} of pixels differ by >12 LSB "
        f"(bound {frac_bound:.2%})"
    )


def test_shadow_edge_present(budget_setup):
    """Sanity: the stress scene actually contains a shadowed region
    (otherwise the PCF bounds above would be vacuous)."""
    _, oracle = budget_setup
    # shadow factor floor is 0.25: shadowed ground must be darker than
    # its lit surroundings somewhere
    g = oracle[..., :3].mean(-1)
    assert g.std() > 10.0
