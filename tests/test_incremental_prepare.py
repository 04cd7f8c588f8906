"""Incremental re-prepare on topology change (VERDICT r3 #5).

A spawn/despawn within the packed capacities must update the padded soup
in place (scene_buffers.incremental_repack) — no full pack_scene, no
re-jit — and fall back to the full prepare when the static layout cannot
absorb the change (new texture content, light-count change).
"""

import os
import time

import numpy as np

import __graft_entry__ as graft
from mo_renderer_tpu.assets.procedural import procedural_model
from mo_renderer_tpu.math.transform import Transform
from mo_renderer_tpu.passes.frame_graph import Renderer
from mo_renderer_tpu.scene.components import DirectionalLight
from mo_renderer_tpu.scene.world import World


def _base_world():
    world = World()
    world.spawn((Transform.from_xyz(0.0, -0.5, 0.0),
                 procedural_model("plane", size=8.0)))
    world.spawn((DirectionalLight(
        Transform.from_xyz(5.0, 8.0, 5.0).looking_at((0.0, 0.0, 0.0)),
        (1.0, 1.0, 1.0), 4.0, True,
    ),))
    world.insert_resource(graft._tiny_ibl())
    return world


def _renderer(world, **kw):
    import dataclasses

    cfg = dataclasses.replace(
        graft._tiny_config(), width=128, height=32, **kw
    )
    world.insert_resource(graft._camera(cfg))
    r = Renderer(cfg)
    r.prepare(world)
    return r


def test_spawn_and_despawn_are_incremental():
    world = _base_world()
    r = _renderer(world)
    f0 = r.render(world)
    fn_before = r._frame_fn
    pack_before = r.scene._host_pack

    # spawn: default-texture cube reuses the packed default layers
    e = world.spawn((Transform.from_xyz(0.0, 0.5, 0.0),
                     procedural_model("cube", base_color=(1, 0, 0, 1))))
    f1 = r.render(world)
    assert not np.array_equal(f0, f1), "spawned entity not rendered"
    assert r._frame_fn is fn_before, "incremental spawn must not re-jit"
    assert r.scene._host_pack is pack_before, "full prepare ran on spawn"

    # despawn: bit-exact restoration via the tri_valid mask
    world.despawn(e)
    f2 = r.render(world)
    np.testing.assert_array_equal(f0, f2)
    assert r._frame_fn is fn_before, "incremental despawn must not re-jit"
    assert r.scene._host_pack is pack_before


def test_incremental_spawn_matches_full_prepare():
    """The incrementally appended scene must render the same frame a
    from-scratch prepare of the same world produces."""
    world = _base_world()
    r = _renderer(world)
    r.render(world)
    world.spawn((Transform.from_xyz(0.6, 0.3, 0.0),
                 procedural_model("cube", base_color=(0.2, 0.9, 0.2, 1))))
    f_inc = r.render(world)

    r2 = Renderer(r.config)
    r2.prepare(world)
    f_full = r2.render(world)
    np.testing.assert_array_equal(f_inc, f_full)


def test_new_texture_content_falls_back_to_full_prepare():
    world = _base_world()
    r = _renderer(world)
    r.render(world)
    fn_before = r._frame_fn

    # a textured model introduces NEW image content -> stacks must grow
    world.spawn((Transform.from_xyz(0.0, 0.5, 0.0),
                 procedural_model("cube", textured=True)))
    f1 = r.render(world)
    assert f1[..., :3].max() > 0
    assert r._frame_fn is not fn_before, "expected full re-prepare"


def test_light_count_change_falls_back():
    world = _base_world()
    r = _renderer(world)
    r.render(world)
    pack_before = r.scene._host_pack
    world.spawn((DirectionalLight(
        Transform.from_xyz(-5.0, 8.0, -5.0).looking_at((0.0, 0.0, 0.0)),
        (1.0, 0.5, 0.5), 2.0, False,
    ),))
    r.render(world)
    assert r.scene._host_pack is not pack_before, (
        "light-count change must run the full prepare (the shading loop "
        "is specialized to the live light count)"
    )


def test_move_then_spawn_keeps_moved_transform():
    """Regression: refresh_transforms must keep the incremental pack
    state's host mirrors in sync — a spawn AFTER a transform move
    re-uploads mesh_world from the mirror, which would silently revert
    the move if stale."""
    world = _base_world()
    t = Transform.from_xyz(0.0, 0.5, 0.0)
    world.spawn((t, procedural_model("cube", base_color=(1, 0, 0, 1))))
    r = _renderer(world)
    r.render(world)

    # move the cube, render (bakes the new transform)
    t.translation = np.array([1.0, 0.5, 0.0], np.float32)
    moved = r.render(world)

    # spawn another (incremental append re-uploads the mesh tables)
    world.spawn((Transform.from_xyz(-1.0, 0.5, 0.0),
                 procedural_model("cube", base_color=(0, 0, 1, 1))))
    after_spawn = r.render(world)

    # from-scratch prepare of the same world is the oracle
    r2 = Renderer(r.config)
    r2.prepare(world)
    np.testing.assert_array_equal(after_spawn, r2.render(world))
    assert not np.array_equal(moved, after_spawn)  # new cube visible


def test_same_frame_move_and_spawn():
    """Regression: a transform moved in the SAME frame as a spawn (no
    render in between) must still be baked — incremental_repack must not
    refresh the TRS cache past the un-baked move."""
    world = _base_world()
    t = Transform.from_xyz(0.0, 0.5, 0.0)
    world.spawn((t, procedural_model("cube", base_color=(1, 0, 0, 1))))
    r = _renderer(world)
    r.render(world)

    # move AND spawn before the next render
    t.translation = np.array([1.0, 0.5, 0.0], np.float32)
    world.spawn((Transform.from_xyz(-1.0, 0.5, 0.0),
                 procedural_model("cube", base_color=(0, 0, 1, 1))))
    frame = r.render(world)

    r2 = Renderer(r.config)
    r2.prepare(world)
    np.testing.assert_array_equal(frame, r2.render(world))


def test_multiview_sees_topology_change():
    """The sharded renderers must apply spawn/despawn too (they wrap the
    same packed scene)."""
    import jax

    from mo_renderer_tpu.parallel import MultiViewRenderer, make_view_mesh

    world = _base_world()
    import dataclasses

    cfg = dataclasses.replace(graft._tiny_config(), width=128, height=32)
    cam = graft._camera(cfg)
    world.insert_resource(cam)
    mv = MultiViewRenderer(cfg, make_view_mesh(jax.devices()[:2]))
    mv.prepare(world)
    f0 = mv.render_views([cam, cam], world)

    world.spawn((Transform.from_xyz(0.0, 0.5, 0.0),
                 procedural_model("cube", base_color=(1, 0, 0, 1))))
    f1 = mv.render_views([cam, cam], world)
    assert not np.array_equal(f0, f1), "spawn not visible in multi-view"


def test_multi_chunk_despawn():
    """A despawn whose dead triangle range spans several upload chunks
    (1024 rows each, scene_buffers._CHUNK_ROWS) must chain chunks
    correctly: the masked frame matches a freshly-packed world without
    the entity, and nothing re-jits.  (Appends can never exceed one
    chunk — pack_scene's 1024-row padding slack bounds them — so the
    chunk LOOP is exercised by large dead ranges.)"""
    world = _base_world()
    big = procedural_model(
        "sphere", base_color=(0.2, 0.9, 0.3, 1.0), rings=40, sectors=52
    )
    prim = big.meshes[0].primitive
    n_tris = len(prim.indices) // 3
    assert n_tris > 4 * 1024, n_tris  # dead range spans > 4 chunks
    e = world.spawn((Transform.from_xyz(0.0, 0.6, 0.0), big))
    r = _renderer(world)
    f_with = r.render(world)
    fn_before = r._frame_fn
    pack_before = r.scene._host_pack

    world.despawn(e)
    f_masked = r.render(world)
    assert r._frame_fn is fn_before, "despawn must stay incremental"
    assert r.scene._host_pack is pack_before
    assert not np.array_equal(f_with, f_masked), "sphere still visible"

    # oracle: a fresh pack of the post-despawn world (same geometry,
    # different layout) must produce the same image
    r2 = Renderer(r.config)
    r2.prepare(world)
    f_fresh = r2.render(world)
    np.testing.assert_array_equal(
        f_masked, f_fresh,
        err_msg="multi-chunk despawn corrupted surviving geometry",
    )
    r.check_overflow()


def test_sponza_scale_spawn_host_cost():
    """Spawning at ~100-entity scale must not repack the world: the
    incremental path is bounded by tail-row writes + uploads (<50ms host
    budget on this backend; a full prepare is seconds)."""
    import dataclasses

    from examples.sponza_scale import build_app

    cfg = dataclasses.replace(
        graft._tiny_config(), width=256, height=128
    )
    app = build_app(cfg, n_grid=7)  # 50 entities: same code path, fast CI
    app.resumed()
    r = app.renderer
    np.asarray(r.render_device(app.world))

    app.world.spawn((Transform.from_xyz(0.0, 2.0, 0.0),
                     procedural_model("cube", base_color=(1, 1, 0, 1))))
    fn_before = r._frame_fn
    t0 = time.perf_counter()
    r._sync_topology(app.world)
    dt = time.perf_counter() - t0
    assert r._frame_fn is fn_before, "sponza-scale spawn must be incremental"
    # wall-clock bound only under MO_PERF_ASSERTS=1: the functional
    # asserts above are the real invariants; this rig's host side can be
    # starved by co-located load (CLAUDE.md), making a hard timing
    # assert flake-prone in CI (ADVICE r4)
    if os.environ.get("MO_PERF_ASSERTS"):
        assert dt < 0.5, f"incremental repack took {dt:.3f}s"
    f = r.render(app.world)
    assert f[..., :3].max() > 0
    r.check_overflow()
