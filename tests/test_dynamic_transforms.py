"""Dynamic transforms: mutating an entity's Transform between frames
moves the rendered geometry (the reference re-reads Transform per draw)."""

import numpy as np

import __graft_entry__ as graft
from mo_renderer_tpu.assets.procedural import procedural_model
from mo_renderer_tpu.math.transform import Transform
from mo_renderer_tpu.passes.frame_graph import Renderer
from mo_renderer_tpu.scene.components import DirectionalLight
from mo_renderer_tpu.scene.world import World


def test_transform_mutation_moves_geometry():
    cfg = graft._tiny_config()
    world = World()
    t = Transform.from_xyz(0.0, 0.5, 0.0)
    world.spawn((t, procedural_model("cube", base_color=(1, 0, 0, 1))))
    world.spawn((DirectionalLight(
        Transform.from_xyz(5.0, 8.0, 5.0).looking_at((0.0, 0.0, 0.0)),
        (1.0, 1.0, 1.0), 4.0, True,
    ),))
    world.insert_resource(graft._tiny_ibl())
    world.insert_resource(graft._camera(cfg))

    r = Renderer(cfg)
    r.prepare(world)
    f0 = r.render(world)
    f0_again = r.render(world)  # no change -> identical (cache hit)
    np.testing.assert_array_equal(f0, f0_again)

    # move the cube: the image must change where the cube was/is
    t.translation = np.array([1.5, 0.5, 0.0], np.float32)
    f1 = r.render(world)
    assert not np.array_equal(f0, f1)

    # move it back: matches the original frame again
    t.translation = np.array([0.0, 0.5, 0.0], np.float32)
    f2 = r.render(world)
    np.testing.assert_array_equal(f0, f2)


def test_shadow_cache_invalidates_on_light_move():
    """cfg.shadow_cache (default ON) must recompute the memoized shadow
    map when the caster light's transform changes — a moved light casts
    a different shadow; a moved-back light restores the exact frame."""
    cfg = graft._tiny_config()
    assert cfg.shadow_cache  # the production default under test
    world = World()
    world.spawn((Transform.from_xyz(0.0, 0.5, 0.0),
                 procedural_model("cube")))
    world.spawn((Transform.from_xyz(0.0, -0.5, 0.0),
                 procedural_model("plane", size=8.0)))
    light = DirectionalLight(
        Transform.from_xyz(5.0, 8.0, 5.0).looking_at((0.0, 0.0, 0.0)),
        (1.0, 1.0, 1.0), 4.0, True,
    )
    world.spawn((light,))
    world.insert_resource(graft._tiny_ibl())
    world.insert_resource(graft._camera(cfg))

    r = Renderer(cfg)
    r.prepare(world)
    f0 = r.render(world)

    orig = light.transform
    light.transform = Transform.from_xyz(-5.0, 8.0, 5.0).looking_at(
        (0.0, 0.0, 0.0)
    )
    f1 = r.render(world)
    assert not np.array_equal(f0, f1), "stale shadow map served"

    light.transform = orig
    f2 = r.render(world)
    np.testing.assert_array_equal(f0, f2)


def test_topology_change_reprepares():
    """Spawning an entity after prepare() must show up in the next frame
    (world.generation drives an automatic re-prepare, VERDICT r2 #8);
    despawning it again restores the original frame."""
    import dataclasses

    cfg = dataclasses.replace(graft._tiny_config(), width=128, height=32)
    world = World()
    world.spawn((Transform.from_xyz(0.0, -0.5, 0.0),
                 procedural_model("plane", size=8.0)))
    world.spawn((DirectionalLight(
        Transform.from_xyz(5.0, 8.0, 5.0).looking_at((0.0, 0.0, 0.0)),
        (1.0, 1.0, 1.0), 4.0, True,
    ),))
    world.insert_resource(graft._tiny_ibl())
    world.insert_resource(graft._camera(cfg))

    r = Renderer(cfg)
    r.prepare(world)
    f0 = r.render(world)

    e = world.spawn((Transform.from_xyz(0.0, 0.5, 0.0),
                     procedural_model("cube", base_color=(1, 0, 0, 1))))
    f1 = r.render(world)
    assert not np.array_equal(f0, f1), "new entity not rendered"

    world.despawn(e)
    f2 = r.render(world)
    np.testing.assert_array_equal(f0, f2)
