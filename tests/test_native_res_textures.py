"""Native-resolution texture stacks: the fast path keeps each stack
entry at its source texture's pow2 size (the reference binds native sizes
via the bindless array, gbuffer_pass.rs:756-768) instead of flattening
everything to texture_array_size."""

import dataclasses

import numpy as np

import __graft_entry__ as graft
from mo_renderer_tpu.assets import materials as M
from mo_renderer_tpu.assets.materials import GltfMaterialCPU
from mo_renderer_tpu.assets.model import Mesh, Model
from mo_renderer_tpu.assets.procedural import (
    _checker_texture,
    plane_primitive,
    procedural_model,
)
from mo_renderer_tpu.math.transform import Transform
from mo_renderer_tpu.passes.frame_graph import Renderer
from mo_renderer_tpu.scene.components import DirectionalLight
from mo_renderer_tpu.scene.scene_buffers import pack_scene
from mo_renderer_tpu.scene.world import World


def _checker_plane_world(tex_size: int, cells: int):
    """A camera-filling plane with a checker of `cells` cells/side."""
    world = World()
    mat = GltfMaterialCPU()
    mat.base_color_texture = 0
    model = Model(
        meshes=[Mesh(primitive=plane_primitive(size=8.0), material=mat)],
        textures=[_checker_texture(size=tex_size, cells=cells)],
    )
    world.spawn((Transform.from_xyz(0.0, 0.0, 0.0), model))
    world.spawn((DirectionalLight(
        Transform.from_xyz(5.0, 8.0, 5.0).looking_at((0.0, 0.0, 0.0)),
        (1.0, 1.0, 1.0), 4.0, True,
    ),))
    world.insert_resource(graft._tiny_ibl())
    return world


def test_stack_entries_keep_native_size():
    cfg = graft._tiny_config()  # texture_array_size=64
    world = _checker_plane_world(256, 32)
    scene = pack_scene(world, cfg)
    mats = np.asarray(scene.materials)
    # the checker plane's material entry is 256^2 despite the 64^2 array
    assert mats[0, M.MAT_STACK_SIZE] == 256.0
    assert mats[0, M.MAT_STACK_BASE] == 0.0
    assert scene.texture_stack_a.shape[0] >= 256 * 256


def test_mixed_sizes_share_one_table():
    """Entries of different native sizes pack back-to-back with correct
    bases; an untextured material's entry shrinks to the 4x4 floor."""
    cfg = graft._tiny_config()
    world = _checker_plane_world(128, 16)
    world.spawn((
        Transform.from_xyz(0.0, 0.5, 0.0),
        procedural_model("cube", base_color=(1.0, 0.2, 0.2, 1.0)),
    ))
    scene = pack_scene(world, cfg)
    mats = np.asarray(scene.materials)
    sizes = mats[:2, M.MAT_STACK_SIZE]
    bases = mats[:2, M.MAT_STACK_BASE]
    assert set(sizes) == {128.0, 4.0}
    # bases are cumulative entry row offsets
    order = np.argsort(bases)
    assert bases[order[0]] == 0.0
    assert bases[order[1]] == sizes[order[0]] ** 2


def test_native_detail_survives_small_array_size():
    """A 256^2 checker rendered through a 64^2 texture_array_size: the
    fast path resolves cells the resized reference array blurs away."""
    cfg = dataclasses.replace(graft._tiny_config(), ssao_enabled=False)
    world = _checker_plane_world(256, 64)
    world.insert_resource(graft._camera(cfg))
    r = Renderer(cfg)
    r.prepare(world)
    assert r._fast
    frame = r.render(world).astype(np.float32)

    # 64 cells across a 256^2 source = 4 texels/cell; the 64^2 resized
    # array (the old behavior / slow path) averages each cell with its
    # neighbors into near-uniform grey.  Measure horizontal contrast on
    # the lower rows (the plane fills the bottom of the frame).
    strip = frame[-20:, :, :3].mean(-1)
    contrast_fast = np.abs(np.diff(strip, axis=1)).max()
    assert contrast_fast > 40.0, (
        f"checker cells blurred away (max step {contrast_fast})"
    )
