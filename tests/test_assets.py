"""Asset-pipeline tests against the canonical resource tree."""

import os

import numpy as np
import pytest

from mo_renderer_tpu.assets import image_io
from mo_renderer_tpu.assets.model import Model
from mo_renderer_tpu.assets.materials import DEFAULT_TEXTURE_MAP
from mo_renderer_tpu.assets.default_textures import DefaultTextures
from mo_renderer_tpu.config import DEFAULT_CONFIG

RES = DEFAULT_CONFIG.resource_root
HAS_ASSETS = os.path.isdir(os.path.join(RES, "gltf"))

pytestmark = pytest.mark.skipif(not HAS_ASSETS, reason="resource tree not found")


def test_load_hdr_env():
    hdr = image_io.load_hdr(os.path.join(RES, "tex", "env", "default_sky.hdr"))
    assert hdr.ndim == 3 and hdr.shape[2] == 4
    assert hdr.dtype == np.float32
    assert np.all(hdr[..., 3] == 1.0)
    assert hdr[..., :3].max() > 0.0
    assert np.isfinite(hdr).all()
    # a sky should have non-trivial dynamic range
    assert hdr[..., :3].max() > 0.5


def test_default_textures():
    dt = DefaultTextures(RES)
    assert dt.white.dtype == np.uint8 and dt.white.shape[2] == 4
    assert np.all(dt.white[..., :3] >= 250)
    assert np.all(dt.black[..., :3] <= 5)
    # flat normal map is (0.5, 0.5, 1.0)
    fn = dt.flat_normal.astype(np.int32)
    assert abs(int(fn[0, 0, 0]) - 128) <= 1 and fn[0, 0, 2] >= 250


@pytest.mark.parametrize("name", ["monkey.glb", "floor.glb", "man.glb"])
def test_load_gltf_models(name):
    model = Model.load_gltf(name, RES)
    assert len(model.meshes) >= 1
    for mesh in model.meshes:
        prim = mesh.primitive
        n = prim.num_vertices
        assert n > 0 and prim.num_triangles > 0
        assert prim.indices.max() < n
        assert prim.position.shape == (n, 4)
        assert prim.normal.shape == (n, 4)
        assert prim.uv0.shape == (n, 2)
        assert prim.tangent.shape == (n, 4)
        assert prim.color.shape == (n, 4)
        # normals should be roughly unit length
        ln = np.linalg.norm(prim.normal[:, :3], axis=1)
        assert np.all(ln > 0.5) and np.all(ln < 1.5)
        assert mesh.world.shape == (4, 4)
        m = mesh.material
        assert 0 <= m.base_color_uv <= 1
        if m.base_color_texture != DEFAULT_TEXTURE_MAP:
            assert m.base_color_texture < len(model.textures)


def test_monkey_geometry_stats():
    model = Model.load_gltf("monkey.glb", RES)
    total_tris = sum(m.primitive.num_triangles for m in model.meshes)
    assert total_tris > 100  # Suzanne-class mesh
    # positions should be within a sane bound
    pos = np.concatenate([m.primitive.position[:, :3] for m in model.meshes])
    assert np.abs(pos).max() < 100.0
