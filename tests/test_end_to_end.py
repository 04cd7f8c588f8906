"""End-to-end frame tests on tiny configs (CPU, interpret-mode Pallas)."""

import os

import numpy as np
import pytest

from mo_renderer_tpu.assets.ibl_resource import IBLResource
from mo_renderer_tpu.config import EngineConfig

REF_RES = "/root/reference/resources"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_RES), reason="reference assets not available"
)


def tiny_config(**kw):
    return EngineConfig(
        width=kw.pop("width", 256),
        height=kw.pop("height", 64),
        shadow_map_size=kw.pop("shadow_map_size", 256),
        texture_array_size=kw.pop("texture_array_size", 128),
        resource_root=REF_RES,
        **kw,
    )


def tiny_ibl():
    return IBLResource(
        resource_root=REF_RES,
        cubemap_size=32,
        irradiance_size=8,
        specular_mips=3,
        specular_samples=8,
        brdf_lut_size=32,
        cache=False,
    )


@pytest.fixture(scope="module")
def pbr_frame():
    import examples.pbr_ibl as ex

    os.environ["MO_MODEL"] = "monkey.glb"
    app = ex.build_app(tiny_config())
    app.insert_resource(tiny_ibl())
    frame = app.run(num_frames=2)
    return app, frame


def test_frame_shape_and_coverage(pbr_frame):
    app, frame = pbr_frame
    assert frame.shape == (64, 256, 4)
    assert frame.dtype == np.uint8
    # sky everywhere -> no black pixels; model covers part of the center
    assert (frame[..., :3].sum(-1) > 0).mean() > 0.99
    assert frame[..., 3].min() == 255


def test_model_is_visible_and_lit(pbr_frame):
    app, frame = pbr_frame
    gbuf_mask = None
    # re-render through the renderer to grab the gbuffer mask
    params, has_light = app.renderer.frame_params(app.world)
    assert has_light  # the shadow-caster directional light
    # center region should contain the model (camera aims at origin)
    center = frame[24:40, 112:144, :3].astype(int)
    border = frame[0:8, 0:16, :3].astype(int)
    assert center.mean() != pytest.approx(border.mean(), abs=1.0)


def test_headless_app_frame_loop(pbr_frame):
    app, _ = pbr_frame
    # timer ticked twice (2 frames)
    from mo_renderer_tpu.scene.timer import Timer

    assert app.frame_index == 2
    assert app.world.resource(Timer).total() > 0


def test_flat_mode_no_ibl():
    """Without IBLResource: direct lighting only, black background."""
    import examples.pbr_ibl as ex

    os.environ["MO_MODEL"] = "monkey.glb"
    app = ex.build_app(tiny_config(ssao_enabled=False))
    # remove IBL resource to exercise the flat path
    app.world._resources.pop(IBLResource, None)
    frame = app.run(num_frames=1)
    # background black, model lit by the two directional lights
    corner = frame[0:4, 0:4, :3]
    assert corner.max() == 0
    assert frame[..., :3].max() > 30
