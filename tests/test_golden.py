"""Golden-image regression tests.

The reference project's only visual check is a screenshot in its README
(SURVEY.md §4); here whole frames are pinned against committed goldens.
Tolerances allow cross-platform float drift but catch real regressions
(a broken pass shifts the image by far more than 2/255 mean).

Regenerate (after an INTENTIONAL image change) with:
    python tests/test_golden.py --regen
"""

import os
import sys

# allow `python tests/test_golden.py --regen` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REF_RES = "/root/reference/resources"


def _load(name):
    from PIL import Image

    return np.asarray(
        Image.open(os.path.join(GOLDEN_DIR, name)).convert("RGBA")
    ).astype(np.int32)


def _render_pbr_monkey():
    os.environ["MO_MODEL"] = "monkey.glb"
    import examples.pbr_ibl as ex
    from tests.test_end_to_end import tiny_config, tiny_ibl

    app = ex.build_app(tiny_config())
    app.insert_resource(tiny_ibl())
    return app.run(num_frames=1)


def _render_entry():
    import jax

    import __graft_entry__ as g
    from mo_renderer_tpu.passes.present import unpack_rgba8

    fn, args = g.entry()
    return unpack_rgba8(np.asarray(jax.jit(fn)(*args)))


def _render_tiny(**overrides):
    """The entry scene through the full Renderer with config overrides
    (covers code paths the plain entry golden cannot: pass toggles and
    the megakernel rasterizer)."""
    import dataclasses

    import __graft_entry__ as g
    from mo_renderer_tpu.passes.frame_graph import Renderer

    cfg = dataclasses.replace(g._tiny_config(), **overrides)
    world = g._tiny_world()
    world.insert_resource(g._camera(cfg))
    r = Renderer(cfg)
    r.prepare(world)
    return r.render(world)


def _render_row_sharded():
    """The entry scene through the row-sharded multi-chip path on the
    host CPU mesh (conftest forces 8 virtual devices)."""
    import jax

    import __graft_entry__ as g
    from mo_renderer_tpu.parallel.tile_sharding import TileShardedRenderer

    cfg = g._tiny_config()
    world = g._tiny_world()
    world.insert_resource(g._camera(cfg))
    n = min(4, len(jax.devices()))
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:n]), ("rows",))
    r = TileShardedRenderer(cfg, mesh)
    r.prepare(world)
    return r.render(world)


def _render_sponza_tiny():
    """Sponza-class stress scene (many entities/materials, 4 point + 1
    directional light) at golden resolution."""
    import examples.sponza_scale as sp
    from tests.test_end_to_end import tiny_config, tiny_ibl

    app = sp.build_app(tiny_config(), n_grid=6)
    app.insert_resource(tiny_ibl())
    return app.run(num_frames=1)


def _check(frame, golden_name):
    golden = _load(golden_name)
    frame = np.asarray(frame).astype(np.int32)
    assert frame.shape == golden.shape
    diff = np.abs(frame - golden)[..., :3]
    assert diff.mean() < 2.0, f"mean |diff| {diff.mean():.3f}"
    assert (diff > 16).mean() < 0.005, (
        f"large-diff fraction {(diff > 16).mean():.4f}"
    )


@pytest.mark.skipif(not os.path.isdir(REF_RES), reason="no reference assets")
def test_golden_pbr_ibl_monkey():
    _check(_render_pbr_monkey(), "pbr_ibl_monkey_256x64.png")


def test_golden_entry_procedural():
    """The default-config entry frame (checkerboard shading on)."""
    _check(_render_entry(), "entry_cb_256x128.png")


def test_golden_no_checkerboard():
    """Full-rate (no checkerboard, full-rate SSAO) frame keeps its own
    golden — the megakernel and row-sharded paths are pinned against it
    below (neither supports the half-rate knobs)."""
    _check(
        _render_tiny(checkerboard=False, ssao_res_divisor=1),
        "entry_procedural_256x128.png",
    )


def test_golden_passes_off():
    """SSAO and shadow disabled exercise their own trace branches."""
    _check(
        _render_tiny(ssao_enabled=False, shadow_enabled=False),
        "entry_passes_off_256x128.png",
    )


def test_golden_megakernel():
    """The in-kernel attribute-interpolation rasterizer variant must
    produce the same image as the planes path (kept behind
    raster_interp_attrs; tested against its own golden so a drift in
    EITHER path is caught absolutely, not just relatively)."""
    _check(
        _render_tiny(raster_interp_attrs=True, ssao_res_divisor=1),
        "entry_procedural_256x128.png",
    )


def test_golden_row_sharded():
    """The row-sharded frame must reproduce a single-device golden rendered
    at the SHARDED path's actual configuration — checkerboard on, FULL-rate
    SSAO (tile_sharding sizes its halo exchange for full rate and ignores
    ssao_res_divisor) — so seam/SSAO drift isn't hidden inside the
    tolerance for a cross-config field difference."""
    _check(_render_row_sharded(), "entry_cb_ssao1_256x128.png")


@pytest.mark.skipif(not os.path.isdir(REF_RES), reason="no reference assets")
def test_golden_sponza():
    _check(_render_sponza_tiny(), "sponza_tiny_256x128.png")


if __name__ == "__main__" and "--regen" in sys.argv:
    # goldens are CPU-rendered (same platform the pytest run compares on);
    # conftest.py only applies under pytest, so force CPU here too
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mo_renderer_tpu.assets.image_io import write_png

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    write_png(
        os.path.join(GOLDEN_DIR, "pbr_ibl_monkey_256x64.png"),
        _render_pbr_monkey(),
    )
    write_png(
        os.path.join(GOLDEN_DIR, "entry_cb_256x128.png"),
        _render_entry(),
    )
    write_png(
        os.path.join(GOLDEN_DIR, "entry_procedural_256x128.png"),
        _render_tiny(checkerboard=False, ssao_res_divisor=1),
    )
    write_png(
        os.path.join(GOLDEN_DIR, "entry_cb_ssao1_256x128.png"),
        _render_tiny(ssao_res_divisor=1),
    )
    write_png(
        os.path.join(GOLDEN_DIR, "entry_passes_off_256x128.png"),
        _render_tiny(ssao_enabled=False, shadow_enabled=False),
    )
    write_png(
        os.path.join(GOLDEN_DIR, "sponza_tiny_256x128.png"),
        _render_sponza_tiny(),
    )
    print("goldens regenerated")
