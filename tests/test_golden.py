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
    _check(_render_entry(), "entry_procedural_256x128.png")


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
        os.path.join(GOLDEN_DIR, "entry_procedural_256x128.png"),
        _render_entry(),
    )
    print("goldens regenerated")
