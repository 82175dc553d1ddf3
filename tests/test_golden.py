"""Golden-image regression corpus — SURVEY §4 leg 3 (the reference's de-facto
acceptance bar: render the demo scenes, diff against committed goldens with
src/tools/exrdiff.cpp). Every scene in scenes/*.pbrt renders at its authored
settings on the 1-CPU backend and must match tests/goldens/<name>.exr.

Regenerate after an intentional image change:
    JAX_PLATFORMS=cpu python tests/generate_goldens.py [name ...]
"""
import os

import numpy as np
import pytest

SCENES_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "scenes")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# name → (mean-relative-error threshold). Thresholds are loose enough for
# XLA-version reassociation drift but far below any algorithmic change.
SCENES = {
    "cornell": 0.02,
    "glossy": 0.02,
    "envlight": 0.02,
    "proctex": 0.02,
    "dof": 0.02,
    "subdiv": 0.02,
    "instances": 0.02,
    "ao": 0.02,
    "orthodisk": 0.02,
    "spotfog": 0.02,
}


def render_scene(name):
    from grail.scene.parser import parse_file
    from grail.engine.render import render

    scene, meta, api = parse_file(os.path.join(SCENES_DIR, name + ".pbrt"))
    img, _ = render(scene, meta, api.integrator_config)
    return np.asarray(img)


def relative_mae(a, b):
    """exrdiff-style: mean |a-b| / (mean luminance + eps)."""
    return float(np.mean(np.abs(a - b)) / (np.mean(np.abs(b)) + 1e-6))


@pytest.mark.parametrize("name", sorted(SCENES))
def test_golden(name):
    from grail.engine.imageio import read_image

    golden_path = os.path.join(GOLDEN_DIR, name + ".exr")
    if not os.path.exists(golden_path):
        pytest.skip(f"golden for {name} not generated yet")
    img = render_scene(name)
    gold = np.asarray(read_image(golden_path))
    assert img.shape == gold.shape
    assert np.isfinite(img).all()
    err = relative_mae(img, gold)
    assert err < SCENES[name], f"{name}: relative MAE {err:.4f}"
