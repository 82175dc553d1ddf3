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
    # round-4 breadth: every exotic integrator / material / light / shape
    # family gets a .pbrt + golden (reference scenes/ corpus analog)
    "photon": 0.02,
    "mlt": 0.05,          # Metropolis renderer path (splat film)
    "dipole": 0.02,
    "prtteapot": 0.02,
    "irradcache": 0.02,
    "measured": 0.02,
    "bump": 0.02,
    "projgonio": 0.02,
    "heightfield": 0.02,
    "nurbs": 0.02,
    "whittedigi": 0.02,
    "useprobes": 0.02,
}


def render_scene(name):
    from grail.scene.parser import parse_file
    from grail.engine.render import render

    scene, meta, api = parse_file(os.path.join(SCENES_DIR, name + ".pbrt"))
    if getattr(api, "mlt_config", None) is not None:
        from grail.engine.metropolis import render_mlt
        n_waves = max(1, (meta.xres * meta.yres * api.mlt_spp)
                      // (api.mlt_config.n_chains
                          * api.mlt_config.mutations_per_wave))
        img, _ = render_mlt(scene, meta, api.mlt_config, n_waves=n_waves)
        return np.asarray(img)
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
