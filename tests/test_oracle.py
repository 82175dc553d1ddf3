"""Device renderer vs independent NumPy oracle (different RNG + estimator;
expectations must agree within MC error) — SURVEY §4 oracle strategy."""
import numpy as np
import pytest

from grail.scene.presets import cornell_box
from grail.engine.render import render
from grail.engine.integrator import IntegratorConfig
from tests.oracle.oracle import render_direct, scene_to_oracle


def test_direct_lighting_matches_numpy_oracle():
    xres = yres = 24
    scene, meta, b = cornell_box(xres=xres, yres=yres, spp=8, with_boxes=False)
    img_dev, _ = render(scene, meta,
                        IntegratorConfig(kind="direct", max_depth=1,
                                         light_strategy="one"), spp=32)
    img_dev = np.asarray(img_dev)

    oracle_scene = scene_to_oracle(scene, meta, b)
    img_ref = render_direct(oracle_scene, xres, yres, spp=32, seed=5)

    # compare block means (averages out per-pixel MC noise of both estimators)
    def blocks(img, k=6):
        h, w, _ = img.shape
        return img[: h // k * k, : w // k * k].reshape(
            h // k, k, w // k, k, 3).mean(axis=(1, 3))

    bd = blocks(img_dev)
    br = blocks(img_ref)
    # exclude the light-source block row (emission is exact in both)
    mask = br < 5.0
    rel = np.abs(bd - br) / np.maximum(br, 0.02)
    assert np.median(rel[mask]) < 0.08, (
        f"median rel diff {np.median(rel[mask]):.3f}\ndev:\n{bd[...,0]}\n"
        f"ref:\n{br[...,0]}")
    assert (rel[mask] < 0.35).mean() > 0.9
