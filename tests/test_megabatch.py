"""Material-sorted megabatch shading (shade/megabatch.py) equals the masked
path bitwise: the sort is a permutation and every per-lane formula is the one
the masked evaluation computes (pbrt src/core/reflection.cpp BSDF::f dispatch
→ SURVEY §2.5 sorted-megabatch TPU equivalent)."""
import dataclasses
import os

import numpy as np
import pytest

SCENES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scenes")


def _render_pair(scene, meta, cfg, spp=2):
    from grail.engine.render import render
    cfg_off = dataclasses.replace(cfg, mat_sort=False)
    cfg_on = dataclasses.replace(cfg, mat_sort=True, mat_sort_min=0,
                                 mat_block=256)
    img0, _ = render(scene, meta, cfg_off, spp=spp)
    img1, _ = render(scene, meta, cfg_on, spp=spp)
    return np.asarray(img0), np.asarray(img1)


def test_megabatch_cornell_bitwise(cornell_small):
    from grail.engine.integrator import IntegratorConfig
    scene, meta, _ = cornell_small
    a, b = _render_pair(scene, meta,
                        IntegratorConfig(kind="path", max_depth=4))
    assert a.mean() > 0.01
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=2e-4)


@pytest.mark.parametrize("name", ["glossy", "envlight"])
def test_megabatch_scene_bitwise(name):
    """Multi-lobe materials (microfacet/specular/conductor) and image/env
    lights through the specialized branches."""
    from grail.scene.parser import parse_file
    scene, meta, api = parse_file(os.path.join(SCENES_DIR, name + ".pbrt"))
    cfg = dataclasses.replace(api.integrator_config, kind="path", max_depth=3)
    a, b = _render_pair(scene, meta, cfg)
    assert a.mean() > 1e-4
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=2e-4)


def test_megabatch_block_straddle():
    """A deliberately material-interleaved scene: many blocks are mixed, so
    the generic branch and the boundary handling both execute."""
    from grail.scene.presets import cornell_box
    from grail.engine.integrator import IntegratorConfig
    scene, meta, _ = cornell_box(xres=16, yres=16, spp=4)
    # tiny blocks force straddling; pad path also exercised (16*16 % 96 != 0)
    from grail.engine.render import render
    cfg = IntegratorConfig(kind="path", max_depth=3)
    img0, _ = render(scene, meta,
                     dataclasses.replace(cfg, mat_sort=False), spp=2)
    img1, _ = render(scene, meta,
                     dataclasses.replace(cfg, mat_sort=True, mat_sort_min=0,
                                         mat_block=96), spp=2)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1), atol=1e-5, rtol=2e-4)


def test_megabatch_grad_finite():
    """Gradients flow through the sorted pass without NaN (the padded-lane
    benign-template guard; round-3 masked-NaN backward lesson)."""
    import jax
    import jax.numpy as jnp
    from grail.scene.presets import cornell_box
    from grail.engine.render import render
    from grail.engine.integrator import IntegratorConfig

    scene, meta, _ = cornell_box(xres=8, yres=8, spp=1)
    cfg = IntegratorConfig(kind="path", max_depth=3, mat_sort=True,
                           mat_sort_min=0, mat_block=32)

    def loss(const):
        s2 = dict(scene)
        s2["tex_data"] = dict(scene["tex_data"], const=const)
        img, _ = render(s2, meta, cfg, spp=1)
        return jnp.mean(img)

    g = jax.grad(loss)(scene["tex_data"]["const"])
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0.0
