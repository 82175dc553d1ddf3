"""Checkpoint/resume + adaptive sampling (SURVEY §5.4, §2.8 'adaptive').

The reference has neither: a killed pbrt render loses the film (image.cpp
holds it in RAM until WriteImage), and AdaptiveSampler re-queues per pixel
inside a task. Here resume must be *bitwise identical* (counter-based RNG)
and adaptive re-queueing happens between waves on a compacted pixel subset.
"""
import numpy as np
import jax.numpy as jnp

from grail.engine.render import render, render_adaptive, _render_wave_jit
from grail.engine.integrator import IntegratorConfig
from grail.engine import film as flm
from grail.engine import checkpoint as ckpt


def test_checkpoint_resume_bitwise(cornell_small, tmp_path):
    scene, meta, _ = cornell_small
    cfg = IntegratorConfig(kind="path", max_depth=3)
    path = tmp_path / "ck.npz"

    img_full, _ = render(scene, meta, cfg, spp=4)

    # simulate a kill after wave 2: checkpoint, then resume from disk
    film = flm.new_film(meta.xres, meta.yres)
    for s in range(2):
        film = _render_wave_jit(scene, meta, cfg, film, jnp.uint32(s))
    ckpt.save(path, film, 2, meta, cfg)
    del film

    img_resumed, _ = render(scene, meta, cfg, spp=4, checkpoint_path=str(path))
    np.testing.assert_array_equal(np.asarray(img_full),
                                  np.asarray(img_resumed))


def test_checkpoint_fingerprint_mismatch(cornell_small, tmp_path):
    scene, meta, _ = cornell_small
    cfg = IntegratorConfig(kind="path", max_depth=3)
    path = tmp_path / "ck.npz"
    film = flm.new_film(meta.xres, meta.yres)
    ckpt.save(path, film, 1, meta, cfg)
    other = IntegratorConfig(kind="path", max_depth=7)
    try:
        ckpt.load(path, meta, other)
        raise AssertionError("expected fingerprint mismatch")
    except ValueError:
        pass


def test_adaptive_matches_uniform_at_max(cornell_small):
    """With threshold<0 every pixel re-queues each round, so adaptive ==
    uniform render at max_spp (same counter-based sample positions)."""
    scene, meta, _ = cornell_small
    cfg = IntegratorConfig(kind="path", max_depth=2)
    img_u, _ = render(scene, meta, cfg, spp=6)
    img_a, (_, _, spp_map) = render_adaptive(scene, meta, cfg, min_spp=4,
                                             max_spp=6, threshold=-1.0)
    assert int(spp_map.min()) == 6
    np.testing.assert_allclose(np.asarray(img_u), np.asarray(img_a),
                               rtol=1e-5, atol=1e-6)


def test_adaptive_concentrates_samples(cornell_small):
    scene, meta, _ = cornell_small
    cfg = IntegratorConfig(kind="path", max_depth=3)
    img, (_, _, spp_map) = render_adaptive(scene, meta, cfg, min_spp=4,
                                           max_spp=8, threshold=0.25)
    assert np.all(np.isfinite(np.asarray(img)))
    assert spp_map.min() >= 4 and spp_map.max() <= 8
