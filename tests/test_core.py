"""Core math/RNG/distribution tests (SURVEY §4: invariants + statistical checks)."""
import numpy as np
import jax.numpy as jnp

from grail.core import rng, montecarlo as mc, transform as tr, vecmath as vm
from grail.core.spectrum import blackbody_rgb, luminance


def test_sampler_uniformity():
    for kind in (rng.RANDOM, rng.STRATIFIED, rng.ZERO_TWO):
        cfg = rng.SamplerConfig(kind=kind, spp=64)
        n = 4096
        u = np.asarray(rng.sample_1d(cfg, jnp.zeros(n, jnp.uint32),
                                     jnp.arange(n), 7))
        assert 0.0 <= u.min() and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.02, kind
        # crude equidistribution: 8 bins within 20% of n/8
        h, _ = np.histogram(u, bins=8, range=(0, 1))
        assert np.all(np.abs(h - n / 8) < n / 8 * 0.25), (kind, h)


def test_zero_two_stratification():
    """(0,2)-sequence: first 2^k samples land one per 2^k stratum."""
    cfg = rng.SamplerConfig(kind=rng.ZERO_TWO, spp=16)
    ux, uy = rng.sample_2d(cfg, jnp.zeros(16, jnp.uint32), jnp.arange(16), 3)
    ux, uy = np.asarray(ux), np.asarray(uy)
    # elementary intervals: 4x4 grid must have exactly one point per cell
    cells = set((int(x * 4), int(y * 4)) for x, y in zip(ux, uy))
    assert len(cells) == 16


def test_sampler_determinism():
    cfg = rng.SamplerConfig(kind=rng.ZERO_TWO, spp=8)
    a = np.asarray(rng.sample_1d(cfg, jnp.arange(64), jnp.zeros(64, jnp.uint32), 5))
    b = np.asarray(rng.sample_1d(cfg, jnp.arange(64), jnp.zeros(64, jnp.uint32), 5))
    assert np.array_equal(a, b)


def test_distribution_1d_matches_pmf():
    f = jnp.array([1.0, 3.0, 0.0, 4.0])
    d = mc.build_distribution_1d(f)
    u = jnp.linspace(0, 0.999, 4000)
    idx, pmf = mc.sample_distribution_1d_discrete(d, u)
    counts = np.bincount(np.asarray(idx), minlength=4) / 4000
    np.testing.assert_allclose(counts, [1 / 8, 3 / 8, 0, 4 / 8], atol=0.01)
    np.testing.assert_allclose(
        np.asarray(mc.distribution_1d_pdf_discrete(d, jnp.array([0, 1, 3]))),
        [1 / 8, 3 / 8, 4 / 8], rtol=1e-5)


def test_distribution_2d_pdf_integrates():
    func = jnp.asarray(np.random.RandomState(0).rand(8, 16).astype(np.float32))
    d = mc.build_distribution_2d(func)
    u1 = jnp.asarray(np.random.RandomState(1).rand(5000).astype(np.float32))
    u2 = jnp.asarray(np.random.RandomState(2).rand(5000).astype(np.float32))
    u, v, pdf = mc.sample_distribution_2d(d, u1, u2)
    # E[1/pdf] over samples = area of domain = 1
    est = float(np.mean(1.0 / np.asarray(pdf)))
    assert abs(est - 1.0) < 0.02
    # consistency of pdf query vs sampling pdf
    pq = np.asarray(mc.distribution_2d_pdf(d, u, v))
    np.testing.assert_allclose(pq, np.asarray(pdf), rtol=1e-3)


def test_concentric_disk_in_unit_disk():
    u = np.random.RandomState(3).rand(2, 1000).astype(np.float32)
    dx, dy = mc.concentric_sample_disk(jnp.asarray(u[0]), jnp.asarray(u[1]))
    r2 = np.asarray(dx) ** 2 + np.asarray(dy) ** 2
    assert r2.max() <= 1.0 + 1e-6
    # area coverage: mean radius^2 of uniform disk = 1/2
    assert abs(r2.mean() - 0.5) < 0.03


def test_transform_roundtrip():
    m = tr.look_at([1, 2, 3], [0, 0, 0], [0, 1, 0]) @ tr.rotate(30, [0, 1, 1])
    mi = tr.inverse(m)
    p = jnp.asarray(np.random.RandomState(0).randn(10, 3).astype(np.float32))
    p2 = tr.xform_p(jnp.asarray(mi), tr.xform_p(jnp.asarray(m), p))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-4)


def test_animated_transform_endpoints():
    m0 = tr.translate([0, 0, 0])
    m1 = tr.rotate(90, [0, 0, 1]) @ tr.translate([1, 0, 0])
    pk = {k: jnp.asarray(v) for k, v in tr.animated_pack(m0, m1).items()}
    t = jnp.array([0.0, 1.0])
    m = tr.animated_eval(pk, t)
    np.testing.assert_allclose(np.asarray(m[0]), m0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m[1]), m1, atol=1e-5)


def test_quadratic():
    has, t0, t1 = vm.quadratic(jnp.float32(1.0), jnp.float32(-3.0), jnp.float32(2.0))
    assert bool(has) and abs(float(t0) - 1) < 1e-6 and abs(float(t1) - 2) < 1e-6


def test_blackbody_is_whiteish_at_6500():
    rgb = blackbody_rgb(6500)
    assert np.all(rgb > 0.8) and np.all(rgb < 1.3)


def test_coordinate_system_orthonormal():
    v = jnp.asarray(np.random.RandomState(5).randn(50, 3).astype(np.float32))
    v = v / np.linalg.norm(np.asarray(v), axis=1, keepdims=True)
    a, b = vm.coordinate_system(v)
    for x, y in [(v, a), (v, b), (a, b)]:
        np.testing.assert_allclose(np.asarray(vm.dot(x, y)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.length(a)), 1, atol=1e-5)
