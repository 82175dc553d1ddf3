"""BSDF statistical validation — the bsdftest.cpp analog (SURVEY §4):
sample↔pdf consistency via hemispherical-reflectance agreement, plus energy checks.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from grail.shade import bsdf as bx
from grail.core import rng
from grail.core.vecmath import PI


def _mk_lobes(n, lobe_type, R=(0.7, 0.7, 0.7), S1=(0.5, 0.5, 0.5),
              S2=(1.0, 1.0, 1.0), f0=20.0, f1=50.0, f2=1.5, fr=bx.FR_NOOP):
    ones = jnp.ones((n, 1))
    return {
        "type": jnp.full((n, 1), lobe_type, jnp.int32),
        "fr": jnp.full((n, 1), fr, jnp.int32),
        "R": jnp.asarray(R) * jnp.ones((n, 1, 3)),
        "S1": jnp.asarray(S1) * jnp.ones((n, 1, 3)),
        "S2": jnp.asarray(S2) * jnp.ones((n, 1, 3)),
        "f0": f0 * ones, "f1": f1 * ones, "f2": f2 * ones,
    }


@partial(jax.jit, static_argnames=("present", "n", "seed"))
def _rho_sample(lobes, present, wo, n=8192, seed=0):
    """rho via importance sampling: E[f |cos| / pdf]."""
    cfg = rng.SamplerConfig(kind=rng.RANDOM, seed=seed)
    pix = jnp.zeros(n, jnp.uint32)
    samp = jnp.arange(n, dtype=jnp.uint32)
    u1 = rng.sample_1d(cfg, pix, samp, 0)
    u2 = rng.sample_1d(cfg, pix, samp, 1)
    uc = rng.sample_1d(cfg, pix, samp, 2)
    wo_b = jnp.broadcast_to(wo, (n, 3))
    out = bx.bsdf_sample(lobes, wo_b, u1, u2, uc, present)
    contrib = out["f"] * (jnp.abs(out["wi"][:, 2])
                          / jnp.maximum(out["pdf"], 1e-9))[:, None]
    contrib = jnp.where((out["valid"] & (out["pdf"] > 0))[:, None], contrib, 0.0)
    return contrib.mean(axis=0)


@partial(jax.jit, static_argnames=("present", "n", "seed"))
def _rho_uniform(lobes, present, wo, n=16384, seed=1):
    """rho via uniform hemisphere sampling of f."""
    from grail.core import montecarlo as mc
    cfg = rng.SamplerConfig(kind=rng.RANDOM, seed=seed)
    pix = jnp.zeros(n, jnp.uint32)
    samp = jnp.arange(n, dtype=jnp.uint32)
    u1 = rng.sample_1d(cfg, pix, samp, 0)
    u2 = rng.sample_1d(cfg, pix, samp, 1)
    wi = mc.uniform_sample_hemisphere(u1, u2)
    wo_b = jnp.broadcast_to(wo, (n, 3))
    f = bx.bsdf_f(lobes, wo_b, wi, present)
    return (f * (wi[:, 2:3] * 2 * PI)).mean(axis=0)


WO = jnp.asarray(np.array([0.3, -0.2, 0.93], np.float32))
WO = WO / jnp.linalg.norm(WO)


def test_lambert_rho_exact():
    n = 4096
    lobes = _mk_lobes(n, bx.LAMBERT, R=(0.6, 0.4, 0.2))
    rho = np.asarray(_rho_sample(lobes, (bx.LAMBERT,), WO, n))
    np.testing.assert_allclose(rho, [0.6, 0.4, 0.2], atol=0.02)


def test_oren_nayar_consistency():
    n = 4096
    lobes = _mk_lobes(n, bx.OREN_NAYAR, R=(0.7, 0.7, 0.7), f0=0.35)
    a = np.asarray(_rho_sample(lobes, (bx.OREN_NAYAR,), WO, n))
    b = np.asarray(_rho_uniform(lobes, (bx.OREN_NAYAR,), WO, n))
    np.testing.assert_allclose(a, b, rtol=0.08)
    assert np.all(a <= 0.75)


def test_blinn_consistency_and_energy():
    n = 4096
    lobes = _mk_lobes(n, bx.BLINN, R=(0.9, 0.9, 0.9), f0=30.0, fr=bx.FR_NOOP)
    a = np.asarray(_rho_sample(lobes, (bx.BLINN,), WO, n))
    b = np.asarray(_rho_uniform(lobes, (bx.BLINN,), WO, n))
    np.testing.assert_allclose(a, b, rtol=0.1)
    assert np.all(a <= 1.05), a  # energy conservation


def test_aniso_consistency():
    n = 4096
    lobes = _mk_lobes(n, bx.ANISO, R=(0.8, 0.8, 0.8), f0=15.0, f1=80.0)
    a = np.asarray(_rho_sample(lobes, (bx.ANISO,), WO, n))
    b = np.asarray(_rho_uniform(lobes, (bx.ANISO,), WO, n))
    np.testing.assert_allclose(a, b, rtol=0.12)


def test_fresnel_blend_consistency():
    n = 4096
    lobes = _mk_lobes(n, bx.FRESNEL_BLEND, R=(0.5, 0.3, 0.2),
                      S1=(0.08, 0.08, 0.08), f0=25.0, f1=25.0)
    a = np.asarray(_rho_sample(lobes, (bx.FRESNEL_BLEND,), WO, n))
    b = np.asarray(_rho_uniform(lobes, (bx.FRESNEL_BLEND,), WO, n))
    np.testing.assert_allclose(a, b, rtol=0.1)


def test_specular_reflection_energy():
    n = 256
    lobes = _mk_lobes(n, bx.SPEC_REFL, R=(1.0, 1.0, 1.0), fr=bx.FR_NOOP)
    out = bx.bsdf_sample(lobes, jnp.broadcast_to(WO, (n, 3)),
                         jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
                         (bx.SPEC_REFL,))
    # f·|cos|/pdf must equal R exactly (mirror preserves energy)
    val = out["f"] * (jnp.abs(out["wi"][:, 2]) / out["pdf"])[:, None]
    np.testing.assert_allclose(np.asarray(val), 1.0, rtol=1e-5)
    # direction is mirror reflection
    np.testing.assert_allclose(np.asarray(out["wi"][0]),
                               [-WO[0], -WO[1], WO[2]], atol=1e-6)
    assert bool(out["specular"][0])


def test_fresnel_dielectric_normal_incidence():
    # R(0°) = ((n1-n2)/(n1+n2))^2 = (0.5/2.5)^2 = 0.04 for n=1.5
    fr = bx.fr_dielectric(jnp.float32(1.0), 1.0, 1.5)
    np.testing.assert_allclose(float(fr), 0.04, atol=1e-4)
    # TIR beyond critical angle from inside
    fr_tir = bx.fr_dielectric(jnp.float32(-0.1), 1.0, 1.5)
    np.testing.assert_allclose(float(fr_tir), 1.0)


def test_spec_trans_refraction_direction():
    n = 4
    lobes = _mk_lobes(n, bx.SPEC_TRANS, R=(1.0, 1.0, 1.0), f2=1.5)
    wo = jnp.asarray([[0.0, 0.0, 1.0]] * n)  # normal incidence
    out = bx.bsdf_sample(lobes, wo, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
                         (bx.SPEC_TRANS,))
    np.testing.assert_allclose(np.asarray(out["wi"][0]), [0, 0, -1], atol=1e-5)


def test_glass_stack_two_lobes():
    """glass = SPEC_REFL + SPEC_TRANS; picks split by u_comp; energy splits by F."""
    n = 4096
    ones = jnp.ones((n, 2))
    lobes = {
        "type": jnp.tile(jnp.array([[bx.SPEC_REFL, bx.SPEC_TRANS]]), (n, 1)),
        "fr": jnp.full((n, 2), bx.FR_DIELECTRIC, jnp.int32),
        "R": jnp.ones((n, 2, 3)),
        "S1": jnp.ones((n, 2, 3)),
        "S2": jnp.ones((n, 2, 3)),
        "f0": ones, "f1": ones, "f2": 1.5 * ones,
    }
    cfg = rng.SamplerConfig(kind=rng.RANDOM)
    uc = rng.sample_1d(cfg, jnp.zeros(n, jnp.uint32), jnp.arange(n), 0)
    wo = jnp.broadcast_to(WO, (n, 3))
    out = bx.bsdf_sample(lobes, wo, jnp.zeros(n), jnp.zeros(n), uc,
                         (bx.SPEC_REFL, bx.SPEC_TRANS))
    val = out["f"] * (jnp.abs(out["wi"][:, 2]) / out["pdf"])[:, None]
    total = np.asarray(jnp.mean(val, axis=0))
    # RADIANCE total = F + (1-F)·(ei/et)²: transmission compresses radiance by the
    # solid-angle Jacobian (pbrt SpecularTransmission's (ei/et)² factor)
    F = float(bx.fr_dielectric(jnp.abs(WO[2]), 1.0, 1.5))
    expected = F + (1.0 - F) * (1.0 / 1.5) ** 2
    np.testing.assert_allclose(total, expected, atol=0.05)
