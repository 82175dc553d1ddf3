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


def test_measured_brdf_merl_roundtrip(tmp_path):
    """MERL .binary loader + half-angle nearest lookup: a constant-valued file
    must evaluate to that constant (after the ctor channel scales), and a
    measured lobe must behave like a cosine-sampled BRDF (sample<->pdf)."""
    import numpy as np
    import jax.numpy as jnp
    from grail.shade import measured as msr
    from grail.shade import bsdf as bx

    n = msr.MERL_N_THETA_H * msr.MERL_N_THETA_D * msr.MERL_N_PHI_D
    path = tmp_path / "const.binary"
    with open(path, "wb") as f:
        np.asarray([msr.MERL_N_THETA_H, msr.MERL_N_THETA_D,
                    msr.MERL_N_PHI_D], np.int32).tofile(f)
        np.full(3 * n, 450.0, np.float64).tofile(f)
    tab = msr.read_merl(str(path))
    assert tab.shape == (90, 90, 180, 3)
    np.testing.assert_allclose(tab[..., 0], 450.0 / 1500.0, rtol=1e-6)
    np.testing.assert_allclose(tab[..., 1], 450.0 * 1.15 / 1500.0, rtol=1e-6)

    rng = np.random.default_rng(0)
    wo = rng.normal(size=(64, 3)); wo[:, 2] = np.abs(wo[:, 2]) + 0.05
    wi = rng.normal(size=(64, 3)); wi[:, 2] = np.abs(wi[:, 2]) + 0.05
    wo = jnp.asarray((wo / np.linalg.norm(wo, axis=1, keepdims=True))
                     .astype(np.float32))
    wi = jnp.asarray((wi / np.linalg.norm(wi, axis=1, keepdims=True))
                     .astype(np.float32))
    v = np.asarray(msr.lookup((jnp.asarray(tab),),
                              jnp.zeros(64, jnp.int32), wo, wi))
    np.testing.assert_allclose(v[:, 0], 0.3, rtol=1e-5)

    # through the lobe machinery: f == R * table value; pdf = cos/pi
    lobes = {
        "type": jnp.full((64, 1), bx.MEASURED, jnp.int32),
        "R": jnp.ones((64, 1, 3), jnp.float32),
        "S1": jnp.full((64, 1, 3), 0.5, jnp.float32),
        "S2": jnp.zeros((64, 1, 3), jnp.float32),
        "f0": jnp.zeros((64, 1), jnp.float32),
        "f1": jnp.zeros((64, 1), jnp.float32),
        "f2": jnp.zeros((64, 1), jnp.float32),
        "fr": jnp.zeros((64, 1), jnp.int32),
    }
    present = (bx.MEASURED,)
    f = np.asarray(bx.bsdf_f(lobes, wo, wi, present,
                             tables=(jnp.asarray(tab),)))
    np.testing.assert_allclose(f[:, 0], 0.3, rtol=1e-5)
    pdf = np.asarray(bx.bsdf_pdf(lobes, wo, wi, present))
    np.testing.assert_allclose(pdf, np.asarray(jnp.abs(wi[:, 2])) / np.pi,
                               rtol=1e-5)
    # fallback without tables: albedo/pi from S1
    f_fb = np.asarray(bx.bsdf_f(lobes, wo, wi, present))
    np.testing.assert_allclose(f_fb[:, 0], 0.5 / np.pi, rtol=1e-5)


def test_measured_brdf_irregular_bake(tmp_path):
    """.brdf text loader + Shepard bake: constant irregular data bakes to a
    near-constant half-angle grid."""
    import numpy as np
    import jax.numpy as jnp
    from grail.shade import measured as msr

    # constant BRDF 0.2 sampled at a grid of angles, one wavelength pair
    lines = ["2", "400", "700"]
    for ti in np.linspace(0.1, 1.4, 6):
        for to in np.linspace(0.1, 1.4, 6):
            for dp in np.linspace(0.0, 3.0, 6):
                lines.append(f"{ti} 0 {to} {dp} 0.2 0.2")
    path = tmp_path / "const.brdf"
    path.write_text("\n".join(lines))
    angles, rgb = msr.read_brdf(str(path))
    assert angles.shape[0] == 216
    # flat SPD -> equal-energy white; all samples share one RGB value
    assert np.allclose(rgb, rgb[0], atol=1e-6)
    tab = msr.bake_irregular(angles, rgb, nh=8, nd=8, npd=8)
    inside = tab[..., 1][tab[..., 1] > 0]
    assert inside.size > 0
    np.testing.assert_allclose(inside, rgb[0, 1], rtol=0.05)
