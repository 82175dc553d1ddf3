"""Participating media tests: analytic transmittance, emission, single scatter."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grail.shade import media as med
from grail.scene.presets import cornell_box
from grail.engine.render import render
from grail.engine.integrator import IntegratorConfig
from grail.scene.parser import parse_string


def _media_scene(**kw):
    scene, meta, b = cornell_box(xres=12, yres=12, spp=2, with_boxes=False)
    b.add_volume(med.HOMOGENEOUS, p0=(-1, 0, -1), p1=(1, 2, 1), **kw)
    scene2, meta2 = b.finalize()
    return scene2, meta2


def test_homogeneous_transmittance_analytic():
    scene, meta = _media_scene(sigma_a=(0.5, 1.0, 2.0), sigma_s=(0, 0, 0))
    o = jnp.asarray([[0.0, 1.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    # segment through the box: z from 1 → -1 ⇒ length 2
    T = np.asarray(med.transmittance(scene, meta, o, d, jnp.asarray([100.0]),
                                     jnp.asarray([0.5])))
    np.testing.assert_allclose(T[0], np.exp(-2.0 * np.array([0.5, 1.0, 2.0])),
                               rtol=1e-4)


def test_tau_grid_matches_homogeneous_for_unit_density():
    scene, meta = _media_scene(sigma_a=(0.3, 0.3, 0.3), sigma_s=(0.2, 0.2, 0.2))
    # same box as a unit-density grid
    _, _, b = cornell_box(xres=12, yres=12, spp=2, with_boxes=False)
    b.add_volume(med.GRID, p0=(-1, 0, -1), p1=(1, 2, 1),
                 sigma_a=(0.3, 0.3, 0.3), sigma_s=(0.2, 0.2, 0.2),
                 density=np.ones((4, 4, 4), np.float32))
    scene_g, meta_g = b.finalize()
    o = jnp.asarray([[0.2, 1.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t = jnp.asarray([100.0])
    u = jnp.asarray([0.5])
    tau_h = np.asarray(med.tau(scene, meta, o, d, t, u))
    tau_g = np.asarray(med.tau(scene_g, meta_g, o, d, t, u))
    np.testing.assert_allclose(tau_g, tau_h, rtol=0.05)


def test_emissive_volume_renders():
    scene, meta = _media_scene(sigma_a=(0.1,) * 3, sigma_s=(0.0,) * 3,
                               le=(1.0, 0.5, 0.2))
    cfg = IntegratorConfig(kind="direct", max_depth=1, vol="emission")
    img, _ = render(scene, meta, cfg, spp=2)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # glow tint follows Le ratios
    assert img[..., 0].mean() > img[..., 1].mean() > img[..., 2].mean()


def test_single_scattering_brightens_fog():
    scene_e, meta = _media_scene(sigma_a=(0.05,) * 3, sigma_s=(0.3,) * 3)
    img_e, _ = render(scene_e, meta,
                      IntegratorConfig(kind="direct", max_depth=1,
                                       vol="emission"), spp=2)
    img_s, _ = render(scene_e, meta,
                      IntegratorConfig(kind="direct", max_depth=1,
                                       vol="single"), spp=2)
    a, b = np.asarray(img_e), np.asarray(img_s)
    assert np.isfinite(b).all()
    assert b.mean() > a.mean()   # in-scattering adds light


def test_volume_parses_from_pbrt():
    scene, meta, api = parse_string("""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Camera "perspective"
VolumeIntegrator "single" "float stepsize" [0.25]
WorldBegin
LightSource "point" "rgb I" [5 5 5] "point from" [0 2 0]
Volume "homogeneous" "rgb sigma_a" [0.2 0.2 0.2] "rgb sigma_s" [0.1 0.1 0.1]
  "point p0" [-1 -1 -1] "point p1" [1 1 1]
Shape "trianglemesh" "integer indices" [0 1 2] "point P" [0 0 0 1 0 0 0 1 0]
WorldEnd
""")
    assert scene["media"] is not None
    assert api.integrator_config.vol == "single"
    img, _ = render(scene, meta, api.integrator_config, spp=1)
    assert np.isfinite(np.asarray(img)).all()


def test_distance_sampling_weights_unbiased():
    """E[w] over distance samples reconstructs transmittance integral."""
    scene, meta = _media_scene(sigma_a=(0.4,) * 3, sigma_s=(0.6,) * 3)
    n = 8192
    o = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 5.0]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))
    u = jnp.asarray(np.random.RandomState(0).rand(n).astype(np.float32))
    cu = jnp.asarray(np.random.RandomState(1).rand(n).astype(np.float32))
    ds = med.sample_distance(scene, meta, o, d, jnp.full((n,), 100.0), u, cu)
    # probability of passing through: E over lanes of pass events weighted
    T_exact = np.exp(-1.0 * 2.0)  # sigma_t=1, length 2
    frac_pass = float(jnp.mean((~ds["in_medium"]).astype(jnp.float32)))
    np.testing.assert_allclose(frac_pass, T_exact, atol=0.02)
    w_pass = np.asarray(ds["w_pass"])[~np.asarray(ds["in_medium"])]
    np.testing.assert_allclose(w_pass.mean(axis=0) * frac_pass, T_exact,
                               rtol=0.05)


def test_phase_function_normalization():
    """volume.cpp phase library: each integrates to 1 over the sphere."""
    import numpy as np
    import jax.numpy as jnp
    from grail.shade import media as med

    n = 4096
    mu = jnp.asarray(np.linspace(-1 + 1e-6, 1 - 1e-6, n).astype(np.float32))
    w = 2 * np.pi * 2.0 / n       # dphi * dmu
    for name, fn in [("iso", med.phase_isotropic),
                     ("rayleigh", med.phase_rayleigh),
                     ("hazy", med.phase_mie_hazy),
                     ("murky", med.phase_mie_murky),
                     ("schlick.3", lambda c: med.phase_schlick(0.3, c)),
                     ("schlick-.5", lambda c: med.phase_schlick(-0.5, c)),
                     ("hg.6", lambda c: med.phase_hg_eval(0.6, c))]:
        total = float(np.asarray(fn(mu)).sum() * w)
        np.testing.assert_allclose(total, 1.0, rtol=2e-2, err_msg=name)
