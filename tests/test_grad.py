"""Differentiability: AD gradients vs finite differences (BASELINE requirement)."""
import numpy as np
import jax
import jax.numpy as jnp

from grail.scene.presets import cornell_box
from grail.engine.render import render_wave
from grail.engine.integrator import IntegratorConfig
from grail.engine import film as flm


def _loss_fn(scene, meta, cfg):
    @jax.jit
    def loss(tex_const, emit):
        s = dict(scene)
        s["tex_data"] = dict(scene["tex_data"])
        s["tex_data"]["const"] = tex_const
        s["lights"] = dict(scene["lights"])
        s["lights"]["emit"] = emit
        f = flm.new_film(meta.xres, meta.yres)
        f = render_wave(s, meta, cfg, f, jnp.uint32(0))
        return flm.develop(f).mean()
    return loss


def test_albedo_and_emission_grads_match_fd():
    scene, meta, _ = cornell_box(xres=12, yres=12, spp=2)
    cfg = IntegratorConfig(kind="direct", max_depth=1)
    loss = _loss_fn(scene, meta, cfg)
    tc = scene["tex_data"]["const"]
    em = scene["lights"]["emit"]

    g_tc, g_em = jax.grad(loss, argnums=(0, 1))(tc, em)
    g_tc, g_em = np.asarray(g_tc), np.asarray(g_em)
    assert np.isfinite(g_tc).all() and np.isfinite(g_em).all()
    assert g_tc[0].sum() > 0       # white walls: more albedo → brighter
    assert g_em.sum() > 0          # more emission → brighter

    e = 1e-3
    fd = (loss(tc.at[0, 0].add(e), em) - loss(tc.at[0, 0].add(-e), em)) / (2 * e)
    np.testing.assert_allclose(float(fd), g_tc[0, 0], rtol=5e-3)

    fd_em = (loss(tc, em.at[0, 1].add(e)) - loss(tc, em.at[0, 1].add(-e))) / (2 * e)
    np.testing.assert_allclose(float(fd_em), g_em[0, 1], rtol=5e-3)


def test_path_grads_finite():
    scene, meta, _ = cornell_box(xres=8, yres=8, spp=2)
    cfg = IntegratorConfig(kind="path", max_depth=3)
    loss = _loss_fn(scene, meta, cfg)
    g = jax.grad(loss)(scene["tex_data"]["const"], scene["lights"]["emit"])
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
