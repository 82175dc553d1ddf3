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


def test_path_grads_match_fd():
    """AD vs FD through the FULL path integrator (BASELINE config 2). Russian
    roulette is disabled (rr_depth > max_depth): the RR weight is detached in
    AD (unbiased in expectation but not per-sample), so with it off the
    per-sample estimator is smooth in albedo/emission and FD must agree."""
    scene, meta, _ = cornell_box(xres=10, yres=10, spp=1)
    cfg = IntegratorConfig(kind="path", max_depth=3, rr_depth=99)
    loss = _loss_fn(scene, meta, cfg)
    tc = scene["tex_data"]["const"]
    em = scene["lights"]["emit"]
    g_tc = np.asarray(jax.grad(loss)(tc, em))
    e = 1e-3
    fd = (loss(tc.at[0, 0].add(e), em) - loss(tc.at[0, 0].add(-e), em)) / (2 * e)
    assert np.isfinite(g_tc).all()
    np.testing.assert_allclose(float(fd), g_tc[0, 0], rtol=2e-2)


def test_image_texture_texel_grads(cornell_small):
    """Gradients w.r.t. image-texture TEXELS (BASELINE config 3): backprop
    through the bilinear imagemap lookup to individual texels, FD-checked."""
    import jax.numpy as jnp
    from grail.scene.buffers import SceneBuilder
    from grail.shade.textures import TexSpec
    from grail.core import transform as tr
    from grail.engine import camera as cam
    from grail.engine.render import render_wave
    from grail.engine import film as flm

    b = SceneBuilder()
    b.xres = b.yres = 12
    img = np.linspace(0.2, 0.8, 4 * 4 * 3).reshape(4, 4, 3).astype(np.float32)
    img_id = b.add_image(img)
    tex = b.add_texture(TexSpec(kind="image", image_id=img_id, filt="bilinear"))
    m = b.matte(kd_tex=tex)
    b.add_mesh(np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]],
                        np.float32),
               np.array([[0, 1, 2], [0, 2, 3]], np.int64), m,
               uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
    b.add_point_light((0.0, 0.0, 3.0), (20.0, 20.0, 20.0))
    c2w = tr.look_at((0, 0, 4), (0, 0, 0), (0, 1, 0))
    b.camera = cam.build_camera(cam.PERSPECTIVE, c2w, c2w, 12, 12, fov=55.0)
    scene, meta = b.finalize()
    cfg = IntegratorConfig(kind="direct", max_depth=1)

    @jax.jit
    def loss(image0):
        s = dict(scene)
        s["images"] = (image0,) + tuple(scene["images"][1:])
        f = flm.new_film(meta.xres, meta.yres)
        f = render_wave(s, meta, cfg, f, jnp.uint32(0))
        return flm.develop(f).mean()

    im0 = scene["images"][0]
    g = np.asarray(jax.grad(loss)(im0))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
    # FD on the brightest-gradient texel
    yy, xx, cc = np.unravel_index(np.argmax(np.abs(g)), g.shape)
    e = 1e-2
    fd = (loss(im0.at[yy, xx, cc].add(e))
          - loss(im0.at[yy, xx, cc].add(-e))) / (2 * e)
    np.testing.assert_allclose(float(fd), g[yy, xx, cc], rtol=2e-2)


def test_camera_pose_grads():
    """Gradients w.r.t. camera pose (BASELINE config 4): backprop through
    ray generation to the camera-to-world matrix (static cameras apply the
    m0 path of animated_apply; pose lives in m0[:3,3] / m0[:3,:3])."""
    import jax.numpy as jnp
    from grail.engine import film as flm
    from grail.engine.render import render_wave

    scene, meta, _ = cornell_box(xres=10, yres=10, spp=1)
    cfg = IntegratorConfig(kind="direct", max_depth=1)

    @jax.jit
    def loss(m0):
        s = dict(scene)
        s["camera"] = dict(scene["camera"])
        s["camera"]["c2w"] = dict(scene["camera"]["c2w"])
        s["camera"]["c2w"]["m0"] = m0
        f = flm.new_film(meta.xres, meta.yres)
        f = render_wave(s, meta, cfg, f, jnp.uint32(0))
        # spatially-weighted loss so pose perturbations register
        img = flm.develop(f)
        w = jnp.linspace(0.0, 1.0, meta.xres)[None, :, None]
        return (img * w).mean()

    m0 = scene["camera"]["c2w"]["m0"]
    g = np.asarray(jax.grad(loss)(m0))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
    # FD comparison on the x-translation entry. Camera translation MOVES
    # VISIBILITY EDGES, which detached-sampling AD deliberately excludes
    # (module docstring: unbiased for parameters that do not move
    # discontinuities), so only the smooth component can agree: require the
    # same sign and the same order of magnitude, not allclose.
    e = 1e-3
    fd = (loss(m0.at[0, 3].add(e)) - loss(m0.at[0, 3].add(-e))) / (2 * e)
    fd = float(fd)
    assert fd * g[0, 3] > 0                       # same direction
    assert abs(fd) < 10 * abs(g[0, 3]) + 1e-4     # same order


def test_inverse_rendering_recovers_albedo():
    """tools/optimize.py demo: recover Cornell wall albedos from a target
    image by gradient descent through the renderer."""
    from grail.tools.optimize import optimize_albedo
    from grail.engine.render import render

    scene, meta, _ = cornell_box(xres=16, yres=16, spp=1)
    cfg = IntegratorConfig(kind="direct", max_depth=1)
    target, _ = render(scene, meta, cfg, spp=1)
    rec, losses = optimize_albedo(scene, meta, cfg, target, steps=25, lr=0.1,
                                  spp=1, param_rows=(0,))
    true = np.asarray(scene["tex_data"]["const"])[0]
    err_init = np.abs(true - 0.5).mean()
    err_final = np.abs(true - np.asarray(rec)[0]).mean()
    assert losses[-1] < 0.3 * losses[0]
    assert err_final < 0.5 * err_init
