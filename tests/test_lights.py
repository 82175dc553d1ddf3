"""Area-light directional pdf (ShapeSet::Pdf, src/core/light.cpp) tests.

The failure case for a per-triangle pdf: an emitter whose own triangles stack
along one direction (two parallel quads in one light). ShapeSet::Pdf sums a
term per intersected triangle; both MIS branches must use that same function
or the weights stop partitioning unity.
"""
import numpy as np
import jax
import jax.numpy as jnp

from grail.scene.buffers import SceneBuilder
from grail.scene.presets import _quad
from grail.core.rng import SamplerConfig, ZERO_TWO
from grail.engine.filters import FilterConfig
from grail.core import transform as tr
from grail.engine import camera as cam


def _stacked_light_scene(xres=32, yres=32, spp=8):
    """Lambertian floor + ONE area light made of two stacked parallel quads
    (lower at y=1, upper at y=1.5), both emitting downward."""
    b = SceneBuilder()
    b.xres, b.yres = xres, yres
    b.sampler = SamplerConfig(kind=ZERO_TWO, spp=spp)
    b.filter = FilterConfig.from_name("box")
    white = b.matte(kd=(0.7, 0.7, 0.7))
    v, i = _quad((-2, 0, 2), (2, 0, 2), (2, 0, -2), (-2, 0, -2))
    b.add_mesh(v, i, white)
    # two quads, SAME light: winding gives -y normals (emit downward)
    s = 0.5
    v1, i1 = _quad((-s, 1.0, -s), (s, 1.0, -s), (s, 1.0, s), (-s, 1.0, s))
    v2, i2 = _quad((-s, 1.5, -s), (s, 1.5, -s), (s, 1.5, s), (-s, 1.5, s))
    verts = np.concatenate([v1, v2])
    idx = np.concatenate([i1, i2 + 4])
    black = b.matte(kd=(0, 0, 0))
    b.add_mesh(verts, idx, black, area_light_emit=(6.0, 6.0, 6.0))
    c2w = tr.look_at([0.0, 0.55, 2.6], [0.0, 0.3, 0.0], [0.0, 1.0, 0.0])
    b.camera = cam.build_camera(cam.PERSPECTIVE, c2w, c2w, xres, yres, fov=45)
    scene, meta = b.finalize()
    return scene, meta, b


def test_shapeset_pdf_sums_stacked_quads():
    """The reference ShapeSet::Pdf direction sum (parity implementation)."""
    from grail.shade import lights as lt
    scene, meta, _ = _stacked_light_scene()
    li = jnp.zeros((4,), jnp.int32)
    # off the quads' shared diagonal (a ray through the diagonal edge hits
    # both triangles of a quad — measure-zero, but deterministic here)
    p = jnp.asarray([[0.01, 0.0, 0.07]] * 4, jnp.float32)
    wi = jnp.asarray([[0, 1, 0], [0, 1, 0], [1, 0, 0], [0, -1, 0]],
                     jnp.float32)
    pdf = np.asarray(lt.area_light_pdf_dir_sum(scene, li, p, wi))
    # straight up from origin: crosses BOTH quads; total light area = 2 quads
    # of 1x1 = 2.0; terms t²/(|cos|·A) = 1/2 and 1.5²/2
    expect = 1.0 / 2.0 + 1.5 ** 2 / 2.0
    np.testing.assert_allclose(pdf[0], expect, rtol=1e-5)
    np.testing.assert_allclose(pdf[1], expect, rtol=1e-5)
    assert pdf[2] == 0.0          # sideways: hits nothing
    assert pdf[3] == 0.0          # downward: hits nothing


def test_stacked_light_mis_matches_quadrature():
    """estimate_direct at the floor point beneath the stacked emitter vs
    dense area quadrature over the (sole visible) lower quad.

    Only the LOWER quad is visible from below (the upper is occluded by it),
    so the reference integral is the lower quad's view factor; the MIS
    estimator must match it — with inconsistent per-branch pdfs (the old
    single-triangle convention) directions crossing both quads get weights
    that do not partition unity and the estimate drifts."""
    from grail.engine.integrator import (IntegratorConfig, estimate_direct,
                                         _shade_context, _pick_light)
    from grail.kernels import intersect as isect
    from grail.core import rng as rngmod

    scene, meta, _ = _stacked_light_scene()
    n = 8192
    p0 = np.array([0.013, 0.0, 0.027], np.float32)   # off the quad diagonals
    o = jnp.asarray(np.tile(p0 + [0, 0.3, 0], (n, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([0.0, -1.0, 0.0], (n, 1)).astype(np.float32))
    hit = isect.intersect(scene, o, d, jnp.full((n,), 1e7, jnp.float32))
    sg, lobes, wo_local = _shade_context(scene, meta, hit, o, d)

    pix = jnp.arange(n, dtype=jnp.uint32)
    samp = jnp.zeros((n,), jnp.uint32)
    cfg = IntegratorConfig(kind="direct", max_depth=1)
    active = hit["prim"] >= 0
    lidx, pmf = _pick_light(scene, meta, cfg, pix, samp, 0, active)
    Ld = estimate_direct(
        scene, meta, sg, lobes, wo_local, lidx, pmf,
        rngmod.sample_2d(meta.sampler, pix, samp, 10),
        rngmod.sample_1d(meta.sampler, pix, samp, 11),
        rngmod.sample_1d(meta.sampler, pix, samp, 12),
        rngmod.sample_2d(meta.sampler, pix, samp, 13), active)
    got = float(np.asarray(Ld)[:, 0].mean())

    emit = 6.0
    kd = 0.7
    nq = 500
    xs = (np.arange(nq) + 0.5) / nq - 0.5          # lower quad spans [-.5,.5]
    X, Z = np.meshgrid(xs, xs)
    area_el = (1.0 / nq) ** 2
    vec = np.stack([X - p0[0], np.full_like(X, 1.0), Z - p0[2]], -1)
    d2 = (vec ** 2).sum(-1)
    cosw = vec[..., 1] / np.sqrt(d2)               # both cosines equal
    L_ref = (kd / np.pi * emit * cosw * cosw / d2 * area_el).sum()

    np.testing.assert_allclose(got, L_ref, rtol=0.04)
