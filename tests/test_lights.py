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


def _image_light_scene(kind, img, fov=60.0):
    """Floor + one image-driven delta light at (0, 2, 0) aimed down (-y)."""
    b = SceneBuilder()
    b.xres, b.yres = 16, 16
    b.sampler = SamplerConfig(kind=ZERO_TWO, spp=4)
    b.filter = FilterConfig.from_name("box")
    white = b.matte(kd=(0.7, 0.7, 0.7))
    v, i = _quad((-2, 0, 2), (2, 0, 2), (2, 0, -2), (-2, 0, -2))
    b.add_mesh(v, i, white)
    img_id = b.add_image(img)
    # light-to-world: light-space +z aims at world -y
    l2w = np.array([[1, 0, 0, 0],
                    [0, 0, -1, 2],
                    [0, 1, 0, 0],
                    [0, 0, 0, 1]], np.float64)
    if kind == "projection":
        b.add_projection_light(l2w, (5.0, 5.0, 5.0), fov=fov, image_id=img_id)
    else:
        b.add_goniometric_light(l2w, (5.0, 5.0, 5.0), image_id=img_id)
    c2w = tr.look_at([0.0, 1.0, 3.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    b.camera = cam.build_camera(cam.PERSPECTIVE, c2w, c2w, 16, 16, fov=45)
    scene, meta = b.finalize()
    return scene, meta


def test_projection_light_image_modulation():
    """projection.cpp: I/d² modulated by the image at the projected screen
    coords; zero outside the frustum."""
    from grail.shade import lights as lt
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4] = 0.25       # left half dim
    img[:, 4:] = 1.0        # right half bright
    scene, meta = _image_light_scene("projection", img, fov=60.0)
    assert meta.light_image_rows  # wired through the static meta

    li = jnp.zeros((3,), jnp.int32)
    p = jnp.asarray([[-0.5, 0.0, 0.001],      # left of center under the light
                     [0.5, 0.0, 0.001],       # right of center
                     [3.5, 0.0, 0.001]],      # far outside the 60° frustum
                    jnp.float32)
    u = jnp.zeros((3,), jnp.float32)
    ls = lt.sample_li(scene, li, p, u, u, u, meta.light_types,
                      meta.light_image_rows)
    rad = np.asarray(ls["radiance"])
    d2_a = 0.5 ** 2 + 2.0 ** 2 + 0.001 ** 2
    # light-space: +z down; screen x = world x / |y-dist| scaled by fov
    # left point projects to s<0.5 -> 0.25, right -> 1.0
    base_a = 5.0 / d2_a
    np.testing.assert_allclose(rad[0, 0], base_a * 0.25, rtol=0.02)
    np.testing.assert_allclose(rad[1, 0], base_a * 1.0, rtol=0.02)
    np.testing.assert_allclose(rad[2], 0.0, atol=1e-7)


def test_goniometric_light_map_modulation():
    """goniometric.cpp: I/d² times the lat-long map of the local direction."""
    from grail.shade import lights as lt
    # map: value depends on theta (rows); theta=0 (light +z = world -y) -> 1.0
    img = np.linspace(1.0, 0.2, 8, dtype=np.float32)[:, None, None] \
        * np.ones((8, 16, 3), np.float32)
    scene, meta = _image_light_scene("gonio", img)
    li = jnp.zeros((2,), jnp.int32)
    # avoid theta=0 exactly: the repeat-wrapped bilinear blends across the
    # pole there (pbrt's REPEAT-wrap MIPMap behaves the same)
    p = jnp.asarray([[2.0, 0.0, 0.0],        # theta=45°: t=0.25
                     [2.0, 2.0, 0.0]],       # sideways: theta=90°: t=0.5
                    jnp.float32)
    u = jnp.zeros((2,), jnp.float32)
    ls = lt.sample_li(scene, li, p, u, u, u, meta.light_types,
                      meta.light_image_rows)
    rad = np.asarray(ls["radiance"])
    rows = np.linspace(1.0, 0.2, 8)
    # t=0.25 -> y=1.5: rows 1,2 averaged; t=0.5 -> y=3.5: rows 3,4 averaged
    np.testing.assert_allclose(rad[0, 0], 5.0 / 8.0 * rows[1:3].mean(),
                               rtol=0.02)
    np.testing.assert_allclose(rad[1, 0], 5.0 / 4.0 * rows[3:5].mean(),
                               rtol=0.02)


def test_alpha_cutout_intersection():
    """Triangle alpha cutout (trianglemesh.cpp Triangle::Intersect alpha test
    ~L230): rays through zero-alpha texels pass through to the surface behind;
    occlusion (IntersectP) ignores cutout regions too."""
    from grail.engine.integrator import scene_intersect, scene_intersect_p
    from grail.shade.textures import TexSpec

    b = SceneBuilder()
    b.xres, b.yres = 8, 8
    b.sampler = SamplerConfig(kind=ZERO_TWO, spp=1)
    b.filter = FilterConfig.from_name("box")
    white = b.matte(kd=(0.7, 0.7, 0.7))
    # alpha image: left half 0 (cutout), right half 1
    aimg = np.zeros((4, 4, 3), np.float32)
    aimg[:, 2:] = 1.0
    img_id = b.add_image(aimg)
    atex = b.add_texture(TexSpec(kind="image", image_id=img_id,
                                 filt="bilinear"))
    # front quad at z=0 with uv [0,1]^2, alpha-mapped
    v, i = _quad((-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b.add_mesh(v, i, white, uvs=uvs, alpha_tex=atex)
    # opaque back quad at z=-1
    v2, i2 = _quad((-2, -2, -1), (2, -2, -1), (2, 2, -1), (-2, 2, -1))
    b.add_mesh(v2, i2, white)
    c2w = tr.look_at([0, 0, 2.0], [0, 0, 0], [0, 1, 0])
    b.camera = cam.build_camera(cam.PERSPECTIVE, c2w, c2w, 8, 8, fov=45)
    scene, meta = b.finalize()
    assert meta.alpha_rows == (atex,)

    # rays straight down -z: u<0.5 -> cutout, u>0.5 -> solid.
    # uv on the quad: u = (x+1)/2
    o = jnp.asarray([[-0.5, 0.1, 2.0], [0.5, 0.1, 2.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1.0], [0, 0, -1.0]], jnp.float32)
    tmax = jnp.full((2,), 1e7, jnp.float32)
    hit = scene_intersect(scene, meta, o, d, tmax)
    t = np.asarray(hit["t"])
    np.testing.assert_allclose(t[0], 3.0, rtol=1e-5)   # through the cutout
    np.testing.assert_allclose(t[1], 2.0, rtol=1e-5)   # solid half
    # occlusion within 2.5 units: cutout ray unoccluded, solid ray occluded
    occ = np.asarray(scene_intersect_p(scene, meta, o, d,
                                       jnp.full((2,), 2.5, jnp.float32)))
    assert not occ[0] and occ[1]
