"""TLAS/BLAS instancing + object motion blur — pbrt src/core/primitive.cpp
TransformedPrimitive semantics: shared object geometry, per-instance
(possibly animated) object-to-world transforms, ray transformed to object
space at ray.time, hit returned in world space."""
import numpy as np
import jax
import jax.numpy as jnp

from grail.scene.buffers import SceneBuilder
from grail.core import transform as tr
from grail.scene.shapes import sphere
from grail.engine import camera as cam
from grail.engine.render import render
from grail.engine.integrator import IntegratorConfig


def _floor_builder(res=48):
    b = SceneBuilder()
    b.xres = b.yres = res
    b.matte(kd=(0.6, 0.6, 0.6))
    b.add_mesh(np.array([[-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5]],
                        np.float32),
               np.array([[0, 1, 2], [0, 2, 3]], np.int64), 0)
    b.add_point_light((0.0, 4.0, 0.0), (30.0, 30.0, 30.0))
    c2w = tr.look_at((0, 1.5, 4.0), (0, 0.5, 0), (0, 1, 0))
    b.camera = cam.build_camera(cam.PERSPECTIVE, c2w, c2w, res, res, fov=50.0)
    return b


def test_instances_match_baked():
    """Two instances of a sphere BLAS must render identically to the same
    spheres baked into the base soup (world-space duplicate geometry)."""
    v, i, n, uv = sphere(radius=0.5, nu=24, nv=12)
    m1 = tr.translate((-1.0, 0.5, 0.0))
    m2 = tr.translate((1.2, 0.5, 0.0)) @ tr.rotate_y(40.0) \
        @ tr.scale(0.8, 0.8, 0.8)

    b = _floor_builder()
    oid = b.add_object()
    b.add_object_mesh(oid, v, i, 0, normals=n, uvs=uv)
    b.add_instance(oid, m1)
    b.add_instance(oid, m2)
    si, mi = b.finalize()

    b = _floor_builder()
    b.use_bvh = True
    b.add_mesh(tr.xform_p_np(m1, v), i, 0,
               normals=tr.xform_n_np(tr.inverse(m1), n), uvs=uv)
    sn = tr.xform_n_np(tr.inverse(m2), n)
    sn /= np.linalg.norm(sn, axis=1, keepdims=True)
    b.add_mesh(tr.xform_p_np(m2, v), i, 0, normals=sn, uvs=uv)
    sb, mb = b.finalize()

    # geometry NOT duplicated: instanced scene stores the sphere once
    assert si["verts"].shape[0] < sb["verts"].shape[0]
    assert si["inst"]["root"].shape[0] == 2

    cfg = IntegratorConfig(kind="direct", max_depth=2)
    ii, _ = render(si, mi, cfg, spp=4)
    bi, _ = render(sb, mb, cfg, spp=4)
    assert float(jnp.mean(jnp.abs(bi))) > 0.01
    np.testing.assert_allclose(np.asarray(ii), np.asarray(bi), atol=2e-3)


def test_instanced_motion_blur():
    """An animated instance transform must smear the object across the
    shutter (per-ray slerp of the TRS pair, AnimatedTransform::Interpolate)."""
    v, i, n, uv = sphere(radius=0.4, nu=24, nv=12)

    def make(m_end):
        b = _floor_builder()
        oid = b.add_object()
        b.add_object_mesh(oid, v, i, 0, normals=n, uvs=uv)
        b.add_instance(oid, tr.translate((-0.8, 0.5, 0.0)), m_end)
        return b.finalize()

    static, ms = make(tr.translate((-0.8, 0.5, 0.0)))
    moving, mm = make(tr.translate((0.8, 0.5, 0.0)))
    cfg = IntegratorConfig(kind="direct", max_depth=1)
    i_s, _ = render(static, ms, cfg, spp=16)
    i_m, _ = render(moving, mm, cfg, spp=16)
    diff = jnp.abs(i_m - i_s).sum(-1)
    assert int(jnp.sum(diff > 1e-3)) > 50


def test_parser_instances_share_blas():
    """A >16-tri object instanced through the .pbrt API shares one BLAS; the
    base soup holds only non-instanced geometry."""
    from grail.scene.parser import parse_string

    quads = []
    for r in range(5):
        for c in range(5):
            quads.append(f"Shape \"trianglemesh\" \"integer indices\" "
                         f"[0 1 2 0 2 3] \"point P\" "
                         f"[{c} {r} 0  {c+1} {r} 0  {c+1} {r+1} 0  {c} {r+1} 0]")
    src = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Camera "perspective"
WorldBegin
LightSource "point" "rgb I" [1 1 1]
Shape "trianglemesh" "integer indices" [0 1 2] "point P" [0 0 -9 1 0 -9 0 1 -9]
ObjectBegin "grid"
%s
ObjectEnd
ObjectInstance "grid"
Translate 8 0 0
ObjectInstance "grid"
Translate 8 0 0
ObjectInstance "grid"
WorldEnd
""" % "\n".join(quads)
    scene, meta, _ = parse_string(src)
    assert scene["inst"] is not None
    assert scene["inst"]["root"].shape[0] == 3
    # 50 object tris stored once + 1 base tri; per-tri tables cover both
    assert scene["tri_idx"].shape[0] == 51
    assert meta.n_tris == 1                      # base soup
    assert int(scene["tri_light"][-1]) == -1     # instanced tris: no lights


def test_animated_shape_becomes_instance():
    """An animated CTM on a plain Shape routes through the single-instance
    TLAS path (object motion blur) instead of collapsing to shutter-open."""
    from grail.scene.parser import parse_string
    src = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Camera "perspective"
WorldBegin
LightSource "point" "rgb I" [1 1 1]
TransformBegin
ActiveTransform StartTime
Translate -2 0 -5
ActiveTransform EndTime
Translate 2 0 -5
ActiveTransform All
Shape "trianglemesh" "integer indices" [0 1 2] "point P" [0 0 0 1 0 0 0 1 0]
TransformEnd
WorldEnd
"""
    scene, meta, _ = parse_string(src)
    assert scene["inst"] is not None
    assert bool(scene["inst"]["anim"][0])


def test_instances_stream_blas_matches_jnp_walk():
    """The Pallas stream-kernel BLAS path (per-object record streams with
    per-stream object-root starts, interpret mode on CPU) must produce the
    same hits as the jnp traverse_tables walk — closest AND occlusion
    (round-5: instanced traversal routed through the stream kernel)."""
    import os
    v, i, n, uv = sphere(radius=0.5, nu=24, nv=12)
    b = _floor_builder(res=32)
    oid = b.add_object()
    b.add_object_mesh(oid, v, i, 0, normals=n, uvs=uv)
    for k in range(7):
        b.add_instance(oid, tr.translate((-2.4 + 0.8 * k, 0.5, -0.4 * k)))
    si, mi = b.finalize()
    assert "stream" in si["inst"], "per-object stream table should fit VMEM"

    cfg = IntegratorConfig(kind="path", max_depth=3)
    env = {"GRAIL_INST_STREAM": "force", "GRAIL_PALLAS_INTERPRET": "1"}
    old = {k: os.environ.get(k) for k in env}
    try:
        os.environ.update(env)
        img_s, _ = render(si, mi, cfg, spp=2)
    finally:
        for k, val in old.items():
            os.environ.pop(k, None)
            if val is not None:
                os.environ[k] = val
        os.environ["GRAIL_INST_STREAM"] = "0"
    try:
        # the flag is read at trace time; drop the cached executable so the
        # second render really traces the jnp-walk variant
        jax.clear_caches()
        img_j, _ = render(si, mi, cfg, spp=2)
    finally:
        os.environ.pop("GRAIL_INST_STREAM", None)
    a, bimg = np.asarray(img_s), np.asarray(img_j)
    assert a.mean() > 0.005
    np.testing.assert_allclose(a, bimg, atol=2e-5, rtol=1e-4)
