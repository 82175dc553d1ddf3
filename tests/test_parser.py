"""Parser + API + factory tests (pbrt scene-description compatibility)."""
import logging

import numpy as np
import jax.numpy as jnp
import pytest

from grail.scene.parser import parse_string, tokenize
from grail.scene.paramset import ParamSet
from grail.shade import bsdf as bx
from grail.shade import lights as lt


MINI = """
LookAt 0 0 5  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [32] "integer yresolution" [24]
Sampler "lowdiscrepancy" "integer pixelsamples" [4]
SurfaceIntegrator "path" "integer maxdepth" [3]
WorldBegin
LightSource "point" "rgb I" [10 10 10] "point from" [0 3 0]
Material "plastic" "rgb Kd" [0.4 0.2 0.1] "float roughness" [0.2]
Shape "trianglemesh" "integer indices" [0 1 2]
  "point P" [-1 0 0  1 0 0  0 1 0]
AttributeBegin
  Material "glass"
  Shape "sphere" "float radius" [0.5]
AttributeEnd
WorldEnd
"""


def test_tokenizer():
    toks = list(tokenize('Shape "sphere" "float radius" [0.5] # comment\nRotate 45 0 1 0'))
    kinds = [t[0] for t in toks]
    assert kinds == ["id", "str", "str", "bracket", "num", "bracket",
                     "id", "num", "num", "num", "num"]


def test_paramset_types_and_unused(caplog):
    ps = ParamSet([("float fov", [30.0]), ("rgb Kd", [1, 0, 0]),
                   ("integer n", [4]), ("string name", ["x"]),
                   ("point P", [0, 0, 0, 1, 1, 1]),
                   ("blackbody L", [6500, 1.0])])
    assert ps.find_one_float("fov", 90) == 30.0
    assert ps.find_one_int("n", 0) == 4
    np.testing.assert_allclose(ps.find_one_rgb("Kd", (0, 0, 0)), [1, 0, 0])
    assert ps.find_points("P").shape == (2, 3)
    bb = ps.find_one_rgb("L", (0, 0, 0))
    assert bb.min() > 0.5  # blackbody 6500K ≈ white
    with caplog.at_level(logging.WARNING, logger="grail"):
        ps.report_unused("test")
    assert "name" in caplog.text  # 'name' and 'fov'... fov was used
    assert "fov" not in caplog.text


def test_parse_mini_scene():
    scene, meta, api = parse_string(MINI)
    assert meta.xres == 32 and meta.yres == 24
    assert meta.sampler.spp == 4
    assert api.integrator_config.kind == "path"
    assert api.integrator_config.max_depth == 3
    assert meta.n_lights == 1
    assert lt.POINT in meta.light_types
    # plastic = LAMBERT + BLINN; glass = SPEC_REFL + SPEC_TRANS
    assert set(meta.lobe_types) >= {bx.LAMBERT, bx.BLINN, bx.SPEC_REFL,
                                    bx.SPEC_TRANS}
    # 1 triangle + tessellated sphere
    assert meta.n_tris > 1000


def test_parse_textures_and_named_materials():
    scene, meta, api = parse_string("""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Camera "perspective"
WorldBegin
LightSource "distant" "rgb L" [1 1 1]
Texture "checks" "spectrum" "checkerboard"
  "float uscale" [4] "float vscale" [4]
  "rgb tex1" [1 0 0] "rgb tex2" [0 0 1]
MakeNamedMaterial "redplastic" "string type" "plastic" "rgb Kd" [1 0 0]
NamedMaterial "redplastic"
Shape "disk" "float radius" [1]
Material "matte" "texture Kd" "checks"
Shape "trianglemesh" "integer indices" [0 1 2] "point P" [0 0 0 1 0 0 0 1 0]
WorldEnd
""")
    kinds = [s.kind for s in meta.tex_specs]
    assert "checkerboard" in kinds
    assert meta.n_tris > 100


def test_parse_instances_and_transforms():
    scene, meta, api = parse_string("""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Camera "perspective"
WorldBegin
LightSource "point" "rgb I" [1 1 1]
ObjectBegin "tri"
  Shape "trianglemesh" "integer indices" [0 1 2] "point P" [0 0 0 1 0 0 0 1 0]
ObjectEnd
ObjectInstance "tri"
Translate 2 0 0
ObjectInstance "tri"
WorldEnd
""")
    assert meta.n_tris == 2
    v = np.asarray(scene["verts"])
    # second instance translated by +2 in x
    assert abs(v[3:, 0].min() - 2.0) < 1e-5


def test_parse_include(tmp_path):
    inc = tmp_path / "geo.pbrt"
    inc.write_text('Shape "trianglemesh" "integer indices" [0 1 2] '
                   '"point P" [0 0 0 1 0 0 0 1 0]\n')
    main = tmp_path / "main.pbrt"
    main.write_text(f"""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Camera "perspective"
WorldBegin
LightSource "point" "rgb I" [1 1 1]
Include "geo.pbrt"
WorldEnd
""")
    from grail.scene.parser import parse_file
    scene, meta, api = parse_file(str(main))
    assert meta.n_tris == 1


def test_quadrics_tessellate():
    from grail.scene import shapes as shp
    for fn, kw in [(shp.sphere, {}), (shp.cylinder, {}), (shp.disk, {}),
                   (shp.cone, {}), (shp.paraboloid, {}),
                   (shp.hyperboloid, {})]:
        v, i, n, uv = fn(**kw)
        assert len(v) > 0 and len(i) > 0
        assert np.isfinite(v).all()
        assert i.max() < len(v)


def test_loop_subdivision_tetra():
    from grail.scene.shapes import loop_subdivide
    verts = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]])
    v, f, n, _ = loop_subdivide(verts, faces, 3)
    assert len(f) == 4 * 4 ** 3
    # closed surface subdividing a tetra converges toward a rounded blob
    r = np.linalg.norm(v, axis=1)
    assert r.max() < np.sqrt(3) and r.min() > 0.2
    assert np.isfinite(n).all()


def test_render_parsed_scene_smoke():
    from grail.engine.render import render
    scene, meta, api = parse_string(MINI)
    img, _ = render(scene, meta, api.integrator_config, spp=2)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.max() > 0
