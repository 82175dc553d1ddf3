"""MIPMap (mipmap.h) tests: pyramid energy conservation, trilinear level
selection, EWA finiteness + anisotropy, and the imagemap integration path."""
import numpy as np
import jax.numpy as jnp

from grail.shade.mipmap import (build_pyramid, pack_pyramid,
                                lookup_trilinear, lookup_ewa)


def _stripes():
    img = np.zeros((64, 64, 3), np.float32)
    img[::2, :, :] = 1.0
    return img


def test_pyramid_shapes_and_mean():
    levels = build_pyramid(_stripes())
    assert levels[0].shape == (64, 64, 3)
    assert levels[-1].shape == (1, 1, 3)
    # every level preserves the mean (box downsample)
    for l in levels:
        np.testing.assert_allclose(l.mean(), 0.5, atol=1e-5)


def test_pyramid_pow2_resample():
    img = np.random.default_rng(0).random((37, 50, 3)).astype(np.float32)
    levels = build_pyramid(img)
    assert levels[0].shape == (64, 64, 3)
    # Lanczos resample preserves the mean to ~1%
    np.testing.assert_allclose(levels[0].mean(), img.mean(), rtol=0.02)


def test_trilinear_width_selects_level():
    levels = pack_pyramid(build_pyramid(_stripes()))
    s = jnp.asarray([0.25])
    t = jnp.asarray([15.5 / 64])   # texel-center row 15 (a dark stripe)
    fine = np.asarray(lookup_trilinear(levels, s, t, jnp.asarray([1 / 64])))
    coarse = np.asarray(lookup_trilinear(levels, s, t, jnp.asarray([1.0])))
    # wide filter averages the stripes to 0.5; narrow filter resolves them
    assert abs(coarse[0, 0] - 0.5) < 1e-3
    assert abs(fine[0, 0] - 0.5) > 0.2


def test_ewa_finite_and_anisotropic():
    levels = pack_pyramid(build_pyramid(_stripes()))
    s = jnp.asarray([0.25, 0.7])
    t = jnp.asarray([0.25, 0.7])
    z = jnp.zeros_like(s)
    wide = jnp.full_like(s, 0.4)
    narrow = jnp.full_like(s, 1 / 64)
    # footprint wide along t (across stripes) → averaged to ~0.5
    v_across = np.asarray(lookup_ewa(levels, s, t, z, wide, narrow, z))
    assert np.isfinite(v_across).all()
    assert np.abs(v_across[:, 0] - 0.5).max() < 0.1


def test_imagemap_scene_filters(tmp_path):
    import jax
    from grail.engine.imageio import write_image
    from grail.scene.parser import parse_string
    from grail.engine.render import render
    checker = (np.indices((32, 32)).sum(0) % 2).astype(np.float32)
    path = str(tmp_path / "c.pfm")
    write_image(path, np.repeat(checker[:, :, None], 3, 2))
    scene_txt = f'''
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "lowdiscrepancy" "integer pixelsamples" [1]
SurfaceIntegrator "directlighting"
LookAt 0 1.2 3  0 0 -3  0 1 0
Camera "perspective" "float fov" [50]
WorldBegin
  LightSource "point" "point from" [0 5 0] "rgb I" [60 60 60]
  Texture "tex" "spectrum" "imagemap" "string filename" ["{path}"]
  Material "matte" "texture Kd" ["tex"]
  Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point P" [-8 0 -30  8 0 -30  8 0 3  -8 0 3]
    "float uv" [0 0  16 0  16 66  0 66]
WorldEnd
'''
    scene, meta, api = parse_string(scene_txt)
    assert len(scene["mipmaps"]) == 1
    img, _ = render(scene, meta, api.integrator_config, spp=1)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.max() > 0
