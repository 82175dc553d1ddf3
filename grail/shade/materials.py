"""Material table — pbrt src/materials/* compiled to a flat lobe-stack table.

Each material row holds up to K lobe slots: a lobe type tag, a Fresnel tag, three
spectrum-texture slots (s0 main weight, s1/s2 aux spectra like conductor eta/k or
FresnelBlend Rs) and three float-texture slots (f0/f1 roughnesses-or-sigma, f2 ior).
Texture slots are ids into the scene texture table; scalar conversions (roughness →
Blinn exponent, sigma degrees → radians) are tagged per slot and applied at gather.

The builder (scene/factories.py make_material) maps every pbrt-v2 material —
matte, plastic, glass, mirror, metal, shinymetal, substrate, uber, translucent,
mixmat — onto these stacks exactly as their GetBSDF methods compose BxDFs.
"""
from __future__ import annotations

import jax.numpy as jnp

# f0/f1 conversion tags
CONV_ID = 0
CONV_INV = 1        # exponent = 1/roughness (pbrt plastic.cpp etc.)
CONV_RADIANS = 2    # sigma degrees → radians (pbrt matte.cpp OrenNayar ctor)

MAT_FIELDS = ("lobe_type", "fr", "s0", "s1", "s2", "f0", "f1", "f2",
              "f0_conv", "f1_conv")


def gather_lobes(scene, sg, tex_values):
    """Materialize per-shade-point lobe stacks from the material table.

    sg: shading record with sg["mat"] (N,); tex_values: (NT, N, 3) from
    eval_textures. Returns the `lobes` dict consumed by shade/bsdf.py.
    """
    import jax

    mats = scene["materials"]
    mid = jnp.maximum(sg["mat"], 0)
    row = lambda key: mats[key][mid]                       # (N,K)
    lt = row("lobe_type")

    # Per-point texture pick as a one-hot contraction rather than a 2D
    # advanced-index gather: the (N,K)x(N,1) gather form sends XLA:TPU's
    # gather lowering down a pathologically slow compile path (minutes), while
    # the one-hot einsum compiles in seconds and rides the MXU. NT (number of
    # texture rows) is small, so the extra flops are negligible.
    nt = tex_values.shape[0]
    tvt = jnp.swapaxes(tex_values, 0, 1)                    # (N,NT,3)

    def spec_tex(key):
        ids = jnp.maximum(row(key), 0)                      # (N,K)
        oh = jax.nn.one_hot(ids, nt, dtype=jnp.float32)     # (N,K,NT)
        return jnp.einsum("nkt,ntc->nkc", oh, tvt, precision="highest")          # (N,K,3)

    def float_tex(key):
        ids = jnp.maximum(row(key), 0)
        oh = jax.nn.one_hot(ids, nt, dtype=jnp.float32)
        return jnp.einsum("nkt,nt->nk", oh, tvt[..., 0], precision="highest")    # (N,K)

    f0 = float_tex("f0")
    f1 = float_tex("f1")
    conv0 = row("f0_conv")
    conv1 = row("f1_conv")

    def convert(x, conv):
        inv = 1.0 / jnp.maximum(x, 1e-5)
        rad = x * (3.14159265 / 180.0)
        return jnp.where(conv == CONV_INV, inv,
                         jnp.where(conv == CONV_RADIANS, rad, x))

    return {
        "type": lt,
        "fr": row("fr"),
        "R": spec_tex("s0"),
        "S1": spec_tex("s1"),
        "S2": spec_tex("s2"),
        "f0": convert(f0, conv0),
        "f1": convert(f1, conv1),
        "f2": float_tex("f2"),
    }
