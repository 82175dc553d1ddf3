"""bsdftest — pbrt src/tools/bsdftest.cpp: numerically validate BSDF sampling by
estimating hemispherical reflectance rho two ways per lobe type — importance
sampling via Sample_f and uniform hemisphere sampling of f — and printing both.
The estimates converge to the same value iff sample and pdf agree.

Usage: python -m grail.tools.bsdftest [n_samples]
"""
from __future__ import annotations

import sys

import numpy as np


def run(n=16384):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ..shade import bsdf as bx
    from ..core import rng
    from ..core import montecarlo as mc
    from ..core.vecmath import PI

    wo = jnp.asarray([0.3, -0.25, 0.92])
    wo = wo / jnp.linalg.norm(wo)

    cases = [
        ("Lambertian(0.7)", bx.LAMBERT, dict(R=(0.7,) * 3)),
        ("OrenNayar(0.7, sigma=20deg)", bx.OREN_NAYAR,
         dict(R=(0.7,) * 3, f0=0.35)),
        ("Blinn(0.8, e=4)", bx.BLINN, dict(R=(0.8,) * 3, f0=4.0)),
        ("Blinn(0.8, e=50)", bx.BLINN, dict(R=(0.8,) * 3, f0=50.0)),
        ("Aniso(0.8, 10/100)", bx.ANISO, dict(R=(0.8,) * 3, f0=10.0, f1=100.0)),
        ("FresnelBlend(.5/.08, e=30)", bx.FRESNEL_BLEND,
         dict(R=(0.5,) * 3, S1=(0.08,) * 3, f0=30.0, f1=30.0)),
    ]

    cfg = rng.SamplerConfig(kind=rng.RANDOM)
    pix = jnp.zeros(n, jnp.uint32)
    samp = jnp.arange(n, dtype=jnp.uint32)
    ok = True
    for name, ltype, kw in cases:
        ones = jnp.ones((n, 1))
        lobes = {
            "type": jnp.full((n, 1), ltype, jnp.int32),
            "fr": jnp.full((n, 1), kw.get("fr", bx.FR_NOOP), jnp.int32),
            "R": jnp.asarray(kw.get("R", (1.0,) * 3)) * jnp.ones((n, 1, 3)),
            "S1": jnp.asarray(kw.get("S1", (0.5,) * 3)) * jnp.ones((n, 1, 3)),
            "S2": jnp.asarray(kw.get("S2", (1.0,) * 3)) * jnp.ones((n, 1, 3)),
            "f0": kw.get("f0", 1.0) * ones,
            "f1": kw.get("f1", 1.0) * ones,
            "f2": kw.get("f2", 1.5) * ones,
        }
        present = (ltype,)
        wo_b = jnp.broadcast_to(wo, (n, 3))
        u1 = rng.sample_1d(cfg, pix, samp, 0)
        u2 = rng.sample_1d(cfg, pix, samp, 1)
        uc = rng.sample_1d(cfg, pix, samp, 2)
        out = bx.bsdf_sample(lobes, wo_b, u1, u2, uc, present)
        imp = out["f"] * (jnp.abs(out["wi"][:, 2])
                          / jnp.maximum(out["pdf"], 1e-9))[:, None]
        imp = jnp.where((out["valid"] & (out["pdf"] > 0))[:, None], imp, 0.0)
        rho_imp = float(imp.mean(axis=0)[0])
        wi_u = mc.uniform_sample_hemisphere(
            rng.sample_1d(cfg, pix, samp, 3), rng.sample_1d(cfg, pix, samp, 4))
        f = bx.bsdf_f(lobes, wo_b, wi_u, present)
        rho_uni = float((f * (wi_u[:, 2:3] * 2 * PI)).mean(axis=0)[0])
        rel = abs(rho_imp - rho_uni) / max(rho_uni, 1e-9)
        status = "OK " if rel < 0.1 else "FAIL"
        ok = ok and rel < 0.1
        print(f"{status} {name:32s} rho(Sample_f)={rho_imp:.4f} "
              f"rho(uniform)={rho_uni:.4f} rel={rel:.3f}")
    return 0 if ok else 1


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    n = int(argv[0]) if argv else 16384
    return run(n)


if __name__ == "__main__":
    sys.exit(main())
