"""Inverse-rendering demo — the differentiable-rendering counterpart the
reference cannot do (pbrt-v2 is forward-only; this is the BASELINE's
differentiability requirement exercised end-to-end).

Recovers scene parameters from a target image by gradient descent through the
full path-traced render: the render wave is jitted once, and every step
re-renders + backprops through intersect (custom-VJP BVH), shading, MIS direct
lighting and the film. Defaults recover the Cornell wall albedos from a
rendering made with the true values.

Usage:
    python -m grail.tools.optimize [--steps N] [--lr LR] [--res R] [--spp S]
"""
from __future__ import annotations

import argparse

import numpy as np


def optimize_albedo(scene, meta, cfg, target, steps=60, lr=0.05, spp=None,
                    param_rows=None, verbose=False):
    """Gradient-descent recovery of texture-table albedos from `target`.

    target (H,W,3): image rendered with the true tex_data["const"] values.
    param_rows: optional row indices to optimize (default: every texture row).
    Returns (optimized_const, losses)."""
    import jax
    import jax.numpy as jnp
    import optax
    from ..engine.render import render_wave
    from ..engine import film as flm

    spp = spp if spp is not None else meta.sampler.spp
    target = jnp.asarray(target)
    init = scene["tex_data"]["const"]
    mask = jnp.zeros((init.shape[0], 1), jnp.float32)
    rows = range(init.shape[0]) if param_rows is None else param_rows
    for r in rows:
        mask = mask.at[r, 0].set(1.0)

    @jax.jit
    def loss_fn(const):
        s = dict(scene)
        s["tex_data"] = dict(scene["tex_data"])
        s["tex_data"]["const"] = const
        f = flm.new_film(meta.xres, meta.yres)
        for w in range(spp):
            f = render_wave(s, meta, cfg, f, jnp.uint32(w))
        img = flm.develop(f)
        return jnp.mean((img - target) ** 2)

    opt = optax.adam(lr)
    params = init * 0.0 + 0.5 * mask + init * (1.0 - mask)  # grey start
    state = opt.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    losses = []
    for it in range(steps):
        loss, g = grad_fn(params)
        g = g * mask                      # only optimize the requested rows
        updates, state = opt.update(g, state)
        params = optax.apply_updates(params, updates)
        params = jnp.clip(params, 0.0, 1.0)
        losses.append(float(loss))
        if verbose and (it % 10 == 0 or it == steps - 1):
            print(f"step {it:3d}  loss {float(loss):.6f}")
    return params, losses


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ..scene.presets import cornell_box
    from ..engine.render import render
    from ..engine.integrator import IntegratorConfig

    scene, meta, _ = cornell_box(xres=args.res, yres=args.res, spp=args.spp)
    cfg = IntegratorConfig(kind="direct", max_depth=1)
    target, _ = render(scene, meta, cfg, spp=args.spp)
    true_const = np.asarray(scene["tex_data"]["const"])

    rec, losses = optimize_albedo(scene, meta, cfg, target, steps=args.steps,
                                  lr=args.lr, spp=args.spp, verbose=True)
    rec = np.asarray(rec)
    err0 = np.abs(true_const - 0.5).mean()
    err1 = np.abs(true_const - rec).mean()
    print(f"albedo error: init {err0:.4f} -> recovered {err1:.4f} "
          f"(loss {losses[0]:.5f} -> {losses[-1]:.5f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
