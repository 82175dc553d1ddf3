"""Benchmark: path-tracing rays/s on the available device.

Scenes: the Cornell box (BASELINE config 1/2; brute-force intersection), the
100k-triangle textured terrain + environment light (config 3; SAH BVH +
Pallas streaming traversal), and — unless BENCH_SKIP_1M=1 — the 1M-triangle
DOF+motion-blur scene (config 4; clustered stream tables). Prints ONE JSON
line {"metric", "value", "unit", "vs_baseline", ...extras} including
per-bounce occupancy and the coherent/incoherent traversal micro rows
(round-3 verdict item 9: perf signals recorded in artifacts). The reference
(pbrt-v2) publishes no numbers (BASELINE.md), so vs_baseline compares the
primary metric against the previous round's recording when present, else 1.0.
"""
import glob
import json
import os
import re
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def _bench_scene(make_scene, spp, max_depth):
    import jax
    from grail.engine.render import render, auto_spp_chunk
    from grail.engine.integrator import IntegratorConfig

    scene, meta, _ = make_scene()
    cfg = IntegratorConfig(kind="path", max_depth=max_depth)
    # compile + warmup: one chunk's worth of spp (same shapes as the timed run)
    chunk = auto_spp_chunk(meta, spp)
    _, film = render(scene, meta, cfg, spp=min(chunk, spp))
    jax.block_until_ready(film)
    t0 = time.perf_counter()
    _, film = render(scene, meta, cfg, spp=spp)
    jax.block_until_ready(film)
    dt = time.perf_counter() - t0
    return meta.xres * meta.yres * spp / dt


def _retry(fn, attempts=3, wait=90):
    """The experimental axon TPU tunnel intermittently faults
    (FailedPrecondition/InvalidArgument) and recovers after a pause; retry so
    one transient fault doesn't lose the whole recording."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:      # noqa: BLE001
            last = e
            if i + 1 < attempts:
                time.sleep(wait)
    raise last


def _previous_value():
    """Most recent BENCH_r*.json primary value (handles r1 and r01 naming)."""
    best = None
    best_n = -1
    for p in glob.glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        if not m:
            continue
        n = int(m.group(1))
        if n > best_n:
            try:
                with open(p) as f:
                    j = json.load(f)
                # driver rounds wrap the line under "parsed"
                v = j.get("value") or j.get("parsed", {}).get("value")
                if v:
                    best, best_n = v, n
            except Exception:
                pass
    return best


def _traversal_micro(n=1 << 20):
    """Coherent vs incoherent closest-hit rows on the 100k terrain (the
    round-3 'bench it honestly' criterion — both coherence regimes recorded)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from grail.scene.presets import mesh_scene
    from grail.kernels.intersect import _stream_bvh

    scene, _, _ = mesh_scene(xres=64, yres=64, spp=1, grid=224)
    verts = np.asarray(scene["verts"])
    bmin, bmax = verts.min(0), verts.max(0)
    rng = np.random.RandomState(1)
    o_i = jnp.asarray((rng.rand(n, 3) * (bmax - bmin) * 1.2
                       + bmin - 0.1 * (bmax - bmin)).astype(np.float32))
    d_np = rng.randn(n, 3).astype(np.float32)
    d_i = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True))
    res = int(np.sqrt(n))
    xs, ys = np.meshgrid(np.linspace(bmin[0], bmax[0], res),
                         np.linspace(bmin[2], bmax[2], res))
    tgt = np.stack([xs.ravel(), np.zeros(res * res), ys.ravel()], -1)
    o_c = np.tile(np.array([0, bmax[1] + 6.0, 0], np.float32), (res * res, 1))
    d_c = tgt - o_c
    d_c = jnp.asarray((d_c / np.linalg.norm(d_c, axis=1, keepdims=True)
                       ).astype(np.float32))
    o_c = jnp.asarray(o_c)
    tmin = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e7, jnp.float32)
    out = {}
    for name, o, d, sort in (("coherent", o_c, d_c, False),
                             ("incoherent", o_i, d_i, True)):
        # iterations chain through a data dependency (o depends on the
        # previous hit) so the experimental async dispatch cannot slip any
        # launch past the timer
        f = jax.jit(lambda o, d, s=sort: _stream_bvh(scene, o, d, tmax, tmin,
                                                     sort=s))
        r = jax.block_until_ready(f(o, d))
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            o = o + 0.0 * r["t"][:, None]
            r = f(o, d)
        jax.block_until_ready(r)
        out[f"bvh_{name}_mrays_per_sec"] = round(
            n * iters / (time.perf_counter() - t0) / 1e6, 2)
    return out


def main():
    from grail.scene.presets import cornell_box, mesh_scene, mesh_scene_1m
    from grail.engine.render import occupancy_probe
    from grail.engine.integrator import IntegratorConfig

    xres = yres = int(os.environ.get("BENCH_RES", "256"))
    spp = int(os.environ.get("BENCH_SPP", "16"))
    max_depth = int(os.environ.get("BENCH_DEPTH", "5"))

    cornell_rps = _retry(lambda: _bench_scene(
        lambda: cornell_box(xres=xres, yres=yres, spp=spp), spp, max_depth))
    mesh_rps = _retry(lambda: _bench_scene(
        lambda: mesh_scene(xres=xres, yres=yres, spp=spp), spp, max_depth))

    extras = {}
    try:
        extras.update(_retry(_traversal_micro))
    except Exception as e:      # noqa: BLE001 — bench must still print
        extras["micro_error"] = str(e)[:200]
    try:
        scene_m, meta_m, _ = mesh_scene(xres=128, yres=128, spp=1)
        occ = occupancy_probe(scene_m, meta_m,
                              IntegratorConfig(kind="path",
                                               max_depth=max_depth))
        extras["mesh_occupancy_per_bounce"] = occ
    except Exception as e:      # noqa: BLE001
        extras["occupancy_error"] = str(e)[:200]
    if os.environ.get("BENCH_SKIP_1M", "0") != "1":
        try:
            extras["mesh1m_rays_per_sec"] = round(_retry(
                lambda: _bench_scene(
                    lambda: mesh_scene_1m(xres=xres, yres=yres, spp=4), 4,
                    max_depth)), 1)
        except Exception as e:  # noqa: BLE001
            extras["mesh1m_error"] = str(e)[:200]

    prev = _previous_value()
    vs = cornell_rps / prev if prev else 1.0
    print(json.dumps({
        "metric": "camera_rays_per_sec_path_cornell",
        "value": round(cornell_rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
        "mesh100k_rays_per_sec": round(mesh_rps, 1),
        **extras,
    }))


if __name__ == "__main__":
    main()
