"""Stream-kernel variant sweep: ordered-stack vs stackless-skip traversal,
masked vs roll field extraction, across coherence regimes and traversal
kinds, on the 100k-tri terrain (BASELINE config 3 geometry).

The round-4 step-cost decomposition (~790 ns/step = ~250 extraction + ~200
scalar stack + ~350 payload) motivates both variants; this sweep is the
measurement that picks production defaults (bvh_stream.CLOSEST_KERNEL /
ANYHIT_KERNEL / GRAIL_STREAM_EXTRACT).

Usage: python benchmarks/streamvariants.py [--json out.json]
(re-execs itself once per extraction mode; the flag is read at import).
"""
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n=1 << 20):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from grail.scene.presets import mesh_scene
    from grail.kernels.bvh_stream import _run
    from grail.kernels.binning import (bin_rays_key, bucket_rank,
                                       sort_by_rank, N_RAY_BUCKETS)

    scene, _, _ = mesh_scene(xres=64, yres=64, spp=1, grid=224)
    table = scene["bvh"]["stream"]
    verts = np.asarray(scene["verts"])
    bmin, bmax = verts.min(0), verts.max(0)
    rng = np.random.RandomState(1)

    # coherent: camera-style top-down grid
    res = int(np.sqrt(n))
    xs, ys = np.meshgrid(np.linspace(bmin[0], bmax[0], res),
                         np.linspace(bmin[2], bmax[2], res))
    tgt = np.stack([xs.ravel(), np.zeros(res * res), ys.ravel()], -1)
    o_c = np.tile(np.array([0, bmax[1] + 6.0, 0], np.float32), (res * res, 1))
    d_c = tgt - o_c
    d_c = (d_c / np.linalg.norm(d_c, axis=1, keepdims=True)).astype(np.float32)
    # incoherent: random origins in-bounds, random directions
    o_i = (rng.rand(n, 3) * (bmax - bmin) * 1.2
           + bmin - 0.1 * (bmax - bmin)).astype(np.float32)
    d_i = rng.randn(n, 3).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    # shadow-style: origins on the terrain surface (camera hits), directions
    # to a random point high above (finite segments, mostly unoccluded) and
    # to random hemisphere dirs (env-style, some occluded)
    tmin = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e7, jnp.float32)

    def run_sorted(o, d, kind, any_hit, sort):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        if not sort:
            return jax.jit(lambda o, d: _run(
                table, o, d, tmin, tmax, any_hit=any_hit, kind=kind),
                static_argnames=())(o, d)

        def f(o, d):
            key = bin_rays_key(o, d, jnp.asarray(bmin), jnp.asarray(bmax))
            rank = bucket_rank(key, N_RAY_BUCKETS + 1)
            o_s, d_s = sort_by_rank(rank, o, d)
            outs = _run(table, o_s, d_s, tmin, tmax, any_hit=any_hit,
                        kind=kind)
            return tuple(x[rank] for x in outs)
        return jax.jit(f)(o, d)

    out = {}
    for name, o, d, sort in (("coherent", o_c, d_c, False),
                             ("incoherent", o_i, d_i, True)):
        for kind in ("ordered", "skip"):
            for any_hit in (False, True):
                label = (f"{name}_{kind}"
                         f"{'_anyhit' if any_hit else ''}")
                f = jax.jit(lambda o, d, k=kind, ah=any_hit, s=sort:
                            run_sorted(o, d, k, ah, s))
                oj, dj = jnp.asarray(o), jnp.asarray(d)
                r = jax.block_until_ready(f(oj, dj))
                t0 = time.perf_counter()
                iters = 3
                for _ in range(iters):
                    oj = oj + 0.0 * r[0].reshape(-1, 1)[:n]
                    r = f(oj, dj)
                jax.block_until_ready(r)
                out[label] = round(
                    n * iters / (time.perf_counter() - t0) / 1e6, 2)
    return out


def main():
    if "--inner" in sys.argv:
        print(json.dumps(measure()))
        return
    results = {}
    for mode in ("masked", "roll"):
        env = dict(os.environ, GRAIL_STREAM_EXTRACT=mode)
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--inner"], capture_output=True, text=True,
                           env=env, timeout=1800)
        for line in reversed(p.stdout.strip().splitlines()):
            if line.startswith("{"):
                results[mode] = json.loads(line)
                break
        else:
            results[mode] = {"error": (p.stderr or "")[-300:]}
    for mode, rows in results.items():
        print(f"--- extract={mode}")
        if "error" in rows:
            print("   ", rows["error"])
            continue
        for k, v in rows.items():
            print(f"  {k:32s} {v:8.2f} Mrays/s")
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", out)


if __name__ == "__main__":
    main()
