"""Sweep ray-binning key resolution vs streaming-BVH traversal time.

Answers: how fine must the (octant | origin Morton | direction Morton) key be
before incoherent rays traverse at near-coherent speed, and what does each
reorder scheme cost? Rows are traversal-only (reorder included) on the 100k
terrain at 1M rays for three coherence regimes.

Usage: python benchmarks/binsweep.py [n_rays_log2] [--json out.json]
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


def timeit(name, fn, *args, iters=4, n_rays=None):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rate = f"  {n_rays / dt / 1e6:8.2f} Mrays/s" if n_rays else ""
    print(f"{name:40s} {dt * 1e3:9.2f} ms{rate}   (compile {compile_s:.1f}s)")
    RESULTS[name] = {"ms": dt * 1e3,
                     "mrays_per_s": (n_rays / dt / 1e6) if n_rays else None}
    return dt


def radix_order(key, bits_list):
    """Stable LSB-first radix sort; returns gather list `order`."""
    from grail.kernels.binning import bucket_rank
    n = key.shape[0]
    order = jnp.arange(n, dtype=jnp.int32)
    shift = 0
    for b in bits_list:
        sub = (key[order] >> shift) & ((1 << b) - 1)
        r = bucket_rank(sub, 1 << b)
        order = jnp.zeros_like(order).at[r].set(order, unique_indices=True)
        shift += b
    return order


def make_key(o, d, bmin, bmax, ob, db):
    from grail.kernels.binning import _morton3_bits
    tn = (o - bmin) / jnp.maximum(bmax - bmin, 1e-9)
    octant = (((d[:, 0] >= 0).astype(jnp.int32) << 2)
              | ((d[:, 1] >= 0).astype(jnp.int32) << 1)
              | (d[:, 2] >= 0).astype(jnp.int32))
    key = octant
    if ob:
        key = (key << (3 * ob)) | _morton3_bits(tn, ob)
    if db:
        key = (key << (3 * db)) | _morton3_bits(d * 0.5 + 0.5, db)
    return key


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << n_log2
    print(f"backend={jax.default_backend()} n_rays={n}")
    from grail.scene.presets import mesh_scene
    from grail.kernels.bvh_stream import bvh_stream_intersect
    from grail.kernels.pallas_intersect import pack_tris

    scene, _, _ = mesh_scene(xres=64, yres=64, spp=1, grid=224)
    table = scene["bvh"]["stream"]
    tris9 = pack_tris(scene)
    bmin = jnp.min(scene["verts"], axis=0)
    bmax = jnp.max(scene["verts"], axis=0)

    rng = np.random.RandomState(1)
    bmin_np, bmax_np = np.asarray(bmin), np.asarray(bmax)

    res = int(np.sqrt(n))
    xs, ys = np.meshgrid(np.linspace(bmin_np[0], bmax_np[0], res),
                         np.linspace(bmin_np[2], bmax_np[2], res))
    from grail.engine.film import lane_pixel
    lane = np.arange(res * res)
    px_t, py_t = lane_pixel(jnp.asarray(lane), res)
    sel = np.asarray(py_t).astype(np.int64) * res + np.asarray(px_t)
    tgt = np.stack([xs.ravel()[sel], np.zeros(res * res), ys.ravel()[sel]],
                   -1)
    o_c = np.tile(np.array([0, bmax_np[1] + 6.0, 0], np.float32),
                  (res * res, 1))
    d_c = tgt - o_c
    d_c /= np.linalg.norm(d_c, axis=1, keepdims=True)
    o_i = (rng.rand(n, 3) * (bmax_np - bmin_np) * 1.2
           + bmin_np - 0.1 * (bmax_np - bmin_np)).astype(np.float32)
    d_i = rng.randn(n, 3).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    o_s = tgt.astype(np.float32) + np.array([0, 0.5, 0], np.float32)
    d_s = d_i[:res * res]

    tmin = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 1e7, jnp.float32)

    def run_sorted(order_fn):
        def f(o, d):
            order = order_fn(o, d)
            rank = jnp.zeros_like(order).at[order].set(
                jnp.arange(n, dtype=jnp.int32), unique_indices=True)
            t, prim, b1, b2 = bvh_stream_intersect(
                table, tris9, o[order], d[order], tmin, tmax)
            return t[rank], prim[rank]
        return jax.jit(f)

    raw = jax.jit(lambda o, d: bvh_stream_intersect(table, tris9, o, d,
                                                    tmin, tmax)[:2])

    variants = [
        ("raw", None),
        ("k64 oct+o1", lambda o, d: radix_order(make_key(o, d, bmin, bmax,
                                                         1, 0), [6])),
        ("k512 oct+o1+d1", lambda o, d: radix_order(
            make_key(o, d, bmin, bmax, 1, 1), [6, 3])),
        ("k4096 oct+o2+d1", lambda o, d: radix_order(
            make_key(o, d, bmin, bmax, 2, 1), [6, 6])),
        ("k32k oct+o2+d2", lambda o, d: radix_order(
            make_key(o, d, bmin, bmax, 2, 2), [6, 6, 3])),
        ("k2^21 oct+o3+d3 argsort", lambda o, d: jnp.argsort(
            make_key(o, d, bmin, bmax, 3, 3))),
    ]
    regimes = [("coh", o_c, d_c), ("semi", o_s, d_s), ("inc", o_i, d_i)]
    to_j = lambda a: jnp.asarray(a.astype(np.float32))
    for rname, o, d in regimes:
        oj, dj = to_j(o), to_j(d)
        for vname, ofn in variants:
            fn = raw if ofn is None else run_sorted(ofn)
            timeit(f"{rname:5s} {vname}", fn, oj, dj, n_rays=n)

    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as f:
            json.dump({"backend": jax.default_backend(), "n_rays": n,
                       "stages": RESULTS}, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
