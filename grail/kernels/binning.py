"""Ray binning: cheap stable counting sort for traversal coherence.

The streaming BVH kernel (bvh_stream.py) amortizes one record stream over a
128-ray sub-packet, so its cost scales with the per-packet *union* working
set: incoherent rays (secondary bounces, shadow/MIS rays) make every packet
walk most of the tree — measured 30x slower than coherent camera tiles.
pbrt's per-thread traversal (src/accelerators/bvh.cpp Intersect ~L520) is
coherence-independent; the TPU equivalent is to restore packet coherence by
re-binning rays before every traversal.

A full 1M-key argsort costs ~140 ms on this chip (XLA sort) — more than the
traversal it saves. A stable counting sort into K<=128 buckets is ~50x
cheaper. Two interchangeable rank kernels:

* `bucket_rank_scan`: one (N,K) one-hot cumsum — bandwidth-bound.
* `bucket_rank_mm`:   chunked triangular-matmul prefix counts on the MXU —
  O(N*c*K) flops but matmul-shaped; exact in bf16 for chunk<=256.

`bucket_rank` picks the measured-faster one. Rays then *scatter* into sorted
order via `.at[rank].set(..., unique_indices=True)` (rank is a permutation)
and results *gather* back via `x_sorted[rank]` — no inverse permutation or
argsort anywhere. Dead lanes (tmax<=tmin) sort into a trailing bucket, so
masked-off wavefront lanes also compact out of live sub-packets for free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 256   # triangular-matmul chunk; bf16-exact prefix counts need <=256


def bucket_rank_scan(key, n_buckets):
    """Stable counting-sort slot per lane via one-hot cumsum. key int32 in
    [0, n_buckets). Returns rank (N,) int32 — a permutation."""
    oh = (key[:, None] == jnp.arange(n_buckets, dtype=key.dtype)[None, :])
    csum = jnp.cumsum(oh.astype(jnp.int32), axis=0)           # (N,K) inclusive
    within = jnp.sum(jnp.where(oh, csum, 0), axis=1) - 1      # rank in bucket
    hist = csum[-1]
    offs = jnp.cumsum(hist) - hist                            # exclusive
    return offs[key] + within


def bucket_rank_mm(key, n_buckets):
    """Stable counting-sort slot per lane; prefix counts via chunked
    lower-triangular matmuls (MXU) + a short cross-chunk scan."""
    n = key.shape[0]
    c = _CHUNK
    pad = -n % c
    if pad:
        # padded lanes get bucket n_buckets-1; they come after all real lanes
        # of that bucket (stable order) so real ranks are unaffected
        key = jnp.concatenate(
            [key, jnp.full((pad,), n_buckets - 1, key.dtype)])
    C = key.shape[0] // c
    kc = key.reshape(C, c)
    oh = (kc[..., None] == jnp.arange(n_buckets, dtype=key.dtype)
          ).astype(jnp.bfloat16)                              # (C,c,K)
    tril = jnp.tril(jnp.ones((c, c), jnp.bfloat16), -1)
    # within-chunk exclusive prefix count of each lane's own bucket
    prefix = jax.lax.dot_general(
        tril, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (c?,C?,K)
    prefix = jnp.transpose(prefix, (1, 0, 2))                 # (C,c,K)
    within = jnp.sum(jnp.where(oh > 0, prefix, 0.0), axis=-1).astype(jnp.int32)
    tot = jnp.sum(oh.astype(jnp.float32), axis=1).astype(jnp.int32)  # (C,K)
    cum = jnp.cumsum(tot, axis=0) - tot                       # before-chunk
    hist = jnp.sum(tot, axis=0)                               # (K,)
    offs = jnp.cumsum(hist) - hist
    chunk_idx = jax.lax.broadcasted_iota(jnp.int32, (C, c), 0).reshape(-1)
    before = cum.reshape(-1)[chunk_idx * n_buckets + key]     # flat 1-D gather
    rank = offs[key] + before + within.reshape(-1)
    return rank[:n]


def bucket_rank(key, n_buckets):
    return bucket_rank_mm(key, n_buckets)


def sort_by_rank(rank, *arrays):
    """Scatter each array into bucket-sorted order (rank is a permutation)."""
    out = []
    for a in arrays:
        z = jnp.zeros_like(a)
        out.append(z.at[rank].set(a, unique_indices=True))
    return tuple(out)


def unsort(rank, *arrays):
    """Gather sorted-order results back to original lane order."""
    return tuple(a[rank] for a in arrays)


def _morton3_bits(x, bits):
    """Interleave `bits` bits per axis of points in [0,1)^3."""
    q = jnp.clip(x * (1 << bits), 0.0, (1 << bits) - 1).astype(jnp.uint32)

    def spread(v):
        out = jnp.zeros_like(v)
        for i in range(bits):
            out = out | (((v >> i) & 1) << (3 * i))
        return out
    return ((spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1)
            | spread(q[:, 2])).astype(jnp.int32)


def bin_rays_key(o, d, bmin, bmax, origin_bits=1, dir_bits=0):
    """Coherence key: [octant:3 | origin Morton:3*origin_bits |
    direction Morton:3*dir_bits]. Defaults give a 6-bit key (64 buckets —
    the rank kernels are O(N*K), so keep K small). Octant is the high field:
    sub-packets sharing an octant traverse near-child-first in the same order
    (pbrt dirIsNeg). The sort is STABLE, so rays that are already coherent
    (e.g. camera waves in 8x16 pixel-tile order) keep their order within a
    bucket — binning can only improve packet locality, never destroy it."""
    tn = (o - bmin) / jnp.maximum(bmax - bmin, 1e-9)
    octant = (((d[:, 0] >= 0).astype(jnp.int32) << 2)
              | ((d[:, 1] >= 0).astype(jnp.int32) << 1)
              | (d[:, 2] >= 0).astype(jnp.int32))
    key = octant
    if origin_bits:
        key = (key << (3 * origin_bits)) | _morton3_bits(tn, origin_bits)
    if dir_bits:
        key = (key << (3 * dir_bits)) | _morton3_bits(d * 0.5 + 0.5, dir_bits)
    return key


N_RAY_BUCKETS = 1 << (3 + 3)   # octant x coarse origin Morton
