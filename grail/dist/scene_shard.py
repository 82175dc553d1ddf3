"""P6 scene sharding — ring ray-passing over spatial triangle shards.

The last parallelism axis from SURVEY §2.10/§5.7: when the scene exceeds one
chip's HBM, partition the TRIANGLES across the device mesh instead of
replicating them. Rays stay sharded by pixel band (DP axis); every traversal
becomes a ring: each device intersects the resident ray queue against its own
triangle shard, then `ppermute`s the ray+best-hit state to its ring neighbor.
After n_devices steps every ray has visited every shard exactly once and is
back home with the globally closest hit. pbrt has no analog (its scene is a
shared-memory pointer graph); this is the TPU-native equivalent of
out-of-core ray tracing, with ICI doing the ray transport.

Shading without a global mesh: the winning shard attaches the hit triangle's
full attribute record (vertices, normals, uvs, material/light/flag ids) to
the ray state, so shade/geometry.py can build the shading frame from the
carried record (`hit["tri"]`) — no device ever gathers from a full-size
vertex array. Area-light sampling reads the compact pre-gathered
`lights["av0".."aflip"]` table (shade/lights.py), which is O(#light tris).

Determinism: hits merge by lexicographic (t, global prim id), which is
visit-order independent, so the image is BITWISE identical to the replicated
render (verified in tests/test_scene_shard.py).

Ring step 2 (round 5): partition_scene(stream=True) builds a per-shard SAH
BVH + Pallas stream table, so the local step is O(log T/D) per ray instead
of the brute O(T/D) sweep — per-device geometry O(T/D) AND logarithmic
per-shard work. The brute local step remains the default for its exact
bitwise-vs-replicated tie-breaking contract (stream traversal keeps the
first-visited among exact-equal-t hits instead of the lowest gid).

Remaining honest limits (see SURVEY §5.7):
* the carried attribute record is ~30 floats/ray of ppermute traffic; the
  bandwidth-lean variant rings only (t, prim, owner) and fetches attributes
  with one all_to_all at the end;
* instances, media, and alpha cutouts are not supported in ring mode.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

BIG_T = jnp.float32(3.0e37)

# mesh axis carrying both the scene shards and the resident ray queues
RING_AXIS = "dev"

# carried triangle attribute record fields (all (N, ...) per ray)
TRI_FIELDS = ("v0", "e1", "e2", "n0", "n1", "n2", "uv0", "uv1", "uv2")
TRI_IFIELDS = ("mat", "light", "flags")


def _morton(c, bits=10):
    q = np.clip(c * (1 << bits), 0, (1 << bits) - 1).astype(np.uint64)

    def spread(v):
        out = np.zeros_like(v)
        for i in range(bits):
            out |= ((v >> i) & 1) << (3 * i)
        return out
    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


def partition_scene(scene, n_shards, stream=False):
    """Host-side spatial partition of the triangle soup into n_shards.

    Triangles are Morton-ordered by centroid, cut into n_shards contiguous
    chunks (spatially compact shards), then each shard is re-sorted by global
    id so per-shard argmin tie-breaking matches the replicated brute path
    (lowest global prim id wins among exact-equal t). Returns a pytree whose
    leaves have leading axis n_shards (pad triangles are degenerate).

    stream=True (opt-in; default False keeps the brute local step and its
    bitwise-vs-replicated contract) also
    builds a PER-SHARD SAH BVH + stream record table (round-5 'ring step 2':
    the ring's local step runs the Pallas stream kernel instead of brute
    Möller-Trumbore, making per-ray work O(log T/D) per shard while
    per-device geometry stays O(T/D)). Record prim ids are LOCAL SLOTS into
    the shard's gid-sorted field arrays, so the carried-record gather and
    the (t, gid) merge are unchanged."""
    verts = np.asarray(scene["verts"], np.float32)
    idx = np.asarray(scene["tri_idx"], np.int64)
    vnorm = np.asarray(scene["vnorm"], np.float32)
    vuv = np.asarray(scene["vuv"], np.float32)
    T = idx.shape[0]
    v0 = verts[idx[:, 0]]
    v1 = verts[idx[:, 1]]
    v2 = verts[idx[:, 2]]
    cen = (v0 + v1 + v2) / 3.0
    lo, hi = cen.min(0), cen.max(0)
    code = _morton((cen - lo) / np.maximum(hi - lo, 1e-9))
    order = np.argsort(code, kind="stable")
    per = -(-T // n_shards)

    fields = {
        "v0": v0, "e1": v1 - v0, "e2": v2 - v0,
        "n0": vnorm[idx[:, 0]], "n1": vnorm[idx[:, 1]], "n2": vnorm[idx[:, 2]],
        "uv0": vuv[idx[:, 0]], "uv1": vuv[idx[:, 1]], "uv2": vuv[idx[:, 2]],
        "mat": np.asarray(scene["tri_mat"], np.int32),
        "light": np.asarray(scene["tri_light"], np.int32),
        "flags": np.asarray(scene["tri_flags"], np.int32),
    }
    out = {k: [] for k in fields}
    out["gid"] = []
    tables = []
    for s in range(n_shards):
        members = np.sort(order[s * per:(s + 1) * per])   # ascending global id
        pad = per - len(members)
        for k, arr in fields.items():
            a = arr[members]
            if pad:
                z = np.zeros((pad,) + a.shape[1:], a.dtype)
                if k == "v0":
                    z += np.float32(2.0e30)   # park pad tris far away
                a = np.concatenate([a, z])
            out[k].append(a)
        gid = members.astype(np.int32)
        if pad:
            gid = np.concatenate([gid, np.full(pad, 2 ** 30, np.int32)])
        out["gid"].append(gid)

        if stream and len(members):
            from ..scene.bvh import build_bvh_auto
            from ..kernels.bvh_stream import (build_stream_records,
                                              pack_record_rows)
            sub_idx = idx[members]
            b = build_bvh_auto(verts, sub_idx, max_prims=4, force_leaf=4)
            sv0 = verts[sub_idx[:, 0]]
            tris9 = np.concatenate(
                [sv0, verts[sub_idx[:, 1]] - sv0, verts[sub_idx[:, 2]] - sv0],
                axis=1).astype(np.float32)
            ordered = tris9[np.asarray(b["prim_ids"], np.int64)]
            # prim ids = LOCAL SLOTS into the shard's gid-sorted arrays
            recs = build_stream_records(b, ordered,
                                        prim_map=np.arange(len(members)))
            tables.append(pack_record_rows(recs))

    ring = {k: jnp.asarray(np.stack(v)) for k, v in out.items()}
    if tables and len(tables) == n_shards:
        rows = max(t.shape[0] for t in tables)
        tables = [np.pad(t, ((0, rows - t.shape[0]), (0, 0)))
                  for t in tables]
        ring["stream"] = jnp.asarray(np.stack(tables))
    return ring


def _local_hit(shard, o, d, tmin, tmax):
    """Closest hit of the resident ray queue against the local shard.

    With a per-shard stream table (ring step 2): the Pallas stream-kernel
    traversal — O(log T/D) per ray instead of the O(T/D) brute sweep; prim
    ids come back as local slots, so the carried-record gather and the
    (t, gid) merge are unchanged. Without one: brute Möller-Trumbore with
    the SAME formulation as kernels.intersect.moller_trumbore so ring
    results are bitwise identical to the replicated brute path. Ties broken
    by lowest global id (shards are gid-sorted; brute argmin picks the
    first; the stream kernel keeps the first-visited strictly-closer hit,
    which can differ only on exact-equal t across distinct triangles)."""
    if "stream" in shard:
        from ..kernels.bvh_stream import bvh_stream_intersect
        tris9 = jnp.concatenate(
            [shard["v0"], shard["e1"], shard["e2"]], axis=1)
        t, slot, b1, b2 = bvh_stream_intersect(
            shard["stream"], tris9, o, d, tmin, tmax)
        ok = slot >= 0
        return {"t": jnp.where(ok, t, BIG_T),
                "slot": jnp.maximum(slot, 0), "ok": ok, "b1": b1, "b2": b2}
    from ..kernels.intersect import moller_trumbore
    hit, t, b1, b2 = moller_trumbore(
        o[:, None, :], d[:, None, :], shard["v0"][None], shard["e1"][None],
        shard["e2"][None], tmin[:, None], tmax[:, None])
    tm = jnp.where(hit, t, BIG_T)
    best = jnp.argmin(tm, axis=1)
    lane = jnp.arange(o.shape[0])
    tb = tm[lane, best]
    ok = tb < BIG_T
    return {"t": tb, "slot": best, "ok": ok,
            "b1": b1[lane, best], "b2": b2[lane, best]}


def ring_intersect(shard, o, d, tmax, tmin=None, any_hit=False,
                   axis=RING_AXIS):
    """Distributed closest-hit (or occlusion) over the ring. Must run inside
    shard_map with mesh axis `axis`; o/d/tmax are this device's resident ray
    queue. Returns the standard hit dict plus the carried attribute record
    under "tri" (closest-hit only)."""
    n = o.shape[0]
    D = jax.lax.axis_size(axis)
    if tmin is None:
        tmin = jnp.zeros((n,), jnp.float32)
    perm = [(i, (i + 1) % D) for i in range(D)]

    if any_hit:
        state = {"o": o, "d": d, "tmin": tmin, "tmax": tmax,
                 "occ": jnp.zeros((n,), jnp.bool_)}
        for _ in range(D):
            lh = _local_hit(shard, state["o"], state["d"], state["tmin"],
                            jnp.where(state["occ"], -BIG_T, state["tmax"]))
            state["occ"] = state["occ"] | lh["ok"]
            state = jax.lax.ppermute(state, axis, perm)
        return {"occluded": state["occ"]}

    tri0 = {k: jnp.zeros((n,) + shard[k].shape[1:], shard[k].dtype)
            for k in TRI_FIELDS + TRI_IFIELDS}
    state = {"o": o, "d": d, "tmin": tmin, "tmax": tmax,
             "t": jnp.full((n,), BIG_T), "gid": jnp.full((n,), 2 ** 30,
                                                         jnp.int32),
             "b1": jnp.zeros((n,)), "b2": jnp.zeros((n,)), "tri": tri0}
    for _ in range(D):
        lh = _local_hit(shard, state["o"], state["d"], state["tmin"],
                        jnp.minimum(state["tmax"], state["t"]))
        gid = shard["gid"][lh["slot"]]
        # lexicographic (t, gid): visit-order independent merge
        closer = lh["ok"] & ((lh["t"] < state["t"])
                             | ((lh["t"] == state["t"])
                                & (gid < state["gid"])))
        state["t"] = jnp.where(closer, lh["t"], state["t"])
        state["gid"] = jnp.where(closer, gid, state["gid"])
        state["b1"] = jnp.where(closer, lh["b1"], state["b1"])
        state["b2"] = jnp.where(closer, lh["b2"], state["b2"])
        for k in TRI_FIELDS + TRI_IFIELDS:
            row = shard[k][lh["slot"]]
            m = closer[(...,) + (None,) * (row.ndim - 1)]
            state["tri"][k] = jnp.where(m, row, state["tri"][k])
        state = jax.lax.ppermute(state, axis, perm)

    found = state["t"] < BIG_T
    return {
        "t": jnp.where(found, state["t"], BIG_T),
        "prim": jnp.where(found, state["gid"], -1),
        "b1": state["b1"], "b2": state["b2"],
        "tri": state["tri"],
    }
