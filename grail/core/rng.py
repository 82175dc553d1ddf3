"""Counter-based, stateless sample generation.

Deliberate divergence from pbrt-v2's stateful Mersenne Twister (src/core/rng.{h,cpp})
and sample-request protocol (src/core/sampler.{h,cpp} Add1D/Add2D): every sample
dimension is a pure function u = f(pixel_id, sample_idx, dim), so results are bitwise
reproducible regardless of sharding/chip count, checkpoint/resume is exact, and the
whole thing vectorizes trivially on the VPU.

Three generators, mirroring the reference's sampler plugins (src/samplers/):
  RANDOM      — PCG-style integer hash             (random.cpp equivalent)
  STRATIFIED  — jittered strata over spp            (stratified.cpp)
  ZERO_TWO    — scrambled (0,2)-sequence: VanDerCorput + Sobol2
                (lowdiscrepancy.cpp LDPixelSample / montecarlo.h Sample02)
  HALTON      — radical-inverse bases 2,3,5,...     (halton.cpp / montecarlo.h)
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
from jax import lax

RANDOM = 0
STRATIFIED = 1
ZERO_TWO = 2
HALTON = 3

_INV_U32 = jnp.float32(2.3283064365386963e-10)  # 1/2^32
ONE_MINUS_EPS = jnp.float32(1.0 - 2**-24)


def _u32(x):
    return jnp.asarray(x).astype(jnp.uint32)


def pcg_hash(x):
    """PCG output permutation over a LCG-advanced state; good avalanche, cheap."""
    x = _u32(x)
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def hash_combine(a, b):
    """Mix two u32 streams (boost-style)."""
    a = _u32(a)
    b = _u32(b)
    return pcg_hash(a ^ (b + jnp.uint32(0x9E3779B9) + (a << jnp.uint32(6)) + (a >> jnp.uint32(2))))


def hash3(a, b, c):
    return hash_combine(hash_combine(a, b), c)


def u32_to_float(u):
    """uint32 → [0,1) float32."""
    return jnp.minimum(_u32(u).astype(jnp.float32) * _INV_U32, ONE_MINUS_EPS)


# --------------------------------------------------------------------- low discrepancy
def reverse_bits32(n):
    n = _u32(n)
    n = (n << jnp.uint32(16)) | (n >> jnp.uint32(16))
    n = ((n & jnp.uint32(0x00FF00FF)) << jnp.uint32(8)) | ((n & jnp.uint32(0xFF00FF00)) >> jnp.uint32(8))
    n = ((n & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4)) | ((n & jnp.uint32(0xF0F0F0F0)) >> jnp.uint32(4))
    n = ((n & jnp.uint32(0x33333333)) << jnp.uint32(2)) | ((n & jnp.uint32(0xCCCCCCCC)) >> jnp.uint32(2))
    n = ((n & jnp.uint32(0x55555555)) << jnp.uint32(1)) | ((n & jnp.uint32(0xAAAAAAAA)) >> jnp.uint32(1))
    return n


def van_der_corput(n, scramble):
    """Base-2 radical inverse with XOR scramble (pbrt montecarlo.h VanDerCorput)."""
    return u32_to_float(reverse_bits32(n) ^ _u32(scramble))


def sobol2(n, scramble):
    """Second Sobol dimension with XOR scramble (pbrt montecarlo.h Sobol2).

    v starts at 1<<31 and evolves v ^= v>>1 per bit of n; unrolled 32x (static)."""
    n = _u32(n)
    result = _u32(scramble)

    def body(i, carry):
        n_cur, v, result = carry
        result = jnp.where((n_cur & jnp.uint32(1)) != 0, result ^ v, result)
        return (n_cur >> jnp.uint32(1), v ^ (v >> jnp.uint32(1)), result)

    _, _, result = lax.fori_loop(0, 32, body, (n, jnp.uint32(1 << 31), result))
    return u32_to_float(result)


def sample02(n, scramble0, scramble1):
    """(0,2)-sequence point n with per-pixel scrambles (pbrt Sample02)."""
    return van_der_corput(n, scramble0), sobol2(n, scramble1)


_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71,
           73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131)


def radical_inverse(n, base):
    """Radical inverse in arbitrary (static) base (pbrt montecarlo.h RadicalInverse)."""
    n = jnp.asarray(n).astype(jnp.int32)
    inv_base = 1.0 / base
    # enough digits for 2^32 in the smallest base (2): 32; larger bases converge sooner
    ndigits = max(2, int(33 / math.log2(base)) + 1) if base > 2 else 33

    def body(i, carry):
        n_cur, val, inv_bi = carry
        d = n_cur % base
        val = val + d.astype(jnp.float32) * inv_bi
        return (n_cur // base, val, inv_bi * inv_base)

    _, val, _ = lax.fori_loop(0, ndigits, body, (n, jnp.zeros(n.shape, jnp.float32), jnp.full(n.shape, inv_base, jnp.float32)))
    return jnp.minimum(val, ONE_MINUS_EPS)


# ------------------------------------------------------------------------- sampler API
@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler configuration (hashable; safe as a jit static arg)."""
    kind: int = ZERO_TWO
    spp: int = 16
    seed: int = 0


def sample_1d(cfg: SamplerConfig, pixel_id, samp_idx, dim):
    """One uniform in [0,1) for (pixel, sample index, dimension). All args arrays ok."""
    pixel_id = _u32(pixel_id)
    samp_idx = _u32(samp_idx)
    dim_u = _u32(dim)
    seed = jnp.uint32(cfg.seed)
    if cfg.kind == RANDOM:
        return u32_to_float(hash3(pixel_id ^ seed, samp_idx, dim_u))
    if cfg.kind == STRATIFIED:
        jitter = u32_to_float(hash3(pixel_id ^ seed, samp_idx, dim_u))
        # shuffle stratum assignment per (pixel, dim) so dims are decorrelated
        perm = (samp_idx + hash_combine(pixel_id ^ seed, dim_u)) % jnp.uint32(cfg.spp)
        return jnp.minimum((perm.astype(jnp.float32) + jitter) / cfg.spp, ONE_MINUS_EPS)
    if cfg.kind == ZERO_TWO:
        scramble = hash3(pixel_id ^ seed, dim_u, jnp.uint32(0xA511E9B3))
        return van_der_corput(samp_idx, scramble)
    if cfg.kind == HALTON:
        # global Halton index decorrelated per pixel by Cranley-Patterson rotation
        base = _PRIMES[int(dim) % len(_PRIMES)] if not hasattr(dim, "shape") else 2
        v = radical_inverse(samp_idx.astype(jnp.int32), base)
        rot = u32_to_float(hash_combine(pixel_id ^ seed, dim_u))
        v = v + rot
        return jnp.where(v >= 1.0, v - 1.0, v)
    raise ValueError(f"unknown sampler kind {cfg.kind}")


def sample_2d(cfg: SamplerConfig, pixel_id, samp_idx, dim):
    """A 2D uniform sample; `dim` identifies the 2D slot (consumes one slot)."""
    pixel_id = _u32(pixel_id)
    samp_idx = _u32(samp_idx)
    dim_u = _u32(dim)
    seed = jnp.uint32(cfg.seed)
    if cfg.kind == ZERO_TWO:
        s0 = hash3(pixel_id ^ seed, dim_u, jnp.uint32(0xA511E9B3))
        s1 = hash3(pixel_id ^ seed, dim_u, jnp.uint32(0x63D83595))
        return sample02(samp_idx, s0, s1)
    if cfg.kind == STRATIFIED:
        # 2D strata: factor spp ~ sx*sy
        sx = int(math.sqrt(cfg.spp))
        sx = max(sx, 1)
        sy = max(cfg.spp // sx, 1)
        n = sx * sy
        perm = (samp_idx + hash_combine(pixel_id ^ seed, dim_u)) % jnp.uint32(n)
        px = (perm % jnp.uint32(sx)).astype(jnp.float32)
        py = (perm // jnp.uint32(sx)).astype(jnp.float32)
        jx = u32_to_float(hash3(pixel_id ^ seed, samp_idx, dim_u * jnp.uint32(2)))
        jy = u32_to_float(hash3(pixel_id ^ seed, samp_idx, dim_u * jnp.uint32(2) + jnp.uint32(1)))
        return (jnp.minimum((px + jx) / sx, ONE_MINUS_EPS),
                jnp.minimum((py + jy) / sy, ONE_MINUS_EPS))
    u0 = sample_1d(cfg, pixel_id, samp_idx, dim_u * jnp.uint32(2) + jnp.uint32(1000003))
    u1 = sample_1d(cfg, pixel_id, samp_idx, dim_u * jnp.uint32(2) + jnp.uint32(1000033))
    return u0, u1
