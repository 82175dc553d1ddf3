"""Vector math over SoA arrays with trailing dim 3.

pbrt-v2 keeps AoS Vector/Point/Normal classes (src/core/geometry.h); here everything is
batched jnp arrays shaped (..., 3) so the VPU sees dense lanes. Functions mirror the
reference's helpers (Dot/AbsDot/Cross/Normalize/CoordinateSystem/FaceForward,
SphericalDirection/Theta/Phi, bbox ops) semantically, not structurally.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INV_PI = 0.31830988618379067154
INV_TWOPI = 0.15915494309189533577
INV_FOURPI = 0.07957747154594766788
PI = 3.14159265358979323846
TWO_PI = 6.28318530717958647692
EPS = 1e-7
ONE_MINUS_EPS = jnp.float32(1.0 - 2**-24)  # largest f32 < 1


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    return jnp.cross(a, b)


def length_sq(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_sq(v))


def normalize(v):
    return v * jax.lax.rsqrt(jnp.maximum(length_sq(v), 1e-30))[..., None]


def face_forward(n, v):
    """Flip n to lie in the hemisphere of v (pbrt geometry.h Faceforward)."""
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def coordinate_system(v1):
    """Build an orthonormal basis around unit v1 (pbrt geometry.h CoordinateSystem).

    Branch-free Duff et al. construction (TPU-friendly; the reference branches on
    |x|>|y|, equivalent frames).
    """
    z = v1[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = v1[..., 0] * v1[..., 1] * a
    v2 = jnp.stack(
        [1.0 + sign * v1[..., 0] * v1[..., 0] * a, sign * b, -sign * v1[..., 0]],
        axis=-1,
    )
    v3 = jnp.stack([b, sign + v1[..., 1] * v1[..., 1] * a, -v1[..., 1]], axis=-1)
    return v2, v3


def spherical_direction(sintheta, costheta, phi):
    return jnp.stack(
        [sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta], axis=-1
    )


def spherical_direction_basis(sintheta, costheta, phi, x, y, z):
    return (
        (sintheta * jnp.cos(phi))[..., None] * x
        + (sintheta * jnp.sin(phi))[..., None] * y
        + costheta[..., None] * z
    )


def spherical_theta(v):
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + TWO_PI, p)


def lerp(t, a, b):
    return (1.0 - t) * a + t * b


def quadratic(a, b, c):
    """Stable quadratic solve (pbrt pbrt.h Quadratic). Returns (has, t0, t1), t0<=t1."""
    disc = b * b - 4.0 * a * c
    has = disc >= 0.0
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0.0, -0.5 * (b - root), -0.5 * (b + root))
    t0 = q / jnp.where(a == 0.0, 1.0, a)
    t1 = c / jnp.where(q == 0.0, 1.0, q)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    return has, lo, hi


# ----------------------------------------------------------------------------- bboxes
def bbox_union(mn1, mx1, mn2, mx2):
    return jnp.minimum(mn1, mn2), jnp.maximum(mx1, mx2)


def bbox_surface_area(mn, mx):
    d = jnp.maximum(mx - mn, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])


def ray_bbox_hit(o, inv_d, tmin, tmax, bmin, bmax):
    """Slab test (pbrt bbox.IntersectP / bvh.cpp IntersectP): broadcast-friendly."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    far = far * 1.0000004  # pbrt-style robustness pad
    return (near <= far) & (far >= tmin) & (near <= tmax), jnp.maximum(near, tmin)
