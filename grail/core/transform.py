"""4x4 transforms + quaternions + animated transforms.

Mirrors pbrt-v2 src/core/transform.{h,cpp} and quaternion.{h,cpp} semantically:
Translate/Scale/Rotate/LookAt/Orthographic/Perspective constructors, point/vector/
normal/ray application (normals via inverse transpose), and AnimatedTransform =
polar decomposition to TRS + per-ray slerp keyed on ray time (motion blur).
Host-side builders use NumPy; device application uses jnp.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# --------------------------------------------------------------- host-side constructors
def identity():
    return np.eye(4, dtype=np.float32)


def translate(delta):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = delta
    return m


def scale(sx, sy, sz):
    return np.diag([sx, sy, sz, 1.0]).astype(np.float32)


def rotate_x(deg):
    t = np.radians(deg)
    c, s = np.cos(t), np.sin(t)
    m = np.eye(4, dtype=np.float32)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def rotate_y(deg):
    t = np.radians(deg)
    c, s = np.cos(t), np.sin(t)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


def rotate_z(deg):
    t = np.radians(deg)
    c, s = np.cos(t), np.sin(t)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return m


def rotate(deg, axis):
    """Rotation about arbitrary axis (pbrt transform.cpp Rotate)."""
    a = np.asarray(axis, dtype=np.float64)
    a = a / np.linalg.norm(a)
    t = np.radians(deg)
    c, s = np.cos(t), np.sin(t)
    m = np.eye(4, dtype=np.float64)
    m[0, 0] = a[0] * a[0] + (1 - a[0] * a[0]) * c
    m[0, 1] = a[0] * a[1] * (1 - c) - a[2] * s
    m[0, 2] = a[0] * a[2] * (1 - c) + a[1] * s
    m[1, 0] = a[0] * a[1] * (1 - c) + a[2] * s
    m[1, 1] = a[1] * a[1] + (1 - a[1] * a[1]) * c
    m[1, 2] = a[1] * a[2] * (1 - c) - a[0] * s
    m[2, 0] = a[0] * a[2] * (1 - c) - a[1] * s
    m[2, 1] = a[1] * a[2] * (1 - c) + a[0] * s
    m[2, 2] = a[2] * a[2] + (1 - a[2] * a[2]) * c
    return m.astype(np.float32)


def look_at(pos, look, up):
    """world-from-camera matrix (pbrt transform.cpp LookAt)."""
    pos = np.asarray(pos, np.float64)
    look = np.asarray(look, np.float64)
    up = np.asarray(up, np.float64)
    d = look - pos
    d = d / np.linalg.norm(d)
    right = np.cross(up / np.linalg.norm(up), d)
    nr = np.linalg.norm(right)
    if nr < 1e-10:
        raise ValueError("LookAt: up and view direction are parallel")
    right /= nr
    new_up = np.cross(d, right)
    m = np.eye(4, dtype=np.float64)
    m[:3, 0] = right
    m[:3, 1] = new_up
    m[:3, 2] = d
    m[:3, 3] = pos
    return m.astype(np.float32)


def orthographic(znear, zfar):
    m = np.eye(4, dtype=np.float32)
    m[2, 2] = 1.0 / (zfar - znear)
    m[2, 3] = -znear / (zfar - znear)
    return m


def perspective(fov_deg, n, f):
    """Projective camera-to-screen (pbrt transform.cpp Perspective)."""
    persp = np.array(
        [[1, 0, 0, 0],
         [0, 1, 0, 0],
         [0, 0, f / (f - n), -f * n / (f - n)],
         [0, 0, 1, 0]], dtype=np.float32)
    inv_tan = 1.0 / np.tan(np.radians(fov_deg) / 2.0)
    return scale(inv_tan, inv_tan, 1.0) @ persp


def inverse(m):
    return np.linalg.inv(np.asarray(m, np.float64)).astype(np.float32)


def swaps_handedness(m):
    return np.linalg.det(np.asarray(m)[:3, :3]) < 0.0


# ------------------------------------------------------------------ device application
# Explicit arithmetic (not einsum/matmul): full f32 precision regardless of the
# backend's default matmul precision, and pure VPU work — no 3-wide MXU waste.
def xform_p(m, p):
    """Apply 4x4 (or batched (...,4,4)) to points (...,3)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    r = jnp.stack([
        m[..., 0, 0] * x + m[..., 0, 1] * y + m[..., 0, 2] * z + m[..., 0, 3],
        m[..., 1, 0] * x + m[..., 1, 1] * y + m[..., 1, 2] * z + m[..., 1, 3],
        m[..., 2, 0] * x + m[..., 2, 1] * y + m[..., 2, 2] * z + m[..., 2, 3],
    ], axis=-1)
    w = m[..., 3, 0] * x + m[..., 3, 1] * y + m[..., 3, 2] * z + m[..., 3, 3]
    return r / w[..., None]


def xform_v(m, v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([
        m[..., 0, 0] * x + m[..., 0, 1] * y + m[..., 0, 2] * z,
        m[..., 1, 0] * x + m[..., 1, 1] * y + m[..., 1, 2] * z,
        m[..., 2, 0] * x + m[..., 2, 1] * y + m[..., 2, 2] * z,
    ], axis=-1)


def xform_n(m_inv, n):
    """Normals transform by the inverse transpose (pbrt transform.h)."""
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    return jnp.stack([
        m_inv[..., 0, 0] * x + m_inv[..., 1, 0] * y + m_inv[..., 2, 0] * z,
        m_inv[..., 0, 1] * x + m_inv[..., 1, 1] * y + m_inv[..., 2, 1] * z,
        m_inv[..., 0, 2] * x + m_inv[..., 1, 2] * y + m_inv[..., 2, 2] * z,
    ], axis=-1)


# ----------------------------------------------------------------------- quaternions
def mat_to_quat(m):
    """Rotation matrix (3x3 block) → quaternion [x,y,z,w] (host, numpy)."""
    m = np.asarray(m, np.float64)
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[2, 1] - m[1, 2]) / s
        x = 0.25 * s
        y = (m[0, 1] + m[1, 0]) / s
        z = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[0, 2] - m[2, 0]) / s
        x = (m[0, 1] + m[1, 0]) / s
        y = 0.25 * s
        z = (m[1, 2] + m[2, 1]) / s
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[1, 0] - m[0, 1]) / s
        x = (m[0, 2] + m[2, 0]) / s
        y = (m[1, 2] + m[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w], dtype=np.float32)


def quat_to_mat(q):
    """Quaternion (...,4) [x,y,z,w] → rotation matrices (...,3,3) (device, jnp)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
        2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
        2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(r.shape[:-1] + (3, 3))


def slerp(t, q0, q1):
    """Spherical lerp of quaternions, batched over t (pbrt quaternion.cpp Slerp)."""
    cos_theta = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(cos_theta[..., None] < 0.0, -q1, q1)
    cos_theta = jnp.abs(cos_theta)
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    near = cos_theta > 0.9995
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_theta))
    q = w0[..., None] * q0 + w1[..., None] * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ------------------------------------------------------------------ animated transform
def decompose(m):
    """M → (T, R quaternion, S 3x3) polar decomposition (pbrt AnimatedTransform::Decompose)."""
    m = np.asarray(m, np.float64)
    T = m[:3, 3].astype(np.float32)
    M = m[:3, :3].copy()
    # polar decomposition by Higham iteration
    R = M.copy()
    for _ in range(100):
        Rnext = 0.5 * (R + np.linalg.inv(R.T))
        if np.abs(Rnext - R).sum() < 1e-8:
            R = Rnext
            break
        R = Rnext
    S = (np.linalg.inv(R) @ M).astype(np.float32)
    return T, mat_to_quat(R), S


def animated_pack(m_start, m_end):
    """Host: pack an animated transform into a dict of arrays for device interp."""
    t0, q0, s0 = decompose(m_start)
    t1, q1, s1 = decompose(m_end)
    return {
        "t": np.stack([t0, t1]).astype(np.float32),       # (2,3)
        "q": np.stack([q0, q1]).astype(np.float32),       # (2,4)
        "s": np.stack([s0, s1]).astype(np.float32),       # (2,3,3)
        "animated": np.array(not np.allclose(m_start, m_end), dtype=np.bool_),
        "m0": np.asarray(m_start, np.float32),
    }


def quat_rotate(q, v):
    """Rotate vectors v (...,3) by unit quaternions q (...,4) [x,y,z,w] —
    v + 2·cross(q.xyz, cross(q.xyz, v) + w·v); no matrix materialization."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    c1 = jnp.cross(xyz, v) + w * v
    return v + 2.0 * jnp.cross(xyz, c1)


def animated_apply(packed, time, v, is_point=True):
    """Apply the interpolated transform at `time` (...,) to v (...,3) WITHOUT
    building per-lane (N,4,4) matrices (the .at[].set construction compiles to
    64 MB dynamic-update-slices — measured 150 ms/Mray on TPU).

    TRS order matches AnimatedTransform::Interpolate: scale, rotate, translate.
    """
    tt = time[..., None]
    S = (1.0 - time)[..., None, None] * packed["s"][0] \
        + time[..., None, None] * packed["s"][1]
    q = slerp(time, jnp.broadcast_to(packed["q"][0], time.shape + (4,)),
              jnp.broadcast_to(packed["q"][1], time.shape + (4,)))
    sv = jnp.einsum("...jk,...k->...j", S, v, precision="highest")
    out = quat_rotate(q, sv)
    if is_point:
        t = (1.0 - tt) * packed["t"][0] + tt * packed["t"][1]
        out = out + t
    # static (non-animated) fallback: one shared 4x4 (precision=highest —
    # TPU matmul otherwise runs bf16 passes, visibly shifting geometry)
    m0 = packed["m0"]
    fixed = jnp.einsum("ij,...j->...i", m0[:3, :3], v, precision="highest")
    if is_point:
        fixed = fixed + m0[:3, 3]
    return jnp.where(packed["animated"], out, fixed)


def animated_eval(packed, time):
    """Device: interpolated world matrices (...,4,4) at `time` (...,) in [0,1]."""
    t = (1.0 - time)[..., None] * packed["t"][0] + time[..., None] * packed["t"][1]
    q = slerp(time, jnp.broadcast_to(packed["q"][0], time.shape + (4,)),
              jnp.broadcast_to(packed["q"][1], time.shape + (4,)))
    R = quat_to_mat(q)
    S = (1.0 - time)[..., None, None] * packed["s"][0] + time[..., None, None] * packed["s"][1]
    RS = jnp.einsum("...ij,...jk->...ik", R, S, precision="highest")
    m = jnp.zeros(time.shape + (4, 4), jnp.float32)
    m = m.at[..., :3, :3].set(RS)
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return jnp.where(packed["animated"], m, jnp.broadcast_to(packed["m0"], m.shape))


# --------------------------------------------------------------- host-side (numpy)
def xform_p_np(m, p):
    """Host: apply 4x4 to points (...,3) in numpy (scene build path)."""
    m = np.asarray(m, np.float64)
    p = np.asarray(p, np.float64)
    r = p @ m[:3, :3].T + m[:3, 3]
    w = p @ m[3, :3].T + m[3, 3]
    return (r / w[..., None]).astype(np.float32)


def xform_v_np(m, v):
    m = np.asarray(m, np.float64)
    return (np.asarray(v, np.float64) @ m[:3, :3].T).astype(np.float32)


def xform_n_np(m_inv, n):
    m_inv = np.asarray(m_inv, np.float64)
    return (np.asarray(n, np.float64) @ m_inv[:3, :3]).astype(np.float32)
