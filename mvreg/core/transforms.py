"""SE(3) rigid-transform utilities.

Counterpart of the reference's geometry helpers (`ref:lib/utils.py` —
transform composition/inversion, rotation conversions; see SURVEY.md L1).
Everything here is pure jnp, static-shaped, batched over arbitrary leading
dims, and safe under jit/vmap/grad.

Conventions:
  * A rigid transform is (R, t): y = R @ x + t, with R (..., 3, 3) and
    t (..., 3). Homogeneous 4x4 helpers convert to/from this form.
  * Quaternions are (w, x, y, z), unit norm, w >= 0 canonicalized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def apply_transform(R: Array, t: Array, points: Array) -> Array:
    """y = R @ x + t for points (..., N, 3) with R (..., 3, 3), t (..., 3)."""
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


def compose(Ra: Array, ta: Array, Rb: Array, tb: Array) -> tuple[Array, Array]:
    """Transform (Ra, ta) ∘ (Rb, tb): first apply b, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def inverse(R: Array, t: Array) -> tuple[Array, Array]:
    """Inverse rigid transform: (Rᵀ, -Rᵀ t)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def relative(Ri: Array, ti: Array, Rj: Array, tj: Array) -> tuple[Array, Array]:
    """T_ij = T_j⁻¹ ∘ T_i mapping frame-i coordinates into frame j.

    With absolute poses T_i (fragment i -> world), the pairwise measurement
    the registration pipeline estimates is the transform taking points of
    fragment i onto fragment j: x_j = Rj⁻¹ (Ri x_i + ti - tj).
    """
    Rji, tji = inverse(Rj, tj)
    return compose(Rji, tji, Ri, ti)


def to_matrix(R: Array, t: Array) -> Array:
    """(R, t) -> homogeneous (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(T: Array) -> tuple[Array, Array]:
    """Homogeneous (..., 4, 4) -> (R, t)."""
    return T[..., :3, :3], T[..., :3, 3]


def quat_to_rotmat(q: Array) -> Array:
    """Unit quaternion (..., 4) (w, x, y, z) -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_quat(R: Array) -> Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (w, x, y, z), w >= 0.

    Branch-free Shepperd-style: compute all four candidate quaternions
    (scaled by their pivot), pick the best-conditioned via one-hot select.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # Four pivots: trace and the three diagonal dominants.
    tw = 1.0 + r00 + r11 + r22
    tx = 1.0 + r00 - r11 - r22
    ty = 1.0 - r00 + r11 - r22
    tz = 1.0 - r00 - r11 + r22
    # Candidate (unnormalized) quats, each valid when its pivot is largest.
    qw = jnp.stack([tw, r21 - r12, r02 - r20, r10 - r01], axis=-1)
    qx = jnp.stack([r21 - r12, tx, r01 + r10, r02 + r20], axis=-1)
    qy = jnp.stack([r02 - r20, r01 + r10, ty, r12 + r21], axis=-1)
    qz = jnp.stack([r10 - r01, r02 + r20, r12 + r21, tz], axis=-1)
    pivots = jnp.stack([tw, tx, ty, tz], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign (w >= 0); at w == 0 leave as-is (sign ambiguity).
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def random_rotation(key: Array, shape: tuple[int, ...] = ()) -> Array:
    """Uniform random rotation(s) (..., 3, 3) via uniform quaternions."""
    q = jax.random.normal(key, shape + (4,))
    return quat_to_rotmat(q)


def random_rigid(
    key: Array,
    shape: tuple[int, ...] = (),
    max_translation: float = 1.0,
) -> tuple[Array, Array]:
    """Uniform random rotation + uniform translation in a cube."""
    kr, kt = jax.random.split(key)
    R = random_rotation(kr, shape)
    t = jax.random.uniform(
        kt, shape + (3,), minval=-max_translation, maxval=max_translation
    )
    return R, t


def skew(v: Array) -> Array:
    """(..., 3) -> skew-symmetric (..., 3, 3) with skew(v) @ x = v × x."""
    zeros = jnp.zeros_like(v[..., 0])
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    rows = [
        jnp.stack([zeros, -vz, vy], axis=-1),
        jnp.stack([vz, zeros, -vx], axis=-1),
        jnp.stack([-vy, vx, zeros], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def so3_exp(w: Array) -> Array:
    """Rodrigues exponential map (..., 3) -> (..., 3, 3), safe at ||w|| -> 0."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta2 = theta * theta
    small = theta < 1e-4
    # sin(x)/x and (1-cos x)/x^2 with Taylor fallbacks.
    a = jnp.where(small[..., 0], 1.0 - theta2[..., 0] / 6.0,
                  jnp.sin(theta[..., 0]) / jnp.where(small[..., 0], 1.0, theta[..., 0]))
    b = jnp.where(small[..., 0], 0.5 - theta2[..., 0] / 24.0,
                  (1.0 - jnp.cos(theta[..., 0]))
                  / jnp.where(small[..., 0], 1.0, theta2[..., 0]))
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)
