"""SE(2) geometry.

The reference's ``Transform`` (main.c:97-118) uses a transposed-rotation
convention: ``wx = ct*x + st*y + tx``, ``wy = -st*x + ct*y + ty`` — i.e. the
point is rotated by ``-theta``. The same convention is used inside the matcher
(main.c:462-463), so the system is self-consistent; we expose it as
``transform_ref`` and keep all fidelity-mode code on it. ``transform`` is the
standard R(+theta) form used by the performance-mode / particle layers.

All functions are shape-polymorphic over leading batch dims and jit/vmap safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def transform_ref(x: jnp.ndarray, y: jnp.ndarray, pose: jnp.ndarray):
    """Reference-convention rigid transform (rotation by -theta).

    pose: (..., 3) = (tx, ty, theta). x, y: (..., N). Uses the deterministic
    trig32 sin/cos so fidelity-path trajectories are bit-comparable with the
    C++ oracle (see core/trig32.py).
    """
    from lidar_slam_tpu.core.trig32 import sincos32

    tx, ty, theta = pose[..., 0:1], pose[..., 1:2], pose[..., 2:3]
    st, ct = sincos32(theta)
    wx = ct * x + st * y + tx
    wy = -st * x + ct * y + ty
    return wx, wy


def transform(x: jnp.ndarray, y: jnp.ndarray, pose: jnp.ndarray):
    """Standard SE(2) action: R(theta) @ p + t."""
    tx, ty, theta = pose[..., 0:1], pose[..., 1:2], pose[..., 2:3]
    ct, st = jnp.cos(theta), jnp.sin(theta)
    wx = ct * x - st * y + tx
    wy = st * x + ct * y + ty
    return wx, wy


def wrap_angle(a: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi]."""
    return a - 2.0 * jnp.pi * jnp.floor((a + jnp.pi) / (2.0 * jnp.pi))


def compose(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Standard-convention pose composition: p1 ⊕ p2 (p2 in p1's frame)."""
    ct, st = jnp.cos(p1[..., 2]), jnp.sin(p1[..., 2])
    x = p1[..., 0] + ct * p2[..., 0] - st * p2[..., 1]
    y = p1[..., 1] + st * p2[..., 0] + ct * p2[..., 1]
    return jnp.stack([x, y, p1[..., 2] + p2[..., 2]], axis=-1)


def ref_to_std(pose: jnp.ndarray) -> jnp.ndarray:
    """Reference-convention pose -> standard pose (heading = -theta).

    ``transform_ref`` rotates by R(-theta), so a reference pose (x, y, t)
    denotes the same rigid transform as a standard pose (x, y, -t). The
    pose-graph backend works in the standard convention; frontends convert
    at the boundary."""
    return pose * jnp.asarray([1.0, 1.0, -1.0], pose.dtype)


std_to_ref = ref_to_std  # involution


def compose_ref(a: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Reference-convention composition: the world pose of ``z`` given in
    ``a``'s frame (``transform_ref`` rotates by R(-theta), so the translation
    composes through R(-theta_a))."""
    ct, st = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ct * z[..., 0] + st * z[..., 1]
    y = a[..., 1] - st * z[..., 0] + ct * z[..., 1]
    return jnp.stack([x, y, a[..., 2] + z[..., 2]], axis=-1)


def between_ref(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reference-convention relative pose: z with ``compose_ref(a, z) == b``."""
    dx = b[..., 0] - a[..., 0]
    dy = b[..., 1] - a[..., 1]
    ct, st = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    return jnp.stack([ct * dx - st * dy, st * dx + ct * dy,
                      b[..., 2] - a[..., 2]], axis=-1)


def between(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Relative pose p1 ⊖ p2: the transform taking p1's frame to p2's."""
    dx = p2[..., 0] - p1[..., 0]
    dy = p2[..., 1] - p1[..., 1]
    ct, st = jnp.cos(p1[..., 2]), jnp.sin(p1[..., 2])
    return jnp.stack(
        [ct * dx + st * dy, -st * dx + ct * dy, wrap_angle(p2[..., 2] - p1[..., 2])],
        axis=-1,
    )
