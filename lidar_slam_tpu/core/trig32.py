"""Deterministic f32 sin/cos shared bit-for-bit with the C++ oracle.

Why this exists: the fidelity pipeline's only remaining cross-implementation
nondeterminism was libm ``cosf`` vs XLA's ``cos`` — they disagree by 1 ulp at
rare arguments, which flips near-tie argmins in the correlative matcher
(``ops/matching.py``) and forks the trajectory (round-1 PARITY.md's "cosf-ulp
tie" caveat; observed at scan 607 of the building workload). Both sides now
evaluate the *same* arithmetic: Cody-Waite range reduction by pi/2 (three-part
split, products exact for |k| < 4096) and the cephes minimax polynomials, in a
fixed operation order that XLA (contraction-free on CPU by default) and g++
(built with ``-ffp-contract=off``) compile to identical IEEE f32 op sequences.
The C++ twin is ``sincos32`` in ``native/src/slam_core.cpp`` — any edit here
must be mirrored there (pinned by ``tests/test_core.py::test_trig32_matches_native``).

Accuracy: < 1 ulp vs correctly-rounded over |x| <= 100 (the SLAM pipeline's
theta stays within a few tens of radians); but the contract is *identical*,
not correctly-rounded.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# np.float32 scalars, NOT jnp.float32: a module-level jnp scalar is a device
# array created at import time, and JAX 0.9 hoists closed-over device arrays
# into runtime const-buffer arguments of every executable that uses them —
# which breaks the C++ dispatch fastpath's argument-count bookkeeping when
# several programs share them (observed: "Execution supplied 22 buffers but
# compiled program expected 36"). np scalars are inlined as HLO literals.
_TWO_OVER_PI = np.float32(0.63661975)    # 0x3f22f983
_PIO2_H1 = np.float32(1.5703125)         # 0x3fc90000 (12 trailing zero bits)
_PIO2_H2 = np.float32(4.837512969970703e-4)   # 0x39fda000
_PIO2_H3 = np.float32(7.549789415861596e-8)   # 0x33a22169

_S1 = np.float32(-1.6666654611e-1)
_S2 = np.float32(8.3321608736e-3)
_S3 = np.float32(-1.9515295891e-4)
_C1 = np.float32(4.166664568298827e-2)
_C2 = np.float32(-1.388731625493765e-3)
_C3 = np.float32(2.443315711809948e-5)


def sincos32(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sin x, cos x) in f32, bit-identical to the oracle's ``sincos32``."""
    x = x.astype(jnp.float32)
    t = x * _TWO_OVER_PI
    k = jnp.trunc(t + jnp.sign(t) * jnp.float32(0.5))    # roundf, exact here
    r = ((x - k * _PIO2_H1) - k * _PIO2_H2) - k * _PIO2_H3
    r2 = r * r
    sp = (_S3 * r2 + _S2) * r2 + _S1
    sinr = (sp * r2) * r + r
    cp = (_C3 * r2 + _C2) * r2 + _C1
    cosr = (cp * r2) * r2 + (jnp.float32(1.0) - jnp.float32(0.5) * r2)
    q = jnp.mod(k.astype(jnp.int32), 4)                   # 0..3
    sin = jnp.where(q == 0, sinr,
                    jnp.where(q == 1, cosr,
                              jnp.where(q == 2, -sinr, -cosr)))
    cos = jnp.where(q == 0, cosr,
                    jnp.where(q == 1, -sinr,
                              jnp.where(q == 2, -cosr, sinr)))
    return sin, cos


def sin32(x: jnp.ndarray) -> jnp.ndarray:
    return sincos32(x)[0]


def cos32(x: jnp.ndarray) -> jnp.ndarray:
    return sincos32(x)[1]
