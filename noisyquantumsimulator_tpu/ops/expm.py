"""Batched matrix exponential (Pade-13, scaling & squaring) for TPU.

This replaces the QuTiP/zvode ODE core of the reference
(reference: rydberg_gates/simulation.py:647-690 `evolve_state` -> mesolve):
for piecewise-constant Liouvillians the propagator over a segment is
exp(L dt) *exactly*, so instead of adaptive time stepping we compute batched
matrix exponentials — matmul-dominated work that maps onto the MXU.

Implementation notes:
  * Fixed-structure Pade-13 (Higham 2005): 6 complex matmuls + 1 linear solve.
  * Squaring count s is data-dependent but executed as a fixed-length masked
    loop (jit/vmap-safe, static shapes).
  * Everything is expressed with jnp.matmul over (..., D, D) so a whole
    schedule of segment Liouvillians is exponentiated in one batched call.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Pade-13 coefficients (Higham, "The scaling and squaring method for the
# matrix exponential revisited", SIAM J. Matrix Anal. 2005).
_B13 = (
    64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
    1187353796428800.0, 129060195264000.0, 10559470521600.0,
    670442572800.0, 33522128640.0, 1323241920.0, 40840800.0,
    960960.0, 16380.0, 182.0, 1.0,
)
_THETA13 = 5.371920351148152


@partial(jax.jit, static_argnames=("max_squarings",))
def expm(A: jnp.ndarray, max_squarings: int = 24) -> jnp.ndarray:
    """exp(A) for A of shape (..., D, D), complex or real.

    Batched over leading dims. `max_squarings` bounds the masked squaring
    loop; 24 covers ||A||_1 up to ~9e7 which is far beyond any segment
    Liouvillian this framework produces (segments are ~O(10) in norm).
    """
    A = jnp.asarray(A)
    D = A.shape[-1]
    I = jnp.eye(D, dtype=A.dtype)
    I = jnp.broadcast_to(I, A.shape)

    # 1-norm (max abs column sum) per batch element
    norm1 = jnp.max(jnp.sum(jnp.abs(A), axis=-2), axis=-1)
    # number of squarings: smallest s >= 0 with norm/2^s <= theta13
    s_float = jnp.ceil(jnp.log2(jnp.maximum(norm1 / _THETA13, 1.0)))
    s = jnp.clip(s_float, 0, max_squarings).astype(jnp.int32)
    scale = jnp.exp2(-s.astype(A.real.dtype))
    As = A * scale[..., None, None]

    b = [jnp.asarray(c, dtype=A.dtype) for c in _B13]
    A2 = As @ As
    A4 = A2 @ A2
    A6 = A2 @ A4

    U = As @ (A6 @ (b[13] * A6 + b[11] * A4 + b[9] * A2)
              + b[7] * A6 + b[5] * A4 + b[3] * A2 + b[1] * I)
    V = (A6 @ (b[12] * A6 + b[10] * A4 + b[8] * A2)
         + b[6] * A6 + b[4] * A4 + b[2] * A2 + b[0] * I)

    R = jnp.linalg.solve(V - U, V + U)

    def body(i, R):
        do = i < s  # per-batch-element mask
        R2 = R @ R
        return jnp.where(do[..., None, None], R2, R)

    R = jax.lax.fori_loop(0, max_squarings, body, R)
    return R


def expm_apply(A: jnp.ndarray, X: jnp.ndarray, max_squarings: int = 24) -> jnp.ndarray:
    """exp(A) @ X without materializing exp(A) separately (same cost here;
    provided for API symmetry with sparse/Krylov backends added later)."""
    return expm(A, max_squarings=max_squarings) @ X


def chained_product(U: jnp.ndarray) -> jnp.ndarray:
    """Ordered product U[n-1] @ ... @ U[1] @ U[0] via log-depth pairwise
    reduction (tree contraction) — O(log n) sequential batched matmuls
    instead of an O(n) scan. U has shape (n, ..., D, D)."""
    n = U.shape[0]
    while n > 1:
        half = n // 2
        even = U[0:2 * half:2]
        odd = U[1:2 * half:2]
        prod = odd @ even  # later segment applied after earlier
        if n % 2 == 1:
            U = jnp.concatenate([prod, U[-1:]], axis=0)
        else:
            U = prod
        n = U.shape[0]
    return U[0]


__all__ = ["expm", "expm_apply", "chained_product"]
