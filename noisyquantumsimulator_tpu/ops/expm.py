"""Batched matrix exponential (Pade-13, scaling & squaring) for TPU.

This replaces the QuTiP/zvode ODE core of the reference
(reference: rydberg_gates/simulation.py:647-690 `evolve_state` -> mesolve):
for piecewise-constant Liouvillians the propagator over a segment is
exp(L dt) *exactly*, so instead of adaptive time stepping we compute batched
matrix exponentials — matmul-dominated work that maps onto the MXU.

Implementation notes:
  * Two fixed-structure kernels:
      - Pade-13 (Higham 2005): 6 complex matmuls + 1 linear solve. Reference
        accuracy for float64/complex128.
      - Taylor-16 via Paterson-Stockmeyer: 6 complex matmuls, NO solve.
        Batched LU solves map poorly onto the TPU (sequential panel
        factorization + pivot gathers, off the MXU); the PS evaluation is
        pure matmuls. With theta = 1.8 the truncation error is ~4e-10,
        ample for the complex64 device path, at the cost of ~1 extra
        squaring vs Pade's theta = 5.37.
  * method="auto" picks Taylor-16 for 32-bit dtypes, Pade-13 for 64-bit.
  * Squaring count s is data-dependent but executed as a fixed-length masked
    loop (jit/vmap-safe, static shapes, reverse-differentiable). Every loop
    iteration costs a full batched matmul whether masked or not, so callers
    that know their operand norms (gate/simulate.run_plan does — schedules
    are host numpy there) pass a tight `max_squarings` bound instead of the
    conservative default.
  * Everything is expressed with jnp.matmul over (..., D, D) so a whole
    schedule of segment Liouvillians is exponentiated in one batched call.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# All matmuls in this module run at HIGHEST precision explicitly: the TPU
# default truncates operands to one bf16 pass, which accumulates ~1e-2
# error over a 300-segment propagator product — enough that optimizers
# "discover" unphysical F > 1 artifacts. HIGHEST reconstructs full f32.
_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


# Pade-13 coefficients (Higham, "The scaling and squaring method for the
# matrix exponential revisited", SIAM J. Matrix Anal. 2005).
_B13 = (
    64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
    1187353796428800.0, 129060195264000.0, 10559470521600.0,
    670442572800.0, 33522128640.0, 1323241920.0, 40840800.0,
    960960.0, 16380.0, 182.0, 1.0,
)
_THETA13 = 5.371920351148152
# Taylor-16 threshold: truncation ~ theta^17/17! * e^theta = 4e-10 at 1.8 —
# below complex64 roundoff for the squaring chain that follows.
_THETA16 = 1.8
_INVFACT = tuple(1.0 / __import__("math").factorial(k) for k in range(17))


def _scale(A, theta, max_squarings):
    """Per-batch-element scaling: A/2^s with ||A/2^s||_1 <= theta."""
    norm1 = jnp.max(jnp.sum(jnp.abs(A), axis=-2), axis=-1)
    s_float = jnp.ceil(jnp.log2(jnp.maximum(norm1 / theta, 1.0)))
    s = jnp.clip(s_float, 0, max_squarings).astype(jnp.int32)
    scale = jnp.exp2(-s.astype(A.real.dtype))
    return A * scale[..., None, None], s


def _square(R, s, max_squarings):
    """Masked fixed-trip squaring loop (vmap-safe, reverse-differentiable)."""
    def body(i, R):
        do = i < s  # per-batch-element mask
        return jnp.where(do[..., None, None], _mm(R, R), R)
    return jax.lax.fori_loop(0, max_squarings, body, R)


def _pade13(As, I):
    b = [jnp.asarray(c, dtype=As.dtype) for c in _B13]
    A2 = _mm(As, As)
    A4 = _mm(A2, A2)
    A6 = _mm(A2, A4)
    U = _mm(As, _mm(A6, b[13] * A6 + b[11] * A4 + b[9] * A2)
             + b[7] * A6 + b[5] * A4 + b[3] * A2 + b[1] * I)
    V = (_mm(A6, b[12] * A6 + b[10] * A4 + b[8] * A2)
         + b[6] * A6 + b[4] * A4 + b[2] * A2 + b[0] * I)
    return jnp.linalg.solve(V - U, V + U)


def _taylor16(As, I):
    """Degree-16 Taylor via Paterson-Stockmeyer in powers of A^4:
    p = B0 + A4 (B1 + A4 (B2 + A4 (B3 + c16 A4))), Bj cubic in A.
    6 matmuls total (A2, A3, A4 + 3 Horner steps), no linear solve."""
    c = [jnp.asarray(v, dtype=As.dtype) for v in _INVFACT]
    A2 = _mm(As, As)
    A3 = _mm(A2, As)
    A4 = _mm(A2, A2)

    def block(k):
        return c[k] * I + c[k + 1] * As + c[k + 2] * A2 + c[k + 3] * A3

    R = block(12) + c[16] * A4
    R = block(8) + _mm(A4, R)
    R = block(4) + _mm(A4, R)
    return block(0) + _mm(A4, R)


def _cmm(Ar, Ai, Br, Bi):
    """Complex matmul via 3 real multiplications (Karatsuba):
    P1 = Ar Br, P2 = Ai Bi, P3 = (Ar+Ai)(Br+Bi);
    real = P1 - P2, imag = P3 - P1 - P2.
    XLA lowers a complex matmul to 4 real matmuls; this saves 25% of the
    MXU work in the expm hot path at ~1 extra ulp of f32 error."""
    P1 = _mm(Ar, Br)
    P2 = _mm(Ai, Bi)
    P3 = _mm(Ar + Ai, Br + Bi)
    return P1 - P2, P3 - P1 - P2


def _taylor16_3m(Ar, Ai, Ir):
    """Float-plane Taylor-16 PS evaluation with 3-mult complex matmuls."""
    c = [float(v) for v in _INVFACT]
    A2r, A2i = _cmm(Ar, Ai, Ar, Ai)
    A3r, A3i = _cmm(A2r, A2i, Ar, Ai)
    A4r, A4i = _cmm(A2r, A2i, A2r, A2i)

    def block(k):
        return (c[k] * Ir + c[k + 1] * Ar + c[k + 2] * A2r + c[k + 3] * A3r,
                c[k + 1] * Ai + c[k + 2] * A2i + c[k + 3] * A3i)

    Rr, Ri = block(12)
    Rr = Rr + c[16] * A4r
    Ri = Ri + c[16] * A4i
    for k in (8, 4, 0):
        Pr, Pi = _cmm(A4r, A4i, Rr, Ri)
        Br, Bi = block(k)
        Rr, Ri = Br + Pr, Bi + Pi
    return Rr, Ri


def _square_3m(Rr, Ri, s, max_squarings):
    def body(i, carry):
        Rr, Ri = carry
        Sr, Si = _cmm(Rr, Ri, Rr, Ri)
        do = (i < s)[..., None, None]
        return jnp.where(do, Sr, Rr), jnp.where(do, Si, Ri)
    return jax.lax.fori_loop(0, max_squarings, body, (Rr, Ri))


@partial(jax.jit, static_argnames=("max_squarings", "method"))
def expm(A: jnp.ndarray, max_squarings: int = 12,
         method: str = "auto") -> jnp.ndarray:
    """exp(A) for A of shape (..., D, D), complex or real.

    Batched over leading dims. `max_squarings` bounds the masked squaring
    loop; every trip is a full batched matmul, so pass a tight bound when
    the operand norms are known host-side (the default 12 covers
    ||A||_1 up to ~2.2e4/7.4e3, far beyond any segment Liouvillian).

    method: "pade13" | "taylor16" | "auto" (taylor16 for 32-bit dtypes —
    matmul-only, no TPU-hostile LU solve; pade13 for 64-bit).
    """
    A = jnp.asarray(A)
    if method == "auto":
        if A.dtype == jnp.complex64:
            method = "taylor16_3m"
        elif A.dtype == jnp.float32:
            # real input: plain Taylor-16 (6 REAL matmuls) — the 3m
            # float-plane path would burn 3 matmuls per product on a
            # zero imaginary plane
            method = "taylor16"
        else:
            method = "pade13"
    D = A.shape[-1]

    if method == "taylor16_3m":
        # float-plane path: every complex matmul costs 3 real matmuls
        # instead of XLA's 4 — ~25% less MXU work in the hot loop
        As, s = _scale(A, _THETA16, max_squarings)
        rdt = jnp.float32 if A.dtype == jnp.complex64 else jnp.float64
        Ar = jnp.real(As).astype(rdt)
        Ai = jnp.imag(As).astype(rdt)
        Ir = jnp.broadcast_to(jnp.eye(D, dtype=rdt), Ar.shape)
        Rr, Ri = _taylor16_3m(Ar, Ai, Ir)
        Rr, Ri = _square_3m(Rr, Ri, s, max_squarings)
        return (Rr + 1j * Ri).astype(A.dtype)

    I = jnp.broadcast_to(jnp.eye(D, dtype=A.dtype), A.shape)
    if method == "taylor16":
        As, s = _scale(A, _THETA16, max_squarings)
        R = _taylor16(As, I)
    elif method == "pade13":
        As, s = _scale(A, _THETA13, max_squarings)
        R = _pade13(As, I)
    else:
        raise ValueError(f"Unknown expm method '{method}'; expected "
                         f"'pade13', 'taylor16', 'taylor16_3m' or 'auto'")
    return _square(R, s, max_squarings)


@partial(jax.jit, static_argnames=("max_squarings",))
def expm_planes(Ar: jnp.ndarray, Ai: jnp.ndarray,
                max_squarings: int = 12):
    """exp(Ar + i Ai) on float PLANES — the complex dtype never exists on
    device. Returns (Rr, Ri).

    This is the on-device f64 verification path: TPU rejects C128
    outright but emulates F64 (measured matmul accuracy ~7e-14), so the
    1e-8 mesolve-parity target (reference: rydberg_gates/simulation.py:687
    tolerances) can be met on the chip itself by running the same
    Taylor-16 scaling-and-squaring kernel on two f64 planes. Works for
    f32 planes too (then it is exactly the taylor16_3m path of expm).

    For f64 planes the scaling threshold tightens to theta = 1.0
    (truncation e/17! ~ 7.6e-15, vs 4e-10 at the f32 default 1.8) at the
    cost of typically one extra squaring — callers passing a
    plan_squaring_bound computed for theta = 1.8 should add 1."""
    theta = _THETA16 if Ar.dtype == jnp.float32 else 1.0
    absA = jnp.sqrt(Ar * Ar + Ai * Ai)
    norm1 = jnp.max(jnp.sum(absA, axis=-2), axis=-1)
    s_float = jnp.ceil(jnp.log2(jnp.maximum(norm1 / theta, 1.0)))
    s = jnp.clip(s_float, 0, max_squarings).astype(jnp.int32)
    scale = jnp.exp2(-s.astype(Ar.dtype))
    As_r = Ar * scale[..., None, None]
    As_i = Ai * scale[..., None, None]
    D = Ar.shape[-1]
    Ir = jnp.broadcast_to(jnp.eye(D, dtype=Ar.dtype), As_r.shape)
    Rr, Ri = _taylor16_3m(As_r, As_i, Ir)
    return _square_3m(Rr, Ri, s, max_squarings)


def expm_apply(A: jnp.ndarray, X: jnp.ndarray, max_squarings: int = 12) -> jnp.ndarray:
    """exp(A) @ X without materializing exp(A) separately (same cost here;
    provided for API symmetry with sparse/Krylov backends added later)."""
    return _mm(expm(A, max_squarings=max_squarings), X)


def chained_product(U: jnp.ndarray) -> jnp.ndarray:
    """Ordered product U[n-1] @ ... @ U[1] @ U[0] via log-depth pairwise
    reduction (tree contraction) — O(log n) sequential batched matmuls
    instead of an O(n) scan. U has shape (n, ..., D, D).

    Complex inputs run on float planes with 3-mult (Karatsuba) products:
    at HIGHEST matmul precision the tree is MXU-bound, so saving one of
    XLA's four real products per complex matmul is a direct ~25% win
    (round 1 measured +1.3% only because the old per-segment-expm engine
    was HBM-bound)."""
    if jnp.iscomplexobj(U):
        Rr, Ri = jnp.real(U), jnp.imag(U)
        n = U.shape[0]
        while n > 1:
            half = n // 2
            er, ei = Rr[0:2 * half:2], Ri[0:2 * half:2]
            orr, oi = Rr[1:2 * half:2], Ri[1:2 * half:2]
            pr, pi = _cmm(orr, oi, er, ei)  # later applied after earlier
            if n % 2 == 1:
                Rr = jnp.concatenate([pr, Rr[-1:]], axis=0)
                Ri = jnp.concatenate([pi, Ri[-1:]], axis=0)
            else:
                Rr, Ri = pr, pi
            n = Rr.shape[0]
        return (Rr[0] + 1j * Ri[0]).astype(U.dtype)
    n = U.shape[0]
    while n > 1:
        half = n // 2
        even = U[0:2 * half:2]
        odd = U[1:2 * half:2]
        prod = _mm(odd, even)  # later segment applied after earlier
        if n % 2 == 1:
            U = jnp.concatenate([prod, U[-1:]], axis=0)
        else:
            U = prod
        n = U.shape[0]
    return U[0]


__all__ = ["expm", "expm_apply", "expm_planes", "chained_product"]
