"""Pallas TPU kernel: fused masked squaring chain for the batched expm.

The scaling-and-squaring tail of ops/expm.py is a fixed-trip masked loop:
every iteration reads and writes the full (B, D, D) complex operand from
HBM even for batch elements whose squaring budget `s` is exhausted. This
kernel keeps each batch element's matrix resident in VMEM across ALL
`max_squarings` iterations — one HBM read + one write per element instead
of one round trip per iteration — and performs the complex product with
the 3-real-multiplication (Karatsuba) form so the MXU does 3 f32 matmuls
per squaring instead of 4.

Complex data travels as separate float planes (the axon TPU tunnel cannot
move complex buffers anyway; see utils/transfer.py).

Use `fused_masked_squaring(R, s, max_squarings)` — it dispatches to the
Pallas kernel on TPU and to the plain lax implementation elsewhere (or
when NQS_DISABLE_PALLAS is set).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

try:  # pallas is optional at import time (older jax, CPU-only installs)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _kernel(sr, rr_ref, ri_ref, or_ref, oi_ref, *, max_squarings: int):
    """One batch element per grid program; matrix stays in VMEM."""
    rr = rr_ref[0]
    ri = ri_ref[0]
    s = sr[pl.program_id(0), 0]

    def body(i, carry):
        rr, ri = carry
        # Karatsuba complex square: 3 real matmuls
        p1 = jnp.dot(rr, rr, preferred_element_type=jnp.float32)
        p2 = jnp.dot(ri, ri, preferred_element_type=jnp.float32)
        p3 = jnp.dot(rr + ri, rr + ri, preferred_element_type=jnp.float32)
        nr = p1 - p2
        ni = p3 - p1 - p2
        do = i < s
        return (jnp.where(do, nr, rr), jnp.where(do, ni, ri))

    rr, ri = jax.lax.fori_loop(0, max_squarings, body, (rr, ri))
    or_ref[0] = rr
    oi_ref[0] = ri


@partial(jax.jit, static_argnames=("max_squarings", "interpret"))
def _pallas_squaring(Rr, Ri, s, max_squarings: int, interpret: bool = False):
    B, D, _ = Rr.shape
    grid = (B,)
    bspec = pl.BlockSpec((1, D, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    # SMEM blocks must cover the full array on TPU; index by program id
    sspec = pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    out_r, out_i = pl.pallas_call(
        partial(_kernel, max_squarings=max_squarings),
        grid=grid,
        in_specs=[sspec, bspec, bspec],
        out_specs=(bspec, bspec),
        out_shape=(jax.ShapeDtypeStruct((B, D, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, D, D), jnp.float32)),
        interpret=interpret,
    )(s.reshape(B, 1), Rr, Ri)
    return out_r, out_i


_PROBE_CACHE: dict[str, bool] = {}

# error-message markers of a PERMANENT capability gap (Mosaic cannot
# lower / the backend rejects the custom-call). Anything else — backend
# still initializing, tunnel hiccup, device busy — is treated as
# transient and NOT cached, so one bad first call cannot disable the
# fast path for the whole process (ADVICE r3, low).
_PERMANENT_MARKERS = ("Mosaic", "mosaic", "lowering", "Unsupported",
                      "unsupported", "NotImplemented", "UNIMPLEMENTED",
                      "custom_call")


def reset_pallas_probe() -> None:
    """Clear the cached probe result (e.g. after backend re-init)."""
    _PROBE_CACHE.clear()


def pallas_available() -> bool:
    """Cached RUNTIME probe: compile + run the REAL squaring kernel.

    A static platform check is not enough here: tunneled TPU backends
    (axon) could not lower Mosaic custom-calls when this module was
    first written (2026-08-16: remote compile helper exited 1) but CAN
    now (re-probed 2026-08-19: the full squaring kernel compiles and
    runs at 0.29 ms/call on the tunneled v5e). The probe invokes
    `_pallas_squaring` itself on a B=1, D=81 operand (the dim-3
    superoperator shape) so it exercises everything the production
    kernel needs — grid, SMEM scalar spec, MXU dots, fori_loop — not a
    trivial elementwise kernel a backend could pass while still failing
    the real lowering (ADVICE r3, medium).

    Caching: True caches; False caches only for PERMANENT lowering
    failures. If called while a jax trace is active the probe is
    skipped entirely (returns False, uncached) — running it there would
    concretize a tracer and poison the cache (ADVICE r3, medium)."""
    if not _PALLAS_OK or os.environ.get("NQS_DISABLE_PALLAS"):
        return False
    if "ok" in _PROBE_CACHE:
        return _PROBE_CACHE["ok"]
    try:
        if not jax.core.trace_state_clean():
            return False  # inside a trace: fall back, do NOT cache
    except Exception:
        pass  # API moved: proceed, the except below still protects us
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            _PROBE_CACHE["ok"] = False
            return False
        D = 81
        Rr = 2.0 * jnp.eye(D, dtype=jnp.float32)[None]
        Ri = jnp.zeros((1, D, D), jnp.float32)
        out_r, out_i = _pallas_squaring(Rr, Ri, jnp.ones((1,), jnp.int32),
                                        max_squarings=2)
        ok = (abs(float(out_r[0, 0, 0]) - 4.0) < 1e-4
              and abs(float(out_i[0, 0, 0])) < 1e-4)
        _PROBE_CACHE["ok"] = bool(ok)
    except Exception as e:
        msg = f"{type(e).__name__}: {e}"
        if any(t in msg for t in _PERMANENT_MARKERS):
            _PROBE_CACHE["ok"] = False  # capability gap: remember it
        return False  # transient: retry on the next call
    return _PROBE_CACHE["ok"]


def fused_masked_squaring(R: jnp.ndarray, s: jnp.ndarray,
                          max_squarings: int,
                          force_pallas: bool = False,
                          interpret: bool = False) -> jnp.ndarray:
    """R (B, D, D) complex64, s (B,) int32 -> R^(2^s) elementwise-masked.

    Pallas on TPU (or force_pallas/interpret for testing); plain masked
    lax loop elsewhere."""
    if force_pallas or interpret or pallas_available():
        Rr = jnp.real(R).astype(jnp.float32)
        Ri = jnp.imag(R).astype(jnp.float32)
        out_r, out_i = _pallas_squaring(Rr, Ri, s.astype(jnp.int32),
                                        max_squarings, interpret=interpret)
        return (out_r + 1j * out_i).astype(R.dtype)

    def body(i, Rc):
        do = i < s
        return jnp.where(do[..., None, None], Rc @ Rc, Rc)

    return jax.lax.fori_loop(0, max_squarings, body, R)


__all__ = ["fused_masked_squaring", "pallas_available",
           "reset_pallas_probe"]
