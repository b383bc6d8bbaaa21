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


def pallas_available() -> bool:
    """One-time cached RUNTIME probe: compile + run a trivial kernel.

    A static platform check is not enough here: tunneled TPU backends
    (axon) could not lower Mosaic custom-calls when this module was
    first written (2026-08-16: remote compile helper exited 1) but CAN
    now (re-probed 2026-08-19: the full squaring kernel compiles and
    runs at 0.29 ms/call on the tunneled v5e). Probing an actual
    pallas_call is the only check that tracks the backend's real
    capability; the result is cached per process."""
    if not _PALLAS_OK or os.environ.get("NQS_DISABLE_PALLAS"):
        return False
    if "ok" in _PROBE_CACHE:
        return _PROBE_CACHE["ok"]
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            _PROBE_CACHE["ok"] = False
            return False

        def _probe_kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] + jnp.float32(1.0)

        x = jnp.zeros((8, 128), jnp.float32)
        y = pl.pallas_call(
            _probe_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
        _PROBE_CACHE["ok"] = bool(abs(float(y[0, 0]) - 1.0) < 1e-6)
    except Exception:  # Mosaic lowering/compile unsupported here
        _PROBE_CACHE["ok"] = False
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


__all__ = ["fused_masked_squaring", "pallas_available"]
