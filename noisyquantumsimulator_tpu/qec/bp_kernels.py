"""Pallas TPU kernel for the BP check-node update (min-sum c2v).

The slot-layout min-sum kernel (ldpc._bp_slots) is HBM-bandwidth-bound,
and its check-node update is the single most expensive op: XLA
materializes the (w_max, n_chk, S) sign/magnitude/is-min intermediates
in HBM, so one c2v costs ~6 passes over the message tensor (measured
27.5 ms/iter at S=65k on the gross-code rounds=3 DEM, bf16 — ~14% of
the v5e's HBM bandwidth). This kernel computes the whole update —
min1/min2, unique-min tie rule, sign product, syndrome sign, extrinsic
scale — in VMEM per (check-tile, shot-tile) block: exactly ONE HBM read
of the messages and ONE write of the extrinsics (measured 3.3 ms/iter,
8.3x; see docs/TPU_ENGINES.md).

The variable-node update stays in XLA: its two static row-permutations
do not lower in Mosaic on this backend (probed 2026-08-19: jnp.take /
take_along_axis inside a kernel fail to lower or crash the remote
compile helper), and XLA's gather + MXU one-hot forms cover it.

Reference role: BP-for-LDPC decode throughput,
/root/reference/src/qpu_simulator/architecture/qec/decoders.py:9-11.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

try:  # pallas optional at import time (older jax, CPU-only installs)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _c2v_kernel(msg_ref, sgn_syn_ref, out_ref, *, scale: float):
    """One (w_max, BC, BS) message block -> extrinsic block, all VMEM.

    Mirrors ldpc._bp_slots.c2v op-for-op (same tie rule: an edge holding
    the UNIQUE minimum sees min2; tied minima all see min1; padding
    slots carry +big so they never win the min and their sign is +1)."""
    w = msg_ref.shape[0]
    dt = msg_ref.dtype
    f32 = jnp.float32
    big = jnp.asarray(1e30, f32)
    one = jnp.ones((), f32)
    # Mosaic lowers neither rank-3 reductions nor reduce_prod, and bf16
    # compare/bool ops crash this backend's compile helper (probed
    # 2026-08-19), so: statically-unrolled 2D slab passes (w <= ~26),
    # all arithmetic upcast to f32 in registers — HBM traffic stays in
    # the storage dtype, which is where the bandwidth win lives. Pass 1
    # tracks running (min1, min2, tie count, sign product); pass 2
    # emits each slab's extrinsic. On ties min2 drifts to min1, which
    # is unobservable: ext uses min2 only when cnt == 1.
    m0 = msg_ref[0].astype(f32)
    mag1 = jnp.abs(m0)                                 # running min1
    mag2 = jnp.full_like(mag1, big)                    # running min2
    cnt = jnp.ones_like(mag1)                          # minima count
    prod = jnp.where(m0 < 0, -one, one)
    for i in range(1, w):
        mi = msg_ref[i].astype(f32)
        mag = jnp.abs(mi)
        lt = mag < mag1
        eq = mag == mag1
        mag2 = jnp.where(lt, mag1, jnp.minimum(mag2, mag))
        mag1 = jnp.where(lt, mag, mag1)
        cnt = jnp.where(lt, one, jnp.where(eq, cnt + one, cnt))
        prod = prod * jnp.where(mi < 0, -one, one)
    prod = prod * sgn_syn_ref[...].astype(f32)
    unique = cnt == one
    sc = jnp.asarray(scale, f32)
    for i in range(w):
        mi = msg_ref[i].astype(f32)
        mag = jnp.abs(mi)
        is1 = mag == mag1
        ext_min = jnp.where(is1 & unique, mag2, mag1)
        sgn_i = jnp.where(mi < 0, -one, one)
        out_ref[i] = (sc * prod * sgn_i * ext_min).astype(dt)


@partial(jax.jit, static_argnames=("scale", "interpret"))
def c2v_pallas(msg3: jnp.ndarray, sgn_syn: jnp.ndarray, scale: float,
               interpret: bool = False) -> jnp.ndarray:
    """msg3 (w_max, n_chk, S), sgn_syn (n_chk, S) -> ext (w_max, n_chk, S).

    Caller guarantees the shape contract (c2v_pallas_supported)."""
    w, n_chk, S = msg3.shape
    sub = 16 if msg3.dtype == jnp.bfloat16 else 8
    BC = sub if n_chk % sub == 0 else n_chk
    # VMEM budget: the kernel holds ~6 block-sized live values (in, out,
    # sgn, mag, is1, ext terms); keep w*BC*BS*dtype*6 well under ~8 MB
    BS = min(512 if BC <= 32 else 128, S)
    grid = (n_chk // BC, S // BS)
    mspec = pl.BlockSpec((w, BC, BS), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((BC, BS), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_c2v_kernel, scale=scale),
        grid=grid,
        in_specs=[mspec, sspec],
        out_specs=mspec,
        out_shape=jax.ShapeDtypeStruct(msg3.shape, msg3.dtype),
        interpret=interpret,
    )(msg3, sgn_syn)


def c2v_pallas_supported(n_chk: int, S: int, dtype) -> bool:
    """Shape contract: the (BC, BS) block tiling must divide evenly and
    respect the dtype's min sublane count (bf16 needs 16)."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    return (S % 128 == 0 and S >= 128
            and (n_chk % sub == 0 or n_chk <= 256)
            and dtype in (jnp.bfloat16, jnp.float32))


_PROBE_CACHE: dict = {}
_PERMANENT_MARKERS = ("Mosaic", "mosaic", "lowering", "Unsupported",
                      "unsupported", "NotImplemented", "UNIMPLEMENTED",
                      "custom_call")


def reset_bp_pallas_probe() -> None:
    _PROBE_CACHE.clear()


def bp_pallas_available() -> bool:
    """Cached runtime probe of the REAL c2v kernel (same discipline as
    ops.expm_pallas.pallas_available: probe the production kernel, skip
    inside traces, cache False only for permanent lowering failures)."""
    if not _PALLAS_OK or os.environ.get("NQS_DISABLE_PALLAS"):
        return False
    if "ok" in _PROBE_CACHE:
        return _PROBE_CACHE["ok"]
    try:
        if not jax.core.trace_state_clean():
            return False  # inside a trace: fall back, do NOT cache
    except Exception:
        pass
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            _PROBE_CACHE["ok"] = False
            return False
        w, n_chk, S = 3, 16, 128
        m = jnp.full((w, n_chk, S), 2.0, jnp.bfloat16)
        sgn = jnp.ones((n_chk, S), jnp.bfloat16)
        ext = c2v_pallas(m, sgn, 0.75)
        # all-equal magnitudes tie -> every edge sees scale * min1 = 1.5
        ok = abs(float(ext[0, 0, 0]) - 1.5) < 1e-2
        _PROBE_CACHE["ok"] = bool(ok)
    except Exception as e:
        msg = f"{type(e).__name__}: {e}"
        if any(t in msg for t in _PERMANENT_MARKERS):
            _PROBE_CACHE["ok"] = False
        return False  # transient: retry on next call
    return _PROBE_CACHE["ok"]


__all__ = ["c2v_pallas", "c2v_pallas_supported", "bp_pallas_available",
           "reset_bp_pallas_probe"]
