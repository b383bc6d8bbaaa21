"""Pallas TPU kernel for the real-rep phase-frame scan (gate engine).

The production gate engine (solver/real_rep.evolve_real_phased_many,
the 501k sims/s path) evolves v (B, S, n) through n_steps=300 segments:
per step a frame rotation (VPU elementwise) then a shared-weight matvec
v @ U^T with n=81. Under XLA's scan each step round-trips the full
(B*S, n) state through HBM (~2 x 42 MB per step at the bench shape, ~25
GB per batch), which is the measured bottleneck once the matmul is only
(B*S, 81) @ (81, 81) — VERDICT r4 #7 asks for the c2v treatment:

This kernel keeps a BLOCK of the state resident in VMEM for the WHOLE
scan: grid over schedule blocks, U (81x81, 26 KB) and the per-column
rotation constants resident, and the 300-step fori_loop INSIDE the
kernel. HBM traffic drops to one read of v0 + dphi and one write of the
final state (~0.3 GB total vs ~25 GB).

Rotation without unaligned lane slicing
---------------------------------------
The real-rep layout is [D diag | P re | P im] with D=9, P=36 — slicing
at lane offsets 9/45 would force Mosaic relayouts every step. Instead
the rotation
    re' = c re - s im,  im' = s re + c im,  c/s = cos/sin(theta * cq)
is expressed with two LANE ROLLS and precomputed per-column masks:
    partner  = sel_im * roll(v, +P) - sel_re * roll(v, -P)
    v'       = cos(theta*mult) * v + sin(theta*mult) * partner
where mult[j] = cq charge of column j (0 on diag columns, so c=1, s=0
and diag columns pass through untouched), roll(v, -P) brings each re
column its im partner and roll(v, +P) vice versa. All elementwise +
two intra-register rotates — no unaligned slices, no concat.

Same runtime-probe discipline as qec/bp_kernels.py: probe the REAL
kernel once outside any trace; fall back to the XLA scan where Mosaic
is unavailable. Parity: the kernel computes the identical sequence of
f32 HIGHEST operations, differing from the XLA scan only in reduction
association — tests pin agreement to f32 roundoff.

Reference role: the gate engine this accelerates implements the
reference's 12-step simulation loop (reference:
src/qpu_simulator/micro_physics/neutral_atoms/rydberg_gates/
simulation.py:2534) on TPU.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

try:  # pallas optional at import time (older jax, CPU-only installs)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _rotation_constants(cq, D: int, P: int):
    """Per-column (1, n) constants: angle multiplier and partner masks.
    Built with jnp (cq may be traced); they become kernel inputs."""
    zeros_d = jnp.zeros((D,), jnp.float32)
    cqf = cq.astype(jnp.float32)
    mult = jnp.concatenate([zeros_d, cqf, cqf])[None, :]
    ones_p = jnp.ones((P,), jnp.float32)
    zeros_p = jnp.zeros((P,), jnp.float32)
    sel_re = jnp.concatenate([zeros_d, ones_p, zeros_p])[None, :]
    sel_im = jnp.concatenate([zeros_d, zeros_p, ones_p])[None, :]
    return mult, sel_re, sel_im


def _scan_kernel(u_ref, mult_ref, selre_ref, selim_ref, dphi_ref, v0_ref,
                 out_ref, *, n_steps: int, P: int, n: int):
    """One schedule-block: evolve v (R, n) through all n_steps in VMEM."""
    u = u_ref[...]                      # (n, n) = U^T, resident
    mult = mult_ref[...]                # (1, n)
    sel_re = selre_ref[...]
    sel_im = selim_ref[...]
    v = v0_ref[...]                     # (R, n)
    dph = dphi_ref[...]                 # (R, n_steps), carried + rolled

    n_lanes = dph.shape[1]

    def body(_, carry):
        v, dph = carry
        # Mosaic cannot statically prove a DYNAMIC lane index aligned,
        # so instead of dphi[:, k] the angle block is carried and lane-
        # rolled LEFT by one column per step (static shift): column 0
        # always holds the current step's angles
        th = dph[:, 0:1]                           # (R, 1)
        ang = th * mult                            # (R, n)
        c = jnp.cos(ang)
        s = jnp.sin(ang)
        # pltpu.roll requires shift >= 0: left-roll by P == roll n - P
        shl = pltpu.roll(v, n - P, 1)              # im -> re positions
        shr = pltpu.roll(v, P, 1)                  # re -> im positions
        partner = sel_im * shr - sel_re * shl
        vr = c * v + s * partner
        v = jax.lax.dot_general(
            vr, u, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return v, pltpu.roll(dph, n_lanes - 1, 1)

    v, _ = jax.lax.fori_loop(0, n_steps, body, (v, dph))
    out_ref[...] = v


@partial(jax.jit, static_argnames=("D", "P", "block_rows", "interpret"))
def evolve_real_phased_many_pallas(U_real, cq, phases_bn, x0s, D, P,
                                   block_rows: int = 1024,
                                   interpret: bool = False):
    """Drop-in twin of real_rep.evolve_real_phased_many (same contract:
    U_real (n, n); cq (P,); phases_bn (B, n_seg); x0s (S, n) shared
    initial coords; returns (B, S, n) f32), with the scan VMEM-resident.

    The first/last frame rotations and the dphi row expansion stay in
    XLA (one-time, fused); only the n_steps-long hot loop is the kernel.
    """
    from .real_rep import _rotate
    S, n = x0s.shape
    B, n_seg = phases_bn.shape
    f32 = jnp.float32
    cq = cq.astype(f32)
    ph = phases_bn.astype(f32)
    dphi = jnp.concatenate(
        [jnp.zeros((B, 1), f32), ph[:, :-1] - ph[:, 1:]], axis=1)
    v0 = jnp.broadcast_to(x0s[None].astype(f32), (B, S, n))
    v0 = _rotate(v0, -ph[:, 0, None], cq, D, P)

    R = B * S
    rows_blk = min(block_rows, R)
    assert R % rows_blk == 0 and rows_blk % S == 0
    # per-row angle stream: schedules repeat over their S state rows
    dphi_rows = jnp.repeat(dphi, S, axis=0)                    # (R, n_seg)
    mult, sel_re, sel_im = _rotation_constants(cq, D, P)

    out = pl.pallas_call(
        partial(_scan_kernel, n_steps=n_seg, P=P, n=n),
        grid=(R // rows_blk,),
        in_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0)),            # U^T
            pl.BlockSpec((1, n), lambda i: (0, 0)),            # mult
            pl.BlockSpec((1, n), lambda i: (0, 0)),            # sel_re
            pl.BlockSpec((1, n), lambda i: (0, 0)),            # sel_im
            pl.BlockSpec((rows_blk, n_seg), lambda i: (i, 0)),  # dphi
            pl.BlockSpec((rows_blk, n), lambda i: (i, 0)),      # v0
        ],
        out_specs=pl.BlockSpec((rows_blk, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, n), f32),
        interpret=interpret,
    )(U_real.T.astype(f32), jnp.asarray(mult), jnp.asarray(sel_re),
      jnp.asarray(sel_im), dphi_rows, v0.reshape(R, n))

    v = out.reshape(B, S, n)
    return _rotate(v, ph[:, -1, None], cq, D, P)


# =============================================================================
# runtime probe (same discipline as qec/bp_kernels.bp_pallas_available)
# =============================================================================

_PROBE: dict = {}


def reset_scan_pallas_probe() -> None:
    _PROBE.clear()


def scan_pallas_available() -> bool:
    """Cached runtime probe of the REAL scan kernel: compile + run a tiny
    instance outside any trace. Must never be called under jit tracing
    (callers gate at decoder/engine INIT, like DemBPDecoder does)."""
    if "ok" in _PROBE:
        return _PROBE["ok"]
    if not _HAVE_PALLAS:
        _PROBE["ok"] = False
        return False
    try:
        import jax.core
        if isinstance(jnp.zeros(()), jax.core.Tracer):  # pragma: no cover
            raise RuntimeError("scan_pallas_available called under trace")
    except Exception:
        pass
    try:
        D, Pp = 2, 3
        n = D + 2 * Pp
        rng = np.random.default_rng(0)
        U = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
        cq = jnp.asarray(np.arange(1, Pp + 1, dtype=np.float32))
        ph = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32))
        x0 = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
        out = evolve_real_phased_many_pallas(U, cq, ph, x0, D, Pp,
                                             block_rows=8)
        ok = bool(np.all(np.isfinite(np.asarray(out))))
        _PROBE["ok"] = ok
    except Exception:
        _PROBE["ok"] = False
    return _PROBE["ok"]


__all__ = ["evolve_real_phased_many_pallas", "scan_pallas_available",
           "reset_scan_pallas_probe"]
