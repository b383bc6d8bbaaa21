"""Complex-safe host<->device transfer helpers.

Some experimental TPU runtimes (the tunneled 'axon' PJRT backend in this
environment) cannot serialize complex buffers across the host<->device
boundary: host->device complex transfers fail *asynchronously* (the error
surfaces at the first dependent fetch) and device->host complex fetches
fail directly. On-device complex arithmetic is fully supported.

These helpers move complex data as float real/imag planes and combine /
split on device, and are no-ops in spirit on backends with native complex
transfer (CPU, standard TPU).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


@jax.jit
def _split(z):
    return jnp.real(z), jnp.imag(z)


def _needs_plane_transfer() -> bool:
    """The tunneled 'axon' PJRT plugin registers itself as plain 'tpu' but
    cannot serialize complex buffers across the tunnel, and a failed complex
    transfer WEDGES the device stream (later ops hang) — so this cannot be
    probed at runtime. Detect via the plugin selection env var; override
    with NQS_COMPLEX_PLANE_TRANSFER=0/1 if needed."""
    import os
    override = os.environ.get("NQS_COMPLEX_PLANE_TRANSFER")
    if override is not None:
        return override not in ("0", "false", "False")
    return "axon" in os.environ.get("JAX_PLATFORMS", "")


def device_put_complex(x: np.ndarray, dtype=None) -> jax.Array:
    """Host complex array -> device complex array (plane transfer when the
    backend requires it)."""
    x = np.asarray(x)
    if dtype is not None:
        x = x.astype(dtype)
    if not np.iscomplexobj(x):
        return jnp.asarray(x)
    if not _needs_plane_transfer():
        return jnp.asarray(x)
    rdt = np.float32 if x.dtype == np.complex64 else np.float64
    re = jnp.asarray(np.ascontiguousarray(x.real, dtype=rdt))
    im = jnp.asarray(np.ascontiguousarray(x.imag, dtype=rdt))
    return _combine(re, im)


def device_get_complex(z: jax.Array) -> np.ndarray:
    """Device complex array -> host numpy (plane fetch when required)."""
    if not jnp.iscomplexobj(z):
        return np.asarray(jax.device_get(z))
    if not _needs_plane_transfer():
        return np.asarray(jax.device_get(z))
    re, im = _split(z)
    return (np.asarray(jax.device_get(re))
            + 1j * np.asarray(jax.device_get(im)))


def enable_high_precision_matmul():
    """The default TPU matmul precision truncates mantissas (bf16 passes),
    which is far too coarse for 1e-8-grade Lindblad propagators; force full
    f32 accumulation."""
    jax.config.update("jax_default_matmul_precision", "highest")


__all__ = ["device_put_complex", "device_get_complex",
           "enable_high_precision_matmul"]
