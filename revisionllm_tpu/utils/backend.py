"""Backend classification for quantized-serving defaults.

The lossy serving defaults (W8A16 Pallas kernels, W8A8 prefill, KV8 cache)
engage only on backends we have validated on silicon. An ALLOWLIST — not a
"not cpu/gpu" denylist — so an unknown backend (METAL, a future PJRT plugin)
defaults to exact numerics rather than silently lossy ones.
"""

from __future__ import annotations

_TPU_BACKENDS = ("tpu", "axon")  # native TPU PJRT + the axon TPU relay


def is_tpu_backend() -> bool:
    """True when the default JAX backend is a known TPU target."""
    import jax

    return jax.default_backend() in _TPU_BACKENDS
