"""RMSNorm (functional).

Parity with the reference RMSNorm (nanovllm/layers/layernorm.py:5-50): fp32
accumulation, scale applied after casting back. The reference's fused
add+RMSNorm residual trick (`add_rms_forward`) is unnecessary under XLA — the
residual add fuses into the norm automatically — so the model just writes
``h = h + delta`` and calls ``rms_norm``.
"""

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Normalize over the last axis. Accumulates in fp32, returns x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * lax.rsqrt(var + eps)
    return (normed.astype(x.dtype) * weight).astype(x.dtype)
