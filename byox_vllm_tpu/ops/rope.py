"""Rotary position embedding (half-split / GPT-NeoX convention).

Parity with the reference (nanovllm/layers/rotary_embedding.py:7-48): rotation
in fp32, half-split layout (x1 = first half, x2 = second half of head_dim).
Unlike the reference's precomputed [max_pos, rotary_dim] cos/sin table, the
angles are computed on the fly inside the jitted step from the positions —
a few VPU flops instead of an HBM gather, and no table to shard.
"""

import jax.numpy as jnp


def rope_inv_freq(head_dim: int, theta: float) -> jnp.ndarray:
    """[head_dim/2] fp32 inverse frequencies."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta**exponents)


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray):
    """positions [..., ] int -> cos, sin of shape [..., head_dim/2] fp32."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [..., H, head_dim]; cos/sin [..., head_dim/2] (broadcast over H)."""
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    c = cos[..., None, :]
    s = sin[..., None, :]
    y1 = x1 * c - x2 * s
    y2 = x2 * c + x1 * s
    return jnp.concatenate([y1, y2], axis=-1).astype(x.dtype)
