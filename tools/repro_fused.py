"""Minimal on-chip repro for the fused-store v3 decode kernel Mosaic error.

Calls paged_decode_attention_v3 directly with store operands at the 0.6B
geometry that tools/tpu_validation.py's fused_parity step exercises.
"""

import os

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp
import numpy as np

from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v3

B, NH, NKV, HD = 64, 16, 8, 128
BS = 32  # block_size
W = 8  # table width (pages)
S = 4096  # pool slots
F = NKV * HD

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, NH, HD)), jnp.bfloat16)
k_pool = jnp.asarray(rng.standard_normal((S, F)), jnp.bfloat16)
v_pool = jnp.asarray(rng.standard_normal((S, F)), jnp.bfloat16)
tables = jnp.asarray(rng.integers(0, S // BS, (B, W)), jnp.int32)
ctx = jnp.asarray(rng.integers(1, W * BS, (B,)), jnp.int32)
store_slots = jnp.asarray(rng.integers(0, S, (B,)), jnp.int32)
k_store = jnp.asarray(rng.standard_normal((B, F)), jnp.bfloat16)
v_store = jnp.asarray(rng.standard_normal((B, F)), jnp.bfloat16)

out = paged_decode_attention_v3(
    q, k_pool, v_pool, tables, ctx,
    block_size=BS, scale=HD ** -0.5,
    store_slots=store_slots, k_store=k_store, v_store=v_store,
)
o, kp, vp = out
jax.block_until_ready(o)
print("fused-store kernel OK", o.shape, kp.shape)
