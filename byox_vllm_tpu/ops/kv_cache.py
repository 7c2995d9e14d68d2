"""Paged KV-cache pool update (the TPU equivalent of the reference's Triton
``store_kvcache`` scatter, nanovllm/layers/attention.py:10-49).

The pool for one layer is a flat slot array ``[num_slots, num_kv_heads,
head_dim]`` with slot = block_id * block_size + offset. New K/V rows are
scattered at ``slot_mapping``; slot -1 marks padding and is dropped by the
scatter (the reference kernel skips slot==-1 the same way). XLA lowers this
scatter efficiently on TPU; a fused Pallas path writes the cache inside the
attention kernel instead (ops/paged_attention.py).
"""

import jax.numpy as jnp


def write_kv(
    k_pool: jnp.ndarray,  # [S, nkv, hd]
    v_pool: jnp.ndarray,  # [S, nkv, hd]
    k_new: jnp.ndarray,  # [N, nkv, hd]
    v_new: jnp.ndarray,  # [N, nkv, hd]
    slot_mapping: jnp.ndarray,  # [N] int32, -1 = padding (dropped)
):
    # JAX wraps negative indices; remap padding (-1) to an out-of-bounds
    # sentinel so mode="drop" actually drops it.
    num_slots = k_pool.shape[0]
    slots = jnp.where(slot_mapping < 0, num_slots, slot_mapping)
    k_pool = k_pool.at[slots].set(k_new.astype(k_pool.dtype), mode="drop")
    v_pool = v_pool.at[slots].set(v_new.astype(v_pool.dtype), mode="drop")
    return k_pool, v_pool


def gather_kv(pool: jnp.ndarray, block_tables: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Gather per-sequence K or V from the pool.

    pool [S, nkv, hd]; block_tables [B, W] (-1 = padding) ->
    [B, W * block_size, nkv, hd]; padding slots gather zeros.
    """
    b, w = block_tables.shape
    num_slots = pool.shape[0]
    offsets = jnp.arange(block_size, dtype=block_tables.dtype)
    slots = block_tables[:, :, None] * block_size + offsets[None, None, :]
    # padding blocks (-1) -> out-of-bounds sentinel (negatives would wrap)
    slots = jnp.where(block_tables[:, :, None] < 0, num_slots, slots).reshape(b, w * block_size)
    return jnp.take(pool, slots, axis=0, mode="fill", fill_value=0)
