"""Paged causal attention over the KV block pool — XLA-native path.

This is the dense fallback for the reference's flash-attn backends
(nanovllm/layers/attention.py:67-97): one code path covers both varlen
prefill (Tq = bucketed max new tokens) and paged decode (Tq = 1), because
queries always attend to the *pool* (new K/V are scattered into it first).
It is numerically exact and runs on any backend; the Pallas kernels in
ops/paged_attention.py / ops/ragged_prefill.py replace it on TPU for
performance.

Shapes
  q            [B, Tq, nh, hd]
  k/v pool     [S, nkv*hd]  (token-major flat paged pool)
  block_tables [B, W] int32, -1 padding
  context_lens [B]  total tokens (cached prefix + new)
  positions    [B, Tq] absolute position of each query token

Masking: key j of sequence b sits at absolute position j (pool slots are
filled in position order), so the causal+validity mask is simply
``j <= position(q) and j < context_len`` — padded key slots and padded rows
(context_len 0) mask out, matching the reference's slot==-1 / cache_seqlens=0
no-op conventions.
"""

import jax
import jax.numpy as jnp

from byox_vllm_tpu.ops.kv_cache import gather_kv, gather_kv_quant

_NEG_INF = -1e9


def paged_attention(
    q, k_pool, v_pool, block_tables, context_lens, positions, block_size, scale,
    backend: str = "auto",
    kv_scales=None,  # unified [S, 128] bf16 scale pool when the KV pool is int8
):
    """Backend dispatch: Pallas decode kernel on TPU for Tq == 1 (the
    throughput path), XLA dense fallback everywhere else. Tq is a static
    shape, so the branch resolves at trace time."""
    import os

    tq = q.shape[1]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_pallas = backend != "dense" and (backend == "pallas" or on_tpu)
    # both Pallas kernels assume head_dim == one 128-wide lane register;
    # other head dims (64/80/96) Mosaic-fail today -> dense fallback
    use_pallas = use_pallas and q.shape[-1] == 128
    if tq == 1 and use_pallas:
        # v2 (chunked manual-DMA) is the default: measured 422 GB/s at ctx
        # 504 vs 36 GB/s for the (B, W) BlockSpec pipeline (v1), and ~1.4x
        # faster at short contexts too
        if os.environ.get("BYOX_DECODE_KERNEL", "v2") == "v1":
            from byox_vllm_tpu.ops.paged_attention import paged_decode_attention as kernel
        else:
            from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v2 as kernel

        out = kernel(
            q[:, 0], k_pool, v_pool, block_tables, context_lens,
            block_size=block_size, scale=scale, interpret=not on_tpu,
            kv_scales=kv_scales,
        )
        return out[:, None]
    if tq > 1 and use_pallas and tq % min(128, tq) == 0:
        from byox_vllm_tpu.ops.prefill_attention import paged_prefill_attention

        q_lens = context_lens - positions[:, 0]
        return paged_prefill_attention(
            q, k_pool, v_pool, block_tables, context_lens, q_lens,
            block_size=block_size, scale=scale, interpret=not on_tpu,
            kv_scales=kv_scales,
        )
    return paged_attention_dense(
        q, k_pool, v_pool, block_tables, context_lens, positions, block_size, scale,
        kv_scales=kv_scales,
    )


def paged_attention_dense(
    q: jnp.ndarray,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    positions: jnp.ndarray,
    block_size: int,
    scale: float,
    kv_scales=None,
) -> jnp.ndarray:
    b, tq, nh, hd = q.shape
    nkv = k_pool.shape[1] // hd
    group = nh // nkv

    if kv_scales is not None:
        k = gather_kv_quant(k_pool, kv_scales, 0, block_tables, block_size, hd, q.dtype)
        v = gather_kv_quant(v_pool, kv_scales, nkv, block_tables, block_size, hd, q.dtype)
    else:
        k = gather_kv(k_pool, block_tables, block_size, hd)  # [B, K, nkv, hd]
        v = gather_kv(v_pool, block_tables, block_size, hd)
    kk = k.shape[1]

    qg = q.reshape(b, tq, nkv, group, hd)
    scores = jnp.einsum(
        "btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32
    ) * scale  # [B, nkv, g, Tq, K]

    key_pos = jnp.arange(kk, dtype=jnp.int32)
    valid = key_pos[None, :] < context_lens[:, None]  # [B, K]
    causal = key_pos[None, None, :] <= positions[:, :, None]  # [B, Tq, K]
    mask = (valid[:, None, :] & causal)[:, None, None, :, :]  # [B,1,1,Tq,K]

    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jnp.exp(scores - scores.max(axis=-1, keepdims=True))
    probs = probs / (probs.sum(axis=-1, keepdims=True) + 1e-30)
    out = jnp.einsum("bkgts,bskd->btkgd", probs.astype(v.dtype), v)
    return out.reshape(b, tq, nh, hd)
