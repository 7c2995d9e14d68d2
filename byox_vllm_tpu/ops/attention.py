"""Paged causal attention over the merged KV block pool — XLA-native path.

This is the dense fallback for the reference's flash-attn backends
(nanovllm/layers/attention.py:67-97): one code path covers both varlen
prefill (Tq = bucketed max new tokens) and paged decode (Tq = 1), because
queries always attend to the *pool* (new K/V are scattered into it first).
It is numerically exact and runs on any backend; the Pallas kernels in
ops/paged_attention.py / ops/prefill_attention.py replace it on TPU for
performance.

Shapes
  pool         [S, 2*F(+256)]  merged token-major paged pool (ops/kv_cache.py)
  q            [B, Tq, nh, hd]
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

from byox_vllm_tpu.ops.kv_cache import gather_kv

_NEG_INF = -1e9
_WARNED_HEAD_DIM = False


def paged_attention(
    q, pool, block_tables, context_lens, positions, block_size, scale,
    backend: str = "auto",
    window: int | None = None,  # sliding-window attention (Mistral/Qwen2)
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
    if use_pallas and q.shape[-1] != 128:
        use_pallas = False
        global _WARNED_HEAD_DIM
        if on_tpu and not _WARNED_HEAD_DIM:
            _WARNED_HEAD_DIM = True
            from byox_vllm_tpu.utils.logging import logger

            logger.warning(
                "head_dim %d != 128: Pallas attention kernels unavailable, using the "
                "dense fallback (materializes gathered K/V in HBM — expect a large "
                "decode perf cliff at scale)", q.shape[-1],
            )
    if tq == 1 and use_pallas:
        # v3 (chunked manual-DMA, SB sequences per grid step) is the default:
        # v2's per-sequence grid steps left ~0.8 us/seq of fixed cost (the
        # dependent s->exp->pv matmul chain); batching 4 independent chains
        # per step measured 128 vs 157 us at B=128/ctx150/int8 (8B shapes).
        kver = os.environ.get("BYOX_DECODE_KERNEL", "v3")
        b = q.shape[0]
        sb = int(os.environ.get("BYOX_DECODE_SB", "4"))  # grid-step batching
        kwargs = {}
        if kver == "v1" and window is None:
            from byox_vllm_tpu.ops.paged_attention import paged_decode_attention as kernel
        elif (kver == "v2" or b % sb) and window is None:
            from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v2 as kernel
        elif b % 4 == 0:
            # v3 is the only kernel with sliding-window support (band mask +
            # out-of-window page-DMA skip)
            from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v3 as kernel

            kwargs["seqs_per_step"] = sb if b % sb == 0 else 4
            kwargs["window"] = window
        else:
            kernel = None
        if kernel is not None:
            out = kernel(
                q[:, 0], pool, block_tables, context_lens,
                block_size=block_size, scale=scale, interpret=not on_tpu,
                **kwargs,
            )
            return out[:, None]
    if tq > 1 and use_pallas and tq % min(128, tq) == 0:
        from byox_vllm_tpu.ops.prefill_attention import paged_prefill_attention

        q_lens = context_lens - positions[:, 0]
        return paged_prefill_attention(
            q, pool, block_tables, context_lens, q_lens,
            block_size=block_size, scale=scale, interpret=not on_tpu,
            window=window,
        )
    return paged_attention_dense(
        q, pool, block_tables, context_lens, positions, block_size, scale,
        window=window,
    )


def decode_attention_with_tail(
    q,  # [B, nh, hd]
    pool, block_tables,
    pool_ctx,  # [B] tokens resident in the pool (pre-window, EXCLUDES tail)
    k_tail, v_tail,  # [B, T, nkv, hd] float: the window's staged new K/V
    tail_index,  # scalar int32: current step t; tail positions 0..t attend
    block_size, scale,
    backend: str = "auto",
    window: int | None = None,
):
    """Window-staged decode attention: paged attention over the (static)
    pool contents merged with attention over the window's staged tail rows
    via online-softmax stats. This lets the multi-step decode loop defer the
    pool scatter to once per window — within a window the pool is read-only
    and new K/V live in a small bf16 tail buffer (which also means the
    window's freshest tokens attend at full precision even when the pool is
    int8)."""
    b, nh, hd = q.shape
    _, t_max, nkv, _ = k_tail.shape
    group = nh // nkv

    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_pallas = backend != "dense" and (backend == "pallas" or on_tpu)
    if use_pallas and hd == 128:
        # the kernel processes the tail as one extra online-softmax chunk
        # in-kernel — an XLA-side merge costs ~6 ms/step at B=128 on 8B in
        # tiny batched einsums, more than the scatters it saves
        if b % 4 == 0:
            from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v3

            return paged_decode_attention_v3(
                q, pool, block_tables, pool_ctx,
                block_size=block_size, scale=scale, interpret=not on_tpu,
                k_tail=k_tail, v_tail=v_tail,
                tail_len=tail_index, seqs_per_step=4, window=window,
            )
        if window is None:
            from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v2

            return paged_decode_attention_v2(
                q, pool, block_tables, pool_ctx,
                block_size=block_size, scale=scale, interpret=not on_tpu,
                k_tail=k_tail, v_tail=v_tail,
                tail_len=tail_index,
            )

    # keys within [qpos-W+1, ctx): the query sits past the pool at
    # pool_ctx + tail_index
    lo = None if window is None else pool_ctx + tail_index + 1 - window
    o_p, m_p, l_p = _paged_attention_ml(
        q, pool, block_tables, pool_ctx, block_size, scale,
        backend=backend, lo=lo,
    )  # o normalized [B, nh, hd]; m/l [B, nh] f32

    qg = q.reshape(b, nkv, group, hd).astype(jnp.float32)
    kt = k_tail.astype(jnp.float32)  # [B, T, nkv, hd]
    s = jnp.einsum("bkgd,btkd->bkgt", qg, kt, preferred_element_type=jnp.float32) * scale
    t_pos = jnp.arange(t_max, dtype=jnp.int32)[None, None, None, :]
    mask = t_pos <= tail_index
    if window is not None:
        # tail row t sits tail_index - t positions behind the query: rows
        # older than the window must mask out too
        mask &= t_pos > tail_index - window
    s = jnp.where(mask, s, _NEG_INF)
    m_t = jnp.max(s, axis=-1)  # [B, nkv, g]
    p = jnp.exp(s - m_t[..., None])
    l_t = jnp.sum(p, axis=-1)
    o_t = jnp.einsum(
        "bkgt,btkd->bkgd", p, v_tail.astype(jnp.float32), preferred_element_type=jnp.float32
    )  # unnormalized
    m_t = m_t.reshape(b, nh)
    l_t = l_t.reshape(b, nh)
    o_t = o_t.reshape(b, nh, hd)

    m = jnp.maximum(m_p, m_t)
    a_p = jnp.exp(m_p - m) * l_p  # [B, nh]
    a_t = jnp.exp(m_t - m)
    l = jnp.maximum(a_p + a_t * l_t, 1e-20)
    o = (o_p.astype(jnp.float32) * a_p[..., None] + o_t * a_t[..., None]) / l[..., None]
    return o.astype(q.dtype)


def _paged_attention_ml(
    q, pool, block_tables, context_lens, block_size, scale,
    backend: str = "auto", lo=None,
):
    """Decode attention over the pool returning (normalized out [B, nh, hd],
    m [B, nh], l [B, nh]) online-softmax stats for external merging. Rows
    with context_len == 0 return (0, -inf, 0). ``lo`` ([B] int32) masks keys
    below a per-row floor (sliding window; dense path only)."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_pallas = backend != "dense" and (backend == "pallas" or on_tpu)
    if use_pallas and lo is None and q.shape[-1] == 128:
        from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v2

        out, ml = paged_decode_attention_v2(
            q, pool, block_tables, context_lens,
            block_size=block_size, scale=scale, interpret=not on_tpu,
            return_ml=True,
        )
        return out, ml[..., 0], ml[..., 1]
    # dense fallback (CPU/testing + head dims the kernel doesn't support)
    b, nh, hd = q.shape
    k, v = gather_kv(pool, block_tables, block_size, hd, out_dtype=jnp.float32)
    nkv = k.shape[2]
    group = nh // nkv
    kk = k.shape[1]
    qg = q.reshape(b, nkv, group, hd).astype(jnp.float32)
    s = jnp.einsum(
        "bkgd,bskd->bkgs", qg, k, preferred_element_type=jnp.float32
    ) * scale
    key_pos = jnp.arange(kk, dtype=jnp.int32)[None, None, None, :]
    valid = key_pos < context_lens[:, None, None, None]
    if lo is not None:
        valid &= key_pos >= lo[:, None, None, None]
    s = jnp.where(valid, s, _NEG_INF)
    m = jnp.max(s, axis=-1)  # [B, nkv, g]
    p = jnp.exp(s - m[..., None])
    p = jnp.where(valid, p, 0.0)  # exp(-inf - -inf) = nan on fully-masked rows
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum(
        "bkgs,bskd->bkgd", p, v, preferred_element_type=jnp.float32
    ) / jnp.maximum(l, 1e-20)[..., None]
    return (
        o.reshape(b, nh, hd).astype(q.dtype),
        m.reshape(b, nh),
        l.reshape(b, nh),
    )


def paged_attention_dense(
    q: jnp.ndarray,
    pool: jnp.ndarray,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    positions: jnp.ndarray,
    block_size: int,
    scale: float,
    window: int | None = None,
) -> jnp.ndarray:
    b, tq, nh, hd = q.shape
    k, v = gather_kv(pool, block_tables, block_size, hd, out_dtype=q.dtype)
    nkv = k.shape[2]
    group = nh // nkv
    kk = k.shape[1]

    qg = q.reshape(b, tq, nkv, group, hd)
    scores = jnp.einsum(
        "btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32
    ) * scale  # [B, nkv, g, Tq, K]

    key_pos = jnp.arange(kk, dtype=jnp.int32)
    valid = key_pos[None, :] < context_lens[:, None]  # [B, K]
    causal = key_pos[None, None, :] <= positions[:, :, None]  # [B, Tq, K]
    if window is not None:  # sliding window: keys within [pos-W+1, pos]
        causal &= key_pos[None, None, :] > positions[:, :, None] - window
    mask = (valid[:, None, :] & causal)[:, None, None, :, :]  # [B,1,1,Tq,K]

    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jnp.exp(scores - scores.max(axis=-1, keepdims=True))
    probs = probs / (probs.sum(axis=-1, keepdims=True) + 1e-30)
    out = jnp.einsum("bkgts,bskd->btkgd", probs.astype(v.dtype), v)
    return out.reshape(b, tq, nh, hd)
