"""Pallas prefill (varlen/causal) attention over the merged paged KV pool.

The performance replacement for the reference's ``flash_attn_varlen_func``
prefill path (nanovllm/layers/attention.py:72-86), on the padded [B, Tq]
layout this engine uses:

- queries attend the *pool* (new K/V are stored first), so one kernel covers
  plain prefill, prefix-cache-hit prefill (cached pages are just earlier
  pages of the same sequence), and speculative-verify windows
- the pool is MERGED token-major [S, 2*F(+256)] (ops/kv_cache.py): one page
  = ONE BlockSpec operand = one DMA covering K, V, and the int8 scale bytes
- grid (B, num_q_tiles, W): flash-style online softmax with m/l/acc in VMEM
  scratch carried across the page dimension (innermost); the
  scalar-prefetched block table drives page DMAs
- causal page skipping: pages entirely after a query tile's last position
  clamp their index to the last useful page — the pipeline sees a repeated
  block index and skips the DMA — and their compute is predicated away; with
  the page loop innermost this prunes the ~2x causal wasted work
- per-query-head [TQ, hd] x [hd, bs] matmuls (prefill is compute-bound;
  tiles are large enough that instruction overhead is immaterial, unlike
  decode where one-hot expansion wins)
- the XLA-gather dense fallback in ops/attention.py keeps CPU/testing
  parity; this kernel replaced a gather+mask+softmax XLA path that spent
  ~15 ms per 32x128-token prefill call materializing gathered K/V.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from byox_vllm_tpu.ops.kv_cache import decode_scale_bytes, pool_feature_dim

_NEG_INF = -1e30


def _prefill_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, W] int32 (SMEM)
    context_lens_ref,  # [B] int32 (SMEM)
    q_lens_ref,  # [B] int32 (SMEM)
    # blocks
    q_ref,  # [1, TQ, nh, hd]
    pool_ref,  # [1, bs, width] merged page
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    scale: float,
    block_size: int,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    q_tile: int,
    quantized: bool,
    window: int | None = None,  # sliding-window attention band
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    w = pl.program_id(2)
    num_pages = pl.num_programs(2)
    nh = num_kv_heads * group
    f = num_kv_heads * head_dim

    @pl.when(w == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ctx = context_lens_ref[b]
    q_len = q_lens_ref[b]
    # absolute position of this tile's first query row
    base = ctx - q_len + t * q_tile
    # last key position any row of this tile may attend
    max_pos = jnp.minimum(base + q_tile - 1, ctx - 1)
    page_start = w * block_size
    useful = jnp.logical_and(page_start <= max_pos, ctx > 0)
    if window is not None:
        # pages wholly below the tile's window floor (oldest attendable key
        # of row 0 = base - window + 1) are index-clamped by page_index, so
        # their DMA is skipped — predicate their compute away too. Rows whose
        # own floor is higher self-heal: their fully-masked pages leave
        # m = -inf, and the first real key zeroes the garbage via
        # alpha = exp(-inf - m_new) = 0.
        useful &= page_start + block_size - 1 >= base - window + 1

    @pl.when(useful)
    def _page():
        row_t = jax.lax.broadcasted_iota(jnp.int32, (q_tile, block_size), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (q_tile, block_size), 1)
        key_pos = page_start + col
        q_pos = base + row_t
        mask = jnp.logical_and(key_pos <= q_pos, key_pos < ctx)  # [TQ, bs]
        if window is not None:  # band: keys within [q_pos - W + 1, q_pos]
            mask &= key_pos > q_pos - window

        tile = pool_ref[0]  # [bs, width]
        sc = (
            decode_scale_bytes(tile[:, 2 * f :]) if quantized else None
        )  # [bs, 128] f32
        for h in range(nh):
            kv_h = h // group
            lanes = slice(kv_h * head_dim, (kv_h + 1) * head_dim)
            v_lanes = slice(f + kv_h * head_dim, f + (kv_h + 1) * head_dim)
            q = q_ref[0, :, h, :].astype(jnp.float32)  # [TQ, hd]
            k = tile[:, lanes].astype(jnp.float32)  # [bs, hd]
            v = tile[:, v_lanes].astype(jnp.float32)  # [bs, hd]
            if quantized:
                # per-(token, head) scales: lane g = K, lane nkv+g = V of the
                # decoded scale row (ops/kv_cache.py); prefill is compute-
                # bound so two [bs, hd] multiplies per head are immaterial
                k = k * sc[:, kv_h : kv_h + 1]
                v = v * sc[:, num_kv_heads + kv_h : num_kv_heads + kv_h + 1]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [TQ, bs]
            s = jnp.where(mask, s, _NEG_INF)

            m_prev = m_ref[h, :, 0:1]  # [TQ, 1]
            l_prev = l_ref[h, :, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[h, :, 0:1] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[h, :, 0:1] = m_new
            pv = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # [TQ, hd]
            acc_ref[h] = acc_ref[h] * alpha + pv

    @pl.when(w == num_pages - 1)
    def _finish():
        for h in range(nh):
            l = jnp.maximum(l_ref[h, :, 0:1], 1e-20)
            o_ref[0, :, h, :] = (acc_ref[h] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_size", "scale", "interpret", "window")
)
def paged_prefill_attention(
    q: jnp.ndarray,  # [B, Tq, nh, hd]
    pool: jnp.ndarray,  # [S, 2*F(+256)] merged
    block_tables: jnp.ndarray,  # [B, W] int32, -1 padding
    context_lens: jnp.ndarray,  # [B] int32
    q_lens: jnp.ndarray,  # [B] int32
    *,
    block_size: int,
    scale: float,
    interpret: bool = False,
    window: int | None = None,  # sliding-window attention (band + DMA skip)
) -> jnp.ndarray:
    b, tq, nh, hd = q.shape
    s, width = pool.shape
    quantized = pool.dtype == jnp.int8
    f = pool_feature_dim(pool)
    nkv = f // hd
    w = block_tables.shape[1]
    group = nh // nkv
    num_blocks = s // block_size
    q_tile = min(128, tq)
    assert tq % q_tile == 0
    num_q_tiles = tq // q_tile
    pp = pool.reshape(num_blocks, block_size, width)
    tables = jnp.maximum(block_tables, 0).astype(jnp.int32)

    def page_index(i, t, j, bt, ctx, ql):
        # clamp to the page range this query tile can use: repeated indices
        # between consecutive grid steps skip the DMA entirely. The low clamp
        # is the sliding-window floor (row 0's oldest attendable key).
        base = ctx[i] - ql[i] + t * q_tile
        max_pos = jnp.minimum(base + q_tile - 1, ctx[i] - 1)
        last_useful = jnp.clip(max_pos // block_size, 0, None)
        jj = jnp.minimum(j, last_useful)
        if window is not None:
            first_useful = jnp.clip((base - window + 1) // block_size, 0, None)
            jj = jnp.maximum(jj, jnp.minimum(first_useful, last_useful))
        return (bt[i, jnp.clip(jj, 0, None)], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, num_q_tiles, w),
        in_specs=[
            pl.BlockSpec((1, q_tile, nh, hd), lambda i, t, j, bt, ctx, ql: (i, t, 0, 0)),
            pl.BlockSpec((1, block_size, width), page_index),
        ],
        out_specs=pl.BlockSpec((1, q_tile, nh, hd), lambda i, t, j, bt, ctx, ql: (i, t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nh, q_tile, 128), jnp.float32),
            pltpu.VMEM((nh, q_tile, 128), jnp.float32),
            pltpu.VMEM((nh, q_tile, hd), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _prefill_kernel,
        scale=scale,
        block_size=block_size,
        num_kv_heads=nkv,
        group=group,
        head_dim=hd,
        q_tile=q_tile,
        quantized=quantized,
        window=window,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, tq, nh, hd), q.dtype),
        interpret=interpret,
    )(
        tables,
        context_lens.astype(jnp.int32),
        q_lens.astype(jnp.int32),
        q,
        pp,
    )
