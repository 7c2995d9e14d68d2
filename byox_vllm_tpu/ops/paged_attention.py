"""Pallas paged decode attention (TPU).

The performance replacement for the reference's ``flash_attn_with_kvcache``
paged decode path (nanovllm/layers/attention.py:88-96), designed for TPU:

- the KV pool is token-major ``[num_slots, nkv*hd]`` (see ops/kv_cache.py);
  a page view [block_size, nkv*hd] = e.g. (64, 1024) is a perfectly aligned
  VMEM tile
- grid (B, W): the scalar-prefetched block table drives the BlockSpec
  index_map, so the Pallas pipeline DMAs exactly the pages each sequence
  needs from HBM into VMEM (double-buffered by the runtime) — no gathered
  K/V copy is ever materialized in HBM, unlike the XLA-gather fallback;
  out-of-context pages clamp to the last valid page, which the pipeline
  recognizes as a repeat and skips the DMA
- GQA via one-hot head expansion: queries are scattered into their kv-head's
  lane block (q' [nh, nkv*hd]) so scores for ALL heads are ONE MXU matmul
  against the raw page — profiling showed the per-kv-head small-matmul loop
  cost ~0.5 ms per launch in pure instruction overhead, ~2x the page DMA
  bytes; the widened contraction's wasted MXU flops are free by comparison
  (the kernel is bandwidth-bound)
- online softmax (flash-style m/l/acc running state in VMEM scratch,
  carried across the W page steps of each sequence)
- INT8 pools dequantize in-kernel from per-(token, head) scale pages
- padding conventions preserved: block id -1 => clamped DMA + fully masked;
  context_len 0 rows produce zeros (the reference no-ops padded rows the
  same way via cache_seqlens=0).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, W] int32 (SMEM)
    context_lens_ref,  # [B] int32 (SMEM)
    # blocks
    q_ref,  # [1, nh, hd]
    k_ref,  # [1, bs, nkv*hd]
    v_ref,  # [1, bs, nkv*hd]
    *rest,  # [ks_ref, vs_ref (1, bs, nkv) when int8], o_ref, scratch m/l/acc
    scale: float,
    block_size: int,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    quantized: bool,
):
    if quantized:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    w = pl.program_id(1)
    num_pages = pl.num_programs(1)
    nh = num_kv_heads * group
    f = num_kv_heads * head_dim

    @pl.when(w == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ctx = context_lens_ref[b]
    valid = ctx - w * block_size  # tokens of this page in-context (may be <=0)

    @pl.when(valid > 0)
    def _page():
        # one-hot of each query head's kv head: [nh, nkv]
        head_of = jax.lax.broadcasted_iota(jnp.int32, (nh, num_kv_heads), 0) // group
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, (nh, num_kv_heads), 1)
        onehot = (head_of == kv_idx).astype(jnp.float32)

        k = k_ref[0].astype(jnp.float32)  # [bs, F]
        v = v_ref[0].astype(jnp.float32)
        if quantized:
            ks = ks_ref[0]  # [bs, nkv] f32
            vs = vs_ref[0]
            k = (k.reshape(block_size, num_kv_heads, head_dim) * ks[..., None]).reshape(
                block_size, f
            )
            v = (v.reshape(block_size, num_kv_heads, head_dim) * vs[..., None]).reshape(
                block_size, f
            )

        q = q_ref[0].astype(jnp.float32)  # [nh, hd]
        # scatter each query into its kv head's lane block: [nh, F]
        qe = (q[:, None, :] * onehot[:, :, None]).reshape(nh, f)
        s = jax.lax.dot_general(
            qe, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [nh, bs]

        col = jax.lax.broadcasted_iota(jnp.int32, (nh, block_size), 1)
        s = jnp.where(col < valid, s, _NEG_INF)

        m_prev = m_ref[:, 0:1]  # [nh, 1]
        l_prev = l_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # [nh, bs]
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, 0:1] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, 0:1] = m_new

        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [nh, F]
        # select each head's own lane block back out: [nh, hd]
        pv = (pv.reshape(nh, num_kv_heads, head_dim) * onehot[:, :, None]).sum(axis=1)
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(w == num_pages - 1)
    def _finish():
        l = jnp.maximum(l_ref[:, 0:1], 1e-20)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_size", "scale", "interpret")
)
def paged_decode_attention(
    q: jnp.ndarray,  # [B, nh, hd]
    k_pool: jnp.ndarray,  # [S, nkv*hd]
    v_pool: jnp.ndarray,  # [S, nkv*hd]
    block_tables: jnp.ndarray,  # [B, W] int32, -1 padding
    context_lens: jnp.ndarray,  # [B] int32
    *,
    block_size: int,
    scale: float,
    interpret: bool = False,
    kv_scales=None,  # (k_scale [S, nkv], v_scale [S, nkv]) when the pool is int8
) -> jnp.ndarray:
    b, nh, hd = q.shape
    s, f = k_pool.shape
    nkv = f // hd
    w = block_tables.shape[1]
    group = nh // nkv
    num_blocks = s // block_size
    kp = k_pool.reshape(num_blocks, block_size, f)
    vp = v_pool.reshape(num_blocks, block_size, f)
    quantized = kv_scales is not None
    tables = jnp.maximum(block_tables, 0).astype(jnp.int32)  # clamp -1 (masked anyway)

    def page_index(i, j, bt, ctx):
        # Clamp past-the-context pages to the sequence's last valid page: the
        # Pallas pipeline skips the DMA when the block index repeats between
        # consecutive grid steps, so padded table width costs ~nothing.
        last_valid = jnp.maximum((ctx[i] - 1) // block_size, 0)
        return (bt[i, jnp.minimum(j, last_valid)], 0, 0)

    in_specs = [
        pl.BlockSpec((1, nh, hd), lambda i, j, bt, ctx: (i, 0, 0)),
        pl.BlockSpec((1, block_size, f), page_index),
        pl.BlockSpec((1, block_size, f), page_index),
    ]
    operands = [q, kp, vp]
    if quantized:
        ks = kv_scales[0].reshape(num_blocks, block_size, nkv)
        vs = kv_scales[1].reshape(num_blocks, block_size, nkv)
        in_specs += [
            pl.BlockSpec((1, block_size, nkv), page_index),
            pl.BlockSpec((1, block_size, nkv), page_index),
        ]
        operands += [ks, vs]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, w),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nh, hd), lambda i, j, bt, ctx: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nh, 128), jnp.float32),
            pltpu.VMEM((nh, 128), jnp.float32),
            pltpu.VMEM((nh, hd), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        block_size=block_size,
        num_kv_heads=nkv,
        group=group,
        head_dim=hd,
        quantized=quantized,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), q.dtype),
        interpret=interpret,
    )(tables, context_lens.astype(jnp.int32), *operands)
