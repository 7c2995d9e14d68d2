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


# ---------------------------------------------------------------------------
# v2 decode kernel: grid (B,) with manual double-buffered page DMAs.
#
# The (B, W) pipeline above issues one grid step per (sequence, page); at
# B=128, W=4 that is 512 steps whose fixed overhead dominates a bandwidth-
# bound kernel. Here each grid step handles one sequence: its valid pages
# are DMA'd from HBM into a VMEM span (invalid pages are simply never
# fetched), the next sequence's pages prefetch while the current one
# computes, and attention is a single-pass softmax over the whole span
# (no online m/l state machine) with the same one-hot GQA expansion.
# ---------------------------------------------------------------------------


def _decode_kernel_v2(
    # scalar prefetch
    block_tables_ref,  # [B, W] int32 (SMEM)
    context_lens_ref,  # [B] int32 (SMEM)
    # inputs
    q_ref,  # [1, nh, hd] (VMEM block)
    k_hbm,  # [nb, bs, F] (ANY/HBM)
    v_hbm,  # [nb, bs, F]
    *rest,  # [ks_hbm, vs_hbm [nb, bs, nkv] if int8], o_ref, kbuf, vbuf, (ksbuf, vsbuf), sems
    scale: float,
    block_size: int,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    num_pages: int,
    quantized: bool,
):
    if quantized:
        ks_hbm, vs_hbm, o_ref, kbuf, vbuf, ksbuf, vsbuf, sems = rest
    else:
        o_ref, kbuf, vbuf, sems = rest
        ks_hbm = vs_hbm = ksbuf = vsbuf = None
    b = pl.program_id(0)
    num_seqs = pl.num_programs(0)
    nh = num_kv_heads * group
    f = num_kv_heads * head_dim
    span = num_pages * block_size

    def valid_pages_of(i):
        ctx = context_lens_ref[i]
        return jnp.clip(pl.cdiv(ctx, block_size), 0, num_pages)

    def page_copies(i, slot, j):
        """DMA descriptors for page j of sequence i into buffer `slot`."""
        page = block_tables_ref[i, j]
        pairs = [(k_hbm, kbuf), (v_hbm, vbuf)]
        if quantized:
            pairs += [(ks_hbm, ksbuf), (vs_hbm, vsbuf)]
        return [
            pltpu.make_async_copy(
                src.at[page],
                dst.at[slot, pl.ds(j * block_size, block_size), :],
                sems.at[slot, idx],
            )
            for idx, (src, dst) in enumerate(pairs)
        ]

    def start_fetch(i, slot):
        n_valid = valid_pages_of(i)
        for j in range(num_pages):
            @pl.when(j < n_valid)
            def _():
                for c in page_copies(i, slot, j):
                    c.start()

    def wait_fetch(i, slot):
        # rebuilding the same (src, dst, sem) triple waits the matching DMA
        n_valid = valid_pages_of(i)
        for j in range(num_pages):
            @pl.when(j < n_valid)
            def _():
                for c in page_copies(i, slot, j):
                    c.wait()

    @pl.when(b == 0)
    def _warmup():
        start_fetch(0, 0)

    slot = jax.lax.rem(b, 2)
    next_slot = jax.lax.rem(b + 1, 2)

    @pl.when(b + 1 < num_seqs)
    def _prefetch():
        start_fetch(b + 1, next_slot)

    wait_fetch(b, slot)

    ctx = context_lens_ref[b]
    del next_slot
    head_of = jax.lax.broadcasted_iota(jnp.int32, (nh, num_kv_heads), 0) // group
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (nh, num_kv_heads), 1)
    onehot = (head_of == kv_idx).astype(jnp.float32)

    k = kbuf[slot].astype(jnp.float32)  # [span, F]
    v = vbuf[slot].astype(jnp.float32)
    if quantized:
        ks = ksbuf[slot]  # [span, nkv]
        vs = vsbuf[slot]
        k = (k.reshape(span, num_kv_heads, head_dim) * ks[..., None]).reshape(span, f)
        v = (v.reshape(span, num_kv_heads, head_dim) * vs[..., None]).reshape(span, f)
    # rows past the context were never fetched: uninitialized VMEM may hold
    # NaN bits, and 0 * NaN = NaN through the PV matmul — zero them
    row = jax.lax.broadcasted_iota(jnp.int32, (span, 1), 0)
    k = jnp.where(row < ctx, k, 0.0)
    v = jnp.where(row < ctx, v, 0.0)

    q = q_ref[0].astype(jnp.float32)  # [nh, hd]
    qe = (q[:, None, :] * onehot[:, :, None]).reshape(nh, f)
    s = jax.lax.dot_general(
        qe, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [nh, span]
    col = jax.lax.broadcasted_iota(jnp.int32, (nh, span), 1)
    s = jnp.where(col < ctx, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-20)
    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [nh, F]
    pv = (pv.reshape(nh, num_kv_heads, head_dim) * onehot[:, :, None]).sum(axis=1)
    out = pv / l
    # fully-masked padding rows (ctx == 0): exp(-inf - -inf)=... guard to zero
    out = jnp.where(ctx > 0, out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_size", "scale", "interpret")
)
def paged_decode_attention_v2(
    q: jnp.ndarray,  # [B, nh, hd]
    k_pool: jnp.ndarray,  # [S, nkv*hd]
    v_pool: jnp.ndarray,  # [S, nkv*hd]
    block_tables: jnp.ndarray,  # [B, W] int32, -1 padding
    context_lens: jnp.ndarray,  # [B] int32
    *,
    block_size: int,
    scale: float,
    interpret: bool = False,
    kv_scales=None,
) -> jnp.ndarray:
    b, nh, hd = q.shape
    s, f = k_pool.shape
    nkv = f // hd
    w = block_tables.shape[1]
    group = nh // nkv
    num_blocks = s // block_size
    span = w * block_size
    kp = k_pool.reshape(num_blocks, block_size, f)
    vp = v_pool.reshape(num_blocks, block_size, f)
    quantized = kv_scales is not None
    tables = jnp.maximum(block_tables, 0).astype(jnp.int32)

    in_specs = [
        pl.BlockSpec((1, nh, hd), lambda i, bt, ctx: (i, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [q, kp, vp]
    scratch = [
        pltpu.VMEM((2, span, f), k_pool.dtype),
        pltpu.VMEM((2, span, f), v_pool.dtype),
    ]
    if quantized:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        operands += [
            kv_scales[0].reshape(num_blocks, block_size, nkv),
            kv_scales[1].reshape(num_blocks, block_size, nkv),
        ]
        scratch += [
            pltpu.VMEM((2, span, nkv), jnp.float32),
            pltpu.VMEM((2, span, nkv), jnp.float32),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((2, 4 if quantized else 2)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nh, hd), lambda i, bt, ctx: (i, 0, 0)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_kernel_v2,
        scale=scale,
        block_size=block_size,
        num_kv_heads=nkv,
        group=group,
        head_dim=hd,
        num_pages=w,
        quantized=quantized,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tables, context_lens.astype(jnp.int32), *operands)
