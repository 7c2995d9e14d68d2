"""Pallas paged decode attention (TPU).

The performance replacement for the reference's ``flash_attn_with_kvcache``
paged decode path (nanovllm/layers/attention.py:88-96), designed for TPU:

- the KV pool is MERGED token-major ``[num_slots, 2*F(+256)]`` (see
  ops/kv_cache.py): K row | V row | scale bytes in one pool row, so a page
  view [block_size, width] is a single aligned VMEM tile and each
  (sequence, page) costs ONE DMA issue — the r4 ablation showed per-page
  DMA-issue overhead (3 pools x 36 layers) dominating the bandwidth-bound
  kernel (attention 4.9 ms vs ~3 ms traffic floor at B=128 on 8B)
- grid (B, W) in v1: the scalar-prefetched block table drives the BlockSpec
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
- INT8 pools dequantize in-kernel from the page's per-(token, head) scale
  bytes (bf16 bits decoded with integer ops, ops/kv_cache.py::
  decode_scale_bytes); scales fold into the [nh, span] score/prob matrices
  instead of dequantizing [span, F] — 32x less scale work
- padding conventions preserved: block id -1 => clamped DMA + fully masked;
  context_len 0 rows produce zeros (the reference no-ops padded rows the
  same way via cache_seqlens=0).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from byox_vllm_tpu.ops.kv_cache import decode_scale_bytes, pool_feature_dim

_NEG_INF = -1e30


def _split_page(tile, f, quantized, cdt):
    """Merged page tile [span, width] -> (k [span, F], v [span, F],
    sc [span, 128] cdt | None). Static lane slices; the bf16 scale bits
    decode exactly (they were rounded to bf16 before quantizing)."""
    k = tile[:, :f].astype(cdt)
    v = tile[:, f : 2 * f].astype(cdt)
    sc = None
    if quantized:
        sc = decode_scale_bytes(tile[:, 2 * f :]).astype(cdt)
    return k, v, sc


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, W] int32 (SMEM)
    context_lens_ref,  # [B] int32 (SMEM)
    # blocks
    q_ref,  # [1, nh, hd]
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
    quantized: bool,
):
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

        # matmuls run in the query dtype: bf16 in production (f32 MXU
        # rate is ~1/8 with the M=nh dim already underutilizing the array),
        # f32 when the caller wants exactness (tests). The tiny
        # [nh, nkv, hd] one-hot expansion stays f32 (Mosaic can't
        # minor-dim-broadcast sub-32-bit types); operands cast to cdt at the
        # matmul boundary.
        cdt = jnp.float32 if q_ref.dtype == jnp.float32 else jnp.bfloat16
        k, v, sc = _split_page(pool_ref[0], f, quantized, cdt)

        q = q_ref[0].astype(jnp.float32)  # [nh, hd]
        # scatter each query into its kv head's lane block: [nh, F]
        qe = (q[:, None, :] * onehot[:, :, None]).reshape(nh, f).astype(cdt)
        s = jax.lax.dot_general(
            qe, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [nh, bs]
        if quantized:
            # per-head scale rows extracted from the [bs, 128] scale tile by
            # one-hot matmul (lane g(h) = K scale, lane nkv+g(h) = V scale)
            lane = jax.lax.broadcasted_iota(jnp.int32, (nh, 128), 1)
            hof = jax.lax.broadcasted_iota(jnp.int32, (nh, 128), 0) // group
            oh_k = (lane == hof).astype(cdt)
            oh_v = (lane == hof + num_kv_heads).astype(cdt)
            ks_heads = jax.lax.dot_general(
                oh_k, sc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [nh, bs]
            s = s * ks_heads

        col = jax.lax.broadcasted_iota(jnp.int32, (nh, block_size), 1)
        s = jnp.where(col < valid, s, _NEG_INF)

        m_prev = m_ref[:, 0:1]  # [nh, 1]
        l_prev = l_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # [nh, bs]
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, 0:1] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, 0:1] = m_new

        if quantized:
            vs_heads = jax.lax.dot_general(
                oh_v, sc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [nh, bs]
            p = p * vs_heads
        # zero past-context V rows (never written rows may hold garbage)
        row = jax.lax.broadcasted_iota(jnp.int32, (block_size, 1), 0)
        v_ok = jnp.where(row < valid, v, 0.0)
        pv = jax.lax.dot_general(
            p.astype(cdt), v_ok, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
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
    pool: jnp.ndarray,  # [S, 2*F(+256)] merged
    block_tables: jnp.ndarray,  # [B, W] int32, -1 padding
    context_lens: jnp.ndarray,  # [B] int32
    *,
    block_size: int,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    b, nh, hd = q.shape
    s, width = pool.shape
    quantized = pool.dtype == jnp.int8
    f = pool_feature_dim(pool)
    nkv = f // hd
    w = block_tables.shape[1]
    group = nh // nkv
    num_blocks = s // block_size
    pp = pool.reshape(num_blocks, block_size, width)
    tables = jnp.maximum(block_tables, 0).astype(jnp.int32)  # clamp -1 (masked anyway)

    def page_index(i, j, bt, ctx):
        # Clamp past-the-context pages to the sequence's last valid page: the
        # Pallas pipeline skips the DMA when the block index repeats between
        # consecutive grid steps, so padded table width costs ~nothing.
        last_valid = jnp.maximum((ctx[i] - 1) // block_size, 0)
        return (bt[i, jnp.minimum(j, last_valid)], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, w),
        in_specs=[
            pl.BlockSpec((1, nh, hd), lambda i, j, bt, ctx: (i, 0, 0)),
            pl.BlockSpec((1, block_size, width), page_index),
        ],
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
    )(tables, context_lens.astype(jnp.int32), q, pp)


# ---------------------------------------------------------------------------
# v2 decode kernel: grid (B, C) with manual double-buffered chunk DMAs.
#
# The (B, W) pipeline above issues one grid step per (sequence, page); at
# B=128, W=4 that is 512 steps whose fixed overhead dominates a bandwidth-
# bound kernel (and its BlockSpec pipeline degrades badly past ~4 pages —
# measured 36 GB/s at ctx 504 vs 422 GB/s for this kernel). Here each grid
# step handles one CHUNK of up to `pages_per_chunk` pages of one sequence:
# the chunk's valid pages are DMA'd from HBM into a VMEM span (invalid pages
# are simply never fetched), the next chunk (or next sequence's first chunk)
# prefetches while the current one computes, and softmax runs online across
# chunks (m/l/acc scratch) with the same one-hot GQA expansion. Short
# contexts take one chunk = single-pass softmax; long contexts stay within
# a fixed VMEM budget.
# ---------------------------------------------------------------------------


def _decode_kernel_v2(
    # scalar prefetch
    block_tables_ref,  # [B, W] int32 (SMEM)
    context_lens_ref,  # [B] int32 (SMEM)
    *rest,  # [tail_len_ref if has_tail], q_ref, pool_hbm,
    #         [k_tail_ref, v_tail_ref if has_tail],
    #         o_ref, [ml_ref], buf, m/l/acc scratch, sems
    scale: float,
    block_size: int,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    pages_per_chunk: int,
    num_table_pages: int,
    quantized: bool,
    return_ml: bool,
    has_tail: bool,
):
    rest = list(rest)
    tail_len_ref = rest.pop(0) if has_tail else None
    q_ref = rest.pop(0)
    pool_hbm = rest.pop(0)
    k_tail_ref = rest.pop(0) if has_tail else None
    v_tail_ref = rest.pop(0) if has_tail else None
    o_ref = rest.pop(0)
    ml_ref = rest.pop(0) if return_ml else None
    buf, m_ref, l_ref, acc_ref, sems = rest
    b = pl.program_id(0)
    c = pl.program_id(1)
    num_seqs = pl.num_programs(0)
    num_chunks = pl.num_programs(1)
    ppc = pages_per_chunk
    span = ppc * block_size
    nh = num_kv_heads * group
    f = num_kv_heads * head_dim

    def valid_pages_of(i):
        ctx = context_lens_ref[i]
        return jnp.clip(pl.cdiv(ctx, block_size), 0, num_table_pages)

    def page_copy(i, cc, slot, j):
        """DMA descriptor for page j of chunk cc of sequence i into `slot` —
        ONE copy per page now that the pool row is merged."""
        page = block_tables_ref[i, cc * ppc + j]
        return pltpu.make_async_copy(
            pool_hbm.at[page],
            buf.at[slot, pl.ds(j * block_size, block_size), :],
            sems.at[slot],
        )

    def start_fetch(i, cc, slot):
        n_valid = valid_pages_of(i) - cc * ppc
        for j in range(ppc):
            @pl.when(j < n_valid)
            def _():
                page_copy(i, cc, slot, j).start()

    def wait_fetch(i, cc, slot):
        # rebuilding the same (src, dst, sem) triple waits the matching DMA
        n_valid = valid_pages_of(i) - cc * ppc
        for j in range(ppc):
            @pl.when(j < n_valid)
            def _():
                page_copy(i, cc, slot, j).wait()

    @pl.when((b == 0) & (c == 0))
    def _warmup():
        start_fetch(0, 0, 0)

    g = b * num_chunks + c
    slot = jax.lax.rem(g, 2)
    next_slot = jax.lax.rem(g + 1, 2)
    last_chunk = c == num_chunks - 1
    nb = jnp.where(last_chunk, b + 1, b)
    nc = jnp.where(last_chunk, 0, c + 1)

    @pl.when(nb < num_seqs)
    def _prefetch():
        start_fetch(nb, nc, next_slot)

    wait_fetch(b, c, slot)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ctx = context_lens_ref[b]
    local_ctx = ctx - c * span  # tokens of this chunk in-context (may be <=0)

    head_of = jax.lax.broadcasted_iota(jnp.int32, (nh, num_kv_heads), 0) // group
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (nh, num_kv_heads), 1)
    onehot = (head_of == kv_idx).astype(jnp.float32)
    cdt = jnp.float32 if q_ref.dtype == jnp.float32 else jnp.bfloat16

    @pl.when(local_ctx > 0)
    def _chunk():
        # Matmuls run in the query dtype: bf16 in production (f32 MXU
        # throughput is ~1/8 and the M=nh dim already underutilizes the
        # systolic array), f32 when the caller wants exactness (tests);
        # softmax stats stay f32. For the int8 pool the [span, F] tiles are
        # never dequantized: each query head h only reads kv-head g(h)'s
        # lanes (qe is zero elsewhere, and the output select keeps only
        # g(h)'s lanes), so the per-(token, head) scales fold into the
        # [nh, span] score/prob matrices instead — 32x less scale work.
        k, v, sc = _split_page(buf[slot], f, quantized, cdt)
        # rows past the context were never fetched: uninitialized VMEM may
        # hold NaN bits, and 0 * NaN = NaN through the PV matmul — zero V
        # (K's garbage only lands in score entries the col-mask overwrites)
        row = jax.lax.broadcasted_iota(jnp.int32, (span, 1), 0)
        v = jnp.where(row < local_ctx, v, 0.0)

        q = q_ref[0].astype(jnp.float32)  # [nh, hd]
        # tiny expansion stays f32 (Mosaic minor-dim broadcast needs 32-bit)
        qe = (q[:, None, :] * onehot[:, :, None]).reshape(nh, f).astype(cdt)
        s = jax.lax.dot_general(
            qe, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [nh, span]
        col = jax.lax.broadcasted_iota(jnp.int32, (nh, span), 1)
        if quantized:
            # per-head scale rows extracted from the [span, 128] scale tile
            # by one-hot matmul (lane g(h) = K scale, lane nkv+g(h) = V)
            lane = jax.lax.broadcasted_iota(jnp.int32, (nh, 128), 1)
            hof = jax.lax.broadcasted_iota(jnp.int32, (nh, 128), 0) // group
            oh_k = (lane == hof).astype(cdt)
            oh_v = (lane == hof + num_kv_heads).astype(cdt)
            ks_heads = jax.lax.dot_general(
                oh_k, sc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [nh, span]
            s = s * ks_heads
        s = jnp.where(col < local_ctx, s, _NEG_INF)

        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # [nh, span]
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, 0:1] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, 0:1] = m_new

        if quantized:
            vs_heads = jax.lax.dot_general(
                oh_v, sc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )  # [nh, span]
            # scale rows past ctx are unfetched VMEM (may be NaN) and 0 *
            # NaN = NaN: re-mask after the fold (p is exactly 0 otherwise)
            p = jnp.where(col < local_ctx, p * vs_heads, 0.0)
        pv = jax.lax.dot_general(
            p.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [nh, F]
        # select each head's own lane block back out: [nh, hd]
        pv = (pv.reshape(nh, num_kv_heads, head_dim) * onehot[:, :, None]).sum(axis=1)
        acc_ref[...] = acc_ref[...] * alpha + pv

    if has_tail:
        # window-staged decode: the window's new K/V rows live in a small
        # bf16 tail operand (the pool is read-only within the window, see
        # engine/model_runner._multi_decode_step); process them as one extra
        # online-softmax chunk. Rows 0..tail_len are valid; the tail is
        # always full precision, so no scale folding even for int8 pools.
        @pl.when(last_chunk & (ctx > 0))
        def _tail():
            tl = tail_len_ref[0]
            t_max = k_tail_ref.shape[1]
            kt = k_tail_ref[0].astype(cdt)  # [T, F]
            vt = v_tail_ref[0].astype(cdt)
            row = jax.lax.broadcasted_iota(jnp.int32, (t_max, 1), 0)
            vt = jnp.where(row <= tl, vt, 0.0)
            q = q_ref[0].astype(jnp.float32)
            qe = (q[:, None, :] * onehot[:, :, None]).reshape(nh, f).astype(cdt)
            s = jax.lax.dot_general(
                qe, kt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [nh, T]
            col = jax.lax.broadcasted_iota(jnp.int32, (nh, t_max), 1)
            s = jnp.where(col <= tl, s, _NEG_INF)

            m_prev = m_ref[:, 0:1]
            l_prev = l_ref[:, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:, 0:1] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[:, 0:1] = m_new
            pv = jax.lax.dot_general(
                p.astype(cdt), vt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [nh, F]
            pv = (pv.reshape(nh, num_kv_heads, head_dim) * onehot[:, :, None]).sum(axis=1)
            acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(last_chunk)
    def _finish():
        l = jnp.maximum(l_ref[:, 0:1], 1e-20)
        out = acc_ref[...] / l
        # fully-masked padding rows (ctx == 0) must produce zeros
        out = jnp.where(ctx > 0, out, 0.0)
        o_ref[0] = out.astype(o_ref.dtype)
        if return_ml:
            # online-softmax stats for the caller's merge with out-of-pool
            # keys (window-staged decode): lane 0 = m, lane 1 = l
            lane = jax.lax.broadcasted_iota(jnp.int32, m_ref.shape, 1)
            m_col = m_ref[:, 0:1]
            l_col = l_ref[:, 0:1]
            ml_ref[0] = jnp.where(lane == 0, m_col, jnp.where(lane == 1, l_col, 0.0))


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "scale", "interpret", "max_pages_per_chunk", "return_ml"),
)
def paged_decode_attention_v2(
    q: jnp.ndarray,  # [B, nh, hd]
    pool: jnp.ndarray,  # [S, 2*F(+256)] merged
    block_tables: jnp.ndarray,  # [B, W] int32, -1 padding
    context_lens: jnp.ndarray,  # [B] int32
    *,
    block_size: int,
    scale: float,
    interpret: bool = False,
    max_pages_per_chunk: int | None = None,  # test hook / tuning knob
    return_ml: bool = False,  # also return [B, nh, 128] f32 (lane0=m, lane1=l)
    k_tail=None,  # [B, T, nkv, hd] float: window-staged new K/V rows
    v_tail=None,
    tail_len=None,  # scalar int32: tail rows 0..tail_len attend
):
    b, nh, hd = q.shape
    s, width = pool.shape
    quantized = pool.dtype == jnp.int8
    f = pool_feature_dim(pool)
    nkv = f // hd
    w = block_tables.shape[1]
    group = nh // nkv
    num_blocks = s // block_size
    pp_pages = pool.reshape(num_blocks, block_size, width)
    has_tail = k_tail is not None
    tables = jnp.maximum(block_tables, 0).astype(jnp.int32)

    # chunk size: stay within ~4 MiB of double-buffered merged-page VMEM
    budget = 4 * 1024 * 1024
    bytes_per_page = block_size * width * pool.dtype.itemsize * 2  # 2 slots
    ppc = max(1, min(w, budget // max(bytes_per_page, 1)))
    if max_pages_per_chunk is not None:
        ppc = max(1, min(ppc, max_pages_per_chunk))
    num_chunks = -(-w // ppc)
    span = ppc * block_size

    def _idx(fn):
        # index maps take (grid..., *scalar_prefetch_refs)
        if has_tail:
            return lambda i, c, bt, ctx, tl: fn(i, c)
        return lambda i, c, bt, ctx: fn(i, c)

    in_specs = [
        pl.BlockSpec((1, nh, hd), _idx(lambda i, c: (i, 0, 0))),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [q, pp_pages]
    scratch = [pltpu.VMEM((2, span, width), pool.dtype)]
    if has_tail:
        t_max = k_tail.shape[1]
        in_specs += [
            pl.BlockSpec((1, t_max, f), _idx(lambda i, c: (i, 0, 0))),
            pl.BlockSpec((1, t_max, f), _idx(lambda i, c: (i, 0, 0))),
        ]
        operands += [k_tail.reshape(b, t_max, f), v_tail.reshape(b, t_max, f)]
    scratch += [
        pltpu.VMEM((nh, 128), jnp.float32),  # m
        pltpu.VMEM((nh, 128), jnp.float32),  # l
        pltpu.VMEM((nh, hd), jnp.float32),  # acc
        pltpu.SemaphoreType.DMA((2,)),
    ]

    out_specs = pl.BlockSpec((1, nh, hd), _idx(lambda i, c: (i, 0, 0)))
    out_shape = jax.ShapeDtypeStruct((b, nh, hd), q.dtype)
    if return_ml:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, nh, 128), _idx(lambda i, c: (i, 0, 0))),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b, nh, 128), jnp.float32)]
    prefetch = [tables, context_lens.astype(jnp.int32)]
    if has_tail:
        prefetch.append(jnp.asarray(tail_len, jnp.int32).reshape(1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b, num_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_kernel_v2,
        scale=scale,
        block_size=block_size,
        num_kv_heads=nkv,
        group=group,
        head_dim=hd,
        pages_per_chunk=ppc,
        num_table_pages=w,
        quantized=quantized,
        return_ml=return_ml,
        has_tail=has_tail,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*prefetch, *operands)


# ---------------------------------------------------------------------------
# v3 decode kernel: v2's chunked manual-DMA pipeline, but each grid step
# processes SB sequences.
#
# Microbenching v2 at B=128 showed ~0.8 us/sequence of FIXED grid-step cost
# vs ~0.14 us/page of DMA slope — dominated by each sequence's dependent
# matmul chain (s -> exp -> pv) plus step machinery. Batching SB sequences
# per grid step keeps per-seq matmuls (a single block-diagonal matmul was
# tried first: its SBx wasted MXU flops ate the win) but makes the SB chains
# data-independent within one step, so Mosaic's scheduler overlaps them and
# the step machinery amortizes.
# ---------------------------------------------------------------------------


def _decode_kernel_v3(
    # scalar prefetch
    block_tables_ref,  # [B, W] int32 (SMEM)
    context_lens_ref,  # [B] int32 (SMEM)
    *rest,  # [tail_len_ref if has_tail],
    #         q_ref, pool_hbm, [k_tail_ref, v_tail_ref if has_tail],
    #         o_ref, buf, m/l/acc scratch, sems
    scale: float,
    block_size: int,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    pages_per_chunk: int,
    num_table_pages: int,
    quantized: bool,
    has_tail: bool,
    sb: int,  # sequences per grid step
    window: int | None = None,  # sliding-window attention band
):
    rest = list(rest)
    tail_len_ref = rest.pop(0) if has_tail else None
    q_ref = rest.pop(0)  # [SB, nh, hd]
    pool_hbm = rest.pop(0)
    k_tail_ref = rest.pop(0) if has_tail else None  # [SB, T, F]
    v_tail_ref = rest.pop(0) if has_tail else None
    o_ref = rest.pop(0)  # [SB, nh, hd]
    buf, m_ref, l_ref, acc_ref, sems = rest
    gi = pl.program_id(0)
    c = pl.program_id(1)
    num_groups = pl.num_programs(0)
    num_chunks = pl.num_programs(1)
    ppc = pages_per_chunk
    span = ppc * block_size
    nh = num_kv_heads * group
    f = num_kv_heads * head_dim
    R = sb * nh

    def valid_pages_of(i):
        ctx = context_lens_ref[i]
        return jnp.clip(pl.cdiv(ctx, block_size), 0, num_table_pages)

    def tail_off():
        # the query sits tail_len positions past the pool contents
        return (tail_len_ref[0] + 1) if has_tail else 0

    def first_window_page(i):
        # sliding window: pages wholly below the attention floor skip their
        # DMA entirely (their columns are band-masked anyway)
        qend = context_lens_ref[i] + tail_off()
        return jnp.maximum(qend - window, 0) // block_size

    def rows_needed(gi_, cc, s_i, j):
        # valid rows of page (cc*ppc + j): <= 0 past context, >= block_size
        # for interior pages, partial for the last page
        i = gi_ * sb + s_i
        return context_lens_ref[i] - (cc * ppc + j) * block_size

    def span_copy(gi_, cc, slot, s_i, j, npages):
        # copy `npages` POOL-CONTIGUOUS pages in ONE DMA (the flat pool view
        # makes any page-aligned row range a static-shape copy). The block
        # manager allocates a sequence's pages sequentially, so serving
        # tables are mostly contiguous — fusing a page pair halves the DMA
        # issue count, the binding cost of this bandwidth-bound kernel.
        i = gi_ * sb + s_i
        page = block_tables_ref[i, cc * ppc + j]
        return pltpu.make_async_copy(
            pool_hbm.at[pl.ds(page * block_size, npages * block_size), :],
            buf.at[
                slot,
                pl.ds(s_i * span + j * block_size, npages * block_size),
                :,
            ],
            sems.at[slot],
        )

    def page_gate(gi_, cc, s_i, j):
        ok = rows_needed(gi_, cc, s_i, j) > 0
        if window is not None:
            ok &= j + cc * ppc >= first_window_page(gi_ * sb + s_i)
        return ok

    def each_fetch(gi_, cc, slot, start):
        def issue(cp):
            cp.start() if start else cp.wait()

        for s_i in range(sb):
            i = gi_ * sb + s_i
            gates = [page_gate(gi_, cc, s_i, j) for j in range(ppc)]
            j = 0
            while j < ppc:
                if j + 1 < ppc:
                    # fuse page j and j+1 when both are needed and adjacent
                    pair = (
                        gates[j] & gates[j + 1]
                        & (
                            block_tables_ref[i, cc * ppc + j] + 1
                            == block_tables_ref[i, cc * ppc + j + 1]
                        )
                    )

                    @pl.when(pair)
                    def _(j=j):
                        issue(span_copy(gi_, cc, slot, s_i, j, 2))

                    @pl.when(~pair & gates[j])
                    def _(j=j):
                        issue(span_copy(gi_, cc, slot, s_i, j, 1))

                    @pl.when(~pair & gates[j + 1])
                    def _(j=j):
                        issue(span_copy(gi_, cc, slot, s_i, j + 1, 1))

                    j += 2
                else:
                    @pl.when(gates[j])
                    def _(j=j):
                        issue(span_copy(gi_, cc, slot, s_i, j, 1))

                    j += 1

    def start_fetch(gi_, cc, slot):
        each_fetch(gi_, cc, slot, True)

    def wait_fetch(gi_, cc, slot):
        each_fetch(gi_, cc, slot, False)

    @pl.when((gi == 0) & (c == 0))
    def _warmup():
        start_fetch(0, 0, 0)

    g = gi * num_chunks + c
    slot = jax.lax.rem(g, 2)
    next_slot = jax.lax.rem(g + 1, 2)
    last_chunk = c == num_chunks - 1
    ng = jnp.where(last_chunk, gi + 1, gi)
    nc = jnp.where(last_chunk, 0, c + 1)

    @pl.when(ng < num_groups)
    def _prefetch():
        start_fetch(ng, nc, next_slot)

    wait_fetch(gi, c, slot)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    local = [context_lens_ref[gi * sb + s_i] - c * span for s_i in range(sb)]
    cdt = jnp.float32 if q_ref.dtype == jnp.float32 else jnp.bfloat16
    # per-sequence one-hot of each query head's kv head: [nh, nkv]
    head_of = jax.lax.broadcasted_iota(jnp.int32, (nh, num_kv_heads), 0) // group
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (nh, num_kv_heads), 1)
    onehot = (head_of == kv_idx).astype(jnp.float32)
    if quantized:
        lane = jax.lax.broadcasted_iota(jnp.int32, (nh, 128), 1)
        hof = jax.lax.broadcasted_iota(jnp.int32, (nh, 128), 0) // group
        oh_k = (lane == hof).astype(cdt)
        oh_v = (lane == hof + num_kv_heads).astype(cdt)

    def online_update(s_i, s, valid, v, vs_heads=None):
        """Online-softmax accumulation for sequence s_i's row block of the
        m/l/acc scratch. Chains of different s_i are data-independent."""
        rows = slice(s_i * nh, (s_i + 1) * nh)
        s = jnp.where(valid, s, _NEG_INF)
        m_prev = m_ref[rows, 0:1]
        l_prev = l_ref[rows, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[rows, 0:1] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[rows, 0:1] = m_new
        if vs_heads is not None:
            # scale rows past ctx are unfetched VMEM (may be NaN): re-mask
            p = jnp.where(valid, p * vs_heads, 0.0)
        if v.shape[0] == 1:
            # single-key tail chunk: the degenerate [nh,1]@[1,F]
            # matmul is an outer product — do it on the VPU (a dot_general
            # here also trips a Mosaic lowering bug: 'vector.broadcast'
            # bf16->f32 verification failure on (1,F) operands)
            pv = p * v.astype(jnp.float32)
        else:
            pv = jax.lax.dot_general(
                p.astype(cdt), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [nh, F]
        pv = (pv.reshape(nh, num_kv_heads, head_dim) * onehot[:, :, None]).sum(axis=1)
        acc_ref[rows, :] = acc_ref[rows, :] * alpha + pv

    for s_i in range(sb):
        @pl.when(local[s_i] > 0)
        def _chunk(s_i=s_i):
            rows = slice(s_i * span, (s_i + 1) * span)
            k, v, sc = _split_page(buf[slot, rows, :], f, quantized, cdt)
            # zero unfetched V rows (NaN x 0 = NaN through the PV matmul)
            vrow = jax.lax.broadcasted_iota(jnp.int32, (span, 1), 0)
            v_ok = vrow < local[s_i]
            if window is not None:
                # rows below the window floor were never DMA'd: zero too
                v_ok &= vrow >= local[s_i] + tail_off() - window
            v = jnp.where(v_ok, v, 0.0)

            q = q_ref[s_i].astype(jnp.float32)  # [nh, hd]
            qe = (q[:, None, :] * onehot[:, :, None]).reshape(nh, f)  # f32
            s = jax.lax.dot_general(
                qe.astype(cdt), k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [nh, span]
            col = jax.lax.broadcasted_iota(jnp.int32, (nh, span), 1)
            valid = col < local[s_i]
            if window is not None:  # band mask: keys within [qpos-W+1, qpos]
                valid &= col >= local[s_i] + tail_off() - window
            vs_heads = None
            if quantized:
                ks_heads = jax.lax.dot_general(
                    oh_k, sc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [nh, span]
                s = s * ks_heads
                vs_heads = jax.lax.dot_general(
                    oh_v, sc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            online_update(s_i, s, valid, v, vs_heads)

    if has_tail:
        t_max = k_tail_ref.shape[1]
        for s_i in range(sb):
            @pl.when(last_chunk & (context_lens_ref[gi * sb + s_i] > 0))
            def _tail(s_i=s_i):
                tl = tail_len_ref[0]
                kt = k_tail_ref[s_i].astype(cdt)  # [T, F]
                vt = v_tail_ref[s_i].astype(cdt)
                trow = jax.lax.broadcasted_iota(jnp.int32, (t_max, 1), 0)
                vt = jnp.where(trow <= tl, vt, 0.0)
                q = q_ref[s_i].astype(jnp.float32)
                qe = (q[:, None, :] * onehot[:, :, None]).reshape(nh, f).astype(cdt)
                if t_max == 1:
                    # single new token tail: [nh,F]x[1,F]
                    # mult-reduce on the VPU — cheaper than a 1-column MXU
                    # call, and dodges the Mosaic (1,F)-operand dot_general
                    # verification bug (see online_update)
                    s = jnp.sum(
                        qe.astype(jnp.float32) * kt.astype(jnp.float32),
                        axis=1, keepdims=True,
                    ) * scale  # [nh, 1]
                else:
                    s = jax.lax.dot_general(
                        qe, kt, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale  # [nh, T]
                col = jax.lax.broadcasted_iota(jnp.int32, (nh, t_max), 1)
                online_update(s_i, s, col <= tl, vt)

    @pl.when(last_chunk)
    def _finish():
        l = jnp.maximum(l_ref[:, 0:1], 1e-20)
        out = acc_ref[...] / l
        # fully-masked padding rows (ctx <= 0) must produce zeros; build the
        # per-row ctx arithmetically (Mosaic rejects i1-vector selects)
        orow = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        octx = jnp.zeros((R, 1), jnp.int32)
        for s_i in range(sb):
            octx = jnp.where(orow // nh == s_i, context_lens_ref[gi * sb + s_i], octx)
        out = jnp.where(octx > 0, out, 0.0)
        o_ref[...] = out.reshape(sb, nh, head_dim).astype(o_ref.dtype)


def paged_decode_attention_v3(
    q, pool, block_tables, context_lens, *,
    block_size, scale, interpret=False,
    max_pages_per_chunk=None, seqs_per_step=4, k_tail=None, v_tail=None,
    tail_len=None, window=None, attn_vmem_mb=None,
):
    """Unjitted wrapper: BYOX_ATTN_VMEM_MB is resolved
    HERE so the jit cache keys on their values — an in-jit env read bakes the
    first trace's value per shape, silently reusing the stale variant in A/B
    sweeps (ADVICE r4; same trap as BYOX_QMM_POST_SCALE in ops/quant.py).

    Defaults (measured, v5e, 8B geometry B=128 ctx~150 int8): VMEM budget
    8 MiB fits both 128-token pages of a serving-length context in ONE chunk
    (4 MiB split them: engine-shaped decode 17.90 -> 15.74 ms/step).
    Validity-gated SUB-page fetches of the last partial page were measured
    and deleted: 64-row granularity was a wash, 32-row a loss (DMA issue
    count outweighs the ~1.7x tail-page overfetch it saves). An int8-MXU
    QK/PV variant (per-row int8 quantization of q and p, raw int8 page
    tiles, no cast/mask VPU passes) was measured and DELETED: engine-shaped
    16.29 vs 15.76 ms/step — the per-row quantize/rescale VPU work costs
    more than the [span, F] casts it removes at serving spans."""
    import os as _os

    if attn_vmem_mb is None:
        attn_vmem_mb = int(_os.environ.get("BYOX_ATTN_VMEM_MB", "8"))
    return _paged_decode_attention_v3(
        q, pool, block_tables, context_lens,
        block_size=block_size, scale=scale, interpret=interpret,
        max_pages_per_chunk=max_pages_per_chunk,
        seqs_per_step=seqs_per_step, k_tail=k_tail, v_tail=v_tail,
        tail_len=tail_len, window=window, attn_vmem_mb=attn_vmem_mb,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "scale", "interpret", "max_pages_per_chunk", "seqs_per_step",
        "window", "attn_vmem_mb",
    ),
)
def _paged_decode_attention_v3(
    q: jnp.ndarray,  # [B, nh, hd]
    pool: jnp.ndarray,  # [S, 2*F(+256)] merged
    block_tables: jnp.ndarray,  # [B, W] int32, -1 padding
    context_lens: jnp.ndarray,  # [B] int32
    *,
    block_size: int,
    scale: float,
    interpret: bool = False,
    max_pages_per_chunk: int | None = None,
    seqs_per_step: int = 4,
    k_tail=None,  # [B, T, nkv, hd] float: window-staged new K/V rows
    v_tail=None,
    tail_len=None,  # scalar int32: tail rows 0..tail_len attend
    window: int | None = None,  # sliding-window attention (band mask + DMA skip)
    attn_vmem_mb: int = 8,
):
    b, nh, hd = q.shape
    s, width = pool.shape
    quantized = pool.dtype == jnp.int8
    f = pool_feature_dim(pool)
    nkv = f // hd
    w = block_tables.shape[1]
    group = nh // nkv
    # the kernel DMAs page-aligned row ranges of the FLAT pool so adjacent
    # pages can fuse into one copy (span_copy)
    has_tail = k_tail is not None
    sb = seqs_per_step
    assert b % sb == 0, (b, sb)
    tables = jnp.maximum(block_tables, 0).astype(jnp.int32)

    # chunk size: stay within a VMEM budget of double-buffered merged pages
    # per seq set. Tunable: larger sb needs a larger budget to keep one chunk
    # (sb=8 at 4 MiB split into 2 chunks and LOST — ablate_sb8 r4)
    budget = attn_vmem_mb * 1024 * 1024
    bytes_per_page = block_size * width * pool.dtype.itemsize * 2 * sb  # 2 slots
    ppc = max(1, min(w, budget // max(bytes_per_page, 1)))
    if max_pages_per_chunk is not None:
        ppc = max(1, min(ppc, max_pages_per_chunk))
    num_chunks = -(-w // ppc)
    span = ppc * block_size

    nsp = 2 + (1 if has_tail else 0)

    def _idx(fn):
        # index maps take (grid..., *scalar_prefetch_refs)
        if has_tail:
            return lambda i, c, bt, ctx, tl: fn(i, c)
        return lambda i, c, bt, ctx: fn(i, c)

    in_specs = [
        pl.BlockSpec((sb, nh, hd), _idx(lambda i, c: (i, 0, 0))),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [q, pool]
    scratch = [pltpu.VMEM((2, sb * span, width), pool.dtype)]
    if has_tail:
        t_max = k_tail.shape[1]
        in_specs += [
            pl.BlockSpec((sb, t_max, f), _idx(lambda i, c: (i, 0, 0))),
            pl.BlockSpec((sb, t_max, f), _idx(lambda i, c: (i, 0, 0))),
        ]
        operands += [k_tail.reshape(b, t_max, f), v_tail.reshape(b, t_max, f)]
    out_specs = pl.BlockSpec((sb, nh, hd), _idx(lambda i, c: (i, 0, 0)))
    out_shape = jax.ShapeDtypeStruct((b, nh, hd), q.dtype)
    scratch += [
        pltpu.VMEM((sb * nh, 128), jnp.float32),  # m
        pltpu.VMEM((sb * nh, 128), jnp.float32),  # l
        pltpu.VMEM((sb * nh, hd), jnp.float32),  # acc
        pltpu.SemaphoreType.DMA((2,)),
    ]

    prefetch = [tables, context_lens.astype(jnp.int32)]
    if has_tail:
        prefetch.append(jnp.asarray(tail_len, jnp.int32).reshape(1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(b // sb, num_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_kernel_v3,
        scale=scale,
        block_size=block_size,
        num_kv_heads=nkv,
        group=group,
        head_dim=hd,
        pages_per_chunk=ppc,
        num_table_pages=w,
        quantized=quantized,
        has_tail=has_tail,
        sb=sb,
        window=window,
    )
    if window is not None and has_tail:
        # tail rows are the newest positions: the oldest attended tail row is
        # tail_index <= t_max - 1 <= window - 1 behind the query, so
        # window >= t_max keeps every tail row inside the band (the kernel's
        # tail chunk applies no window mask)
        assert window >= k_tail.shape[1], (window, k_tail.shape)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*prefetch, *operands)
