"""Pallas prefill attention kernel vs the dense XLA fallback (interpret mode),
covering ragged batches, prefix-cache contexts, and padding rows."""

import jax.numpy as jnp
import numpy as np
import pytest

from byox_vllm_tpu.ops.attention import paged_attention_dense
from byox_vllm_tpu.ops.kv_cache import row_width, write_kv
from byox_vllm_tpu.ops.prefill_attention import paged_prefill_attention


def build(rng, ctx_lens, q_lens, nh=8, nkv=4, hd=128, bs=16, w=8, tq=32):
    b = len(ctx_lens)
    S = 32 * bs
    pool = jnp.zeros((S, row_width(nkv * hd, False)), jnp.float32)
    tables = np.full((b, w), -1, np.int32)
    nxt = 0
    for i, c in enumerate(ctx_lens):
        for j in range(-(-c // bs) if c else 0):
            tables[i, j] = nxt
            hi = min(c, (j + 1) * bs) - j * bs
            slots = list(range(nxt * bs, nxt * bs + hi))
            rows_k = jnp.asarray(rng.normal(size=(len(slots), nkv, hd)), jnp.float32)
            rows_v = jnp.asarray(rng.normal(size=(len(slots), nkv, hd)), jnp.float32)
            pool = write_kv(pool, rows_k, rows_v, jnp.asarray(slots, jnp.int32))
            nxt += 1
    q = jnp.asarray(rng.normal(size=(b, tq, nh, hd)), jnp.float32)
    ctx = jnp.asarray(ctx_lens, jnp.int32)
    ql = jnp.asarray(q_lens, jnp.int32)
    positions = (ctx - ql)[:, None] + jnp.arange(tq, dtype=jnp.int32)[None, :]
    return q, pool, jnp.asarray(tables), ctx, ql, positions


@pytest.mark.parametrize(
    "ctx_lens,q_lens",
    [
        ([20], [20]),            # single seq, plain prefill
        ([30, 17], [30, 17]),    # ragged batch
        ([40, 25], [8, 25]),     # seq 0 has a 32-token cached prefix
        ([19, 0], [19, 0]),      # padding row
    ],
)
def test_prefill_kernel_matches_dense(ctx_lens, q_lens):
    rng = np.random.default_rng(0)
    bs = 16
    q, pool, tables, ctx, ql, positions = build(rng, ctx_lens, q_lens, bs=bs)
    scale = 128**-0.5
    ref = paged_attention_dense(q, pool, tables, ctx, positions, bs, scale)
    out = paged_prefill_attention(
        q, pool, tables, ctx, ql, block_size=bs, scale=scale, interpret=True
    )
    # compare only real query rows (padding rows are discarded downstream)
    for i, qn in enumerate(q_lens):
        np.testing.assert_allclose(
            np.asarray(out[i, :qn]), np.asarray(ref[i, :qn]), rtol=1e-5, atol=1e-5
        )


def test_prefill_kernel_int8_matches_dense():
    """INT8 KV pool: per-(token, head) scale dequant inside the kernel."""
    from byox_vllm_tpu.ops.kv_cache import write_kv_quant

    rng = np.random.default_rng(2)
    bs = 16
    ctx_lens, q_lens = [30, 17], [30, 17]
    b, nh, nkv, hd = 2, 8, 4, 128
    tq = max(q_lens)
    S = 16 * bs
    pool = jnp.zeros((S, row_width(nkv * hd, True)), jnp.int8)
    tables = np.full((b, 4), -1, np.int32)
    nxt = 0
    for i, c in enumerate(ctx_lens):
        nblk = -(-c // bs)
        slots = []
        for j in range(nblk):
            tables[i, j] = nxt
            hi = min(c, (j + 1) * bs) - j * bs
            slots += list(range(nxt * bs, nxt * bs + hi))
            nxt += 1
        rows_k = jnp.asarray(rng.normal(size=(len(slots), nkv, hd)), jnp.float32)
        rows_v = jnp.asarray(rng.normal(size=(len(slots), nkv, hd)), jnp.float32)
        pool = write_kv_quant(pool, rows_k, rows_v, jnp.asarray(slots, jnp.int32))
    tables = jnp.asarray(tables)
    ctx = jnp.asarray(ctx_lens, jnp.int32)
    ql = jnp.asarray(q_lens, jnp.int32)
    q = jnp.asarray(rng.normal(size=(b, tq, nh, hd)), jnp.float32)
    positions = (ctx - ql)[:, None] + jnp.arange(tq, dtype=jnp.int32)[None, :]
    scale = hd**-0.5
    ref = paged_attention_dense(q, pool, tables, ctx, positions, bs, scale)
    out = paged_prefill_attention(
        q, pool, tables, ctx, ql, block_size=bs, scale=scale, interpret=True,
    )
    for i, qn in enumerate(q_lens):
        np.testing.assert_allclose(
            np.asarray(out[i, :qn]), np.asarray(ref[i, :qn]), rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize(
    "ctx_lens,q_lens,window",
    [
        ([20], [20], 8),          # window smaller than the prompt
        ([30, 17], [30, 17], 12), # ragged batch
        ([40, 25], [8, 25], 16),  # cached prefix + window floor mid-history
        ([64], [64], 24),         # floor crosses several pages (DMA low-clamp)
        ([19, 0], [19, 0], 6),    # padding row
    ],
)
def test_prefill_kernel_window_matches_dense(ctx_lens, q_lens, window):
    """Sliding-window band mask + below-window page-DMA skip (the decode v3
    kernel's window semantics, extended to prefill — VERDICT r2 item 6)."""
    rng = np.random.default_rng(7)
    bs = 16
    q, pool, tables, ctx, ql, positions = build(rng, ctx_lens, q_lens, bs=bs)
    scale = 128**-0.5
    ref = paged_attention_dense(
        q, pool, tables, ctx, positions, bs, scale, window=window
    )
    out = paged_prefill_attention(
        q, pool, tables, ctx, ql, block_size=bs, scale=scale, interpret=True,
        window=window,
    )
    for i, qn in enumerate(q_lens):
        np.testing.assert_allclose(
            np.asarray(out[i, :qn]), np.asarray(ref[i, :qn]), rtol=1e-5, atol=1e-5
        )
