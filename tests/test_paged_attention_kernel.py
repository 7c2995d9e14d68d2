"""Pallas paged decode kernel vs the dense XLA fallback (interpret mode on
CPU; the compiled path runs on real TPU via bench/driver). Pools use the
MERGED layout (ops/kv_cache.py): one array holds K | V (| scale bytes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from byox_vllm_tpu.ops.attention import paged_attention_dense
from byox_vllm_tpu.ops.kv_cache import row_width, write_kv, write_kv_quant
from byox_vllm_tpu.ops.paged_attention import paged_decode_attention


def make_case(rng, b, nh, nkv, hd, bs, w, ctx_lens):
    num_slots = 8 * bs * max(1, b)
    q = jnp.asarray(rng.normal(size=(b, 1, nh, hd)), jnp.float32)
    pool = jnp.zeros((num_slots, row_width(nkv * hd, False)), jnp.float32)
    tables = np.full((b, w), -1, np.int32)
    next_block = 0
    for i, ctx in enumerate(ctx_lens):
        nblk = -(-ctx // bs) if ctx else 0
        slots = []
        for j in range(nblk):
            tables[i, j] = next_block
            lo = j * bs
            hi = min(ctx, lo + bs)
            slots += list(range(next_block * bs + 0, next_block * bs + hi - lo))
            next_block += 1
        if slots:
            kv_rows = jnp.asarray(rng.normal(size=(len(slots), nkv, hd)), jnp.float32)
            vv_rows = jnp.asarray(rng.normal(size=(len(slots), nkv, hd)), jnp.float32)
            pool = write_kv(pool, kv_rows, vv_rows, jnp.asarray(slots, jnp.int32))
    return q, pool, jnp.asarray(tables), jnp.asarray(ctx_lens, jnp.int32)


@pytest.mark.parametrize(
    "ctx_lens",
    [
        [7],  # single short seq, partial page
        [16, 9, 32],  # mixed, exact page boundary
        [1, 0, 40, 25],  # includes a padding row (ctx 0)
    ],
)
def test_kernel_matches_dense(ctx_lens):
    rng = np.random.default_rng(0)
    b, nh, nkv, hd, bs = len(ctx_lens), 8, 4, 128, 16
    w = 4
    q, pool, tables, ctx = make_case(rng, b, nh, nkv, hd, bs, w, ctx_lens)
    scale = hd**-0.5
    positions = (ctx - 1)[:, None]

    ref = paged_attention_dense(q, pool, tables, ctx, positions, bs, scale)
    out = paged_decode_attention(
        q[:, 0], pool, tables, ctx, block_size=bs, scale=scale, interpret=True
    )
    # padding rows (ctx 0): kernel returns zeros; dense returns garbage-masked
    # uniform average — compare only valid rows
    valid = np.asarray(ctx) > 0
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[:, 0][valid], rtol=1e-5, atol=1e-5
    )
    assert np.abs(np.asarray(out)[~valid]).max(initial=0.0) == 0.0


def test_kernel_gqa_group1():
    """nh == nkv (no grouping) still works."""
    rng = np.random.default_rng(1)
    q, pool, tables, ctx = make_case(rng, 2, 4, 4, 128, 16, 2, [20, 31])
    out = paged_decode_attention(
        q[:, 0], pool, tables, ctx, block_size=16, scale=128**-0.5, interpret=True
    )
    ref = paged_attention_dense(q, pool, tables, ctx, (ctx - 1)[:, None], 16, 128**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[:, 0], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "ctx_lens",
    [
        [7],
        [16, 9, 32],
        [1, 0, 40, 25],
    ],
)
def test_kernel_v2_matches_dense(ctx_lens):
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v2

    rng = np.random.default_rng(0)
    b, nh, nkv, hd, bs = len(ctx_lens), 8, 4, 128, 16
    w = 4
    q, pool, tables, ctx = make_case(rng, b, nh, nkv, hd, bs, w, ctx_lens)
    scale = hd**-0.5
    positions = (ctx - 1)[:, None]

    ref = paged_attention_dense(q, pool, tables, ctx, positions, bs, scale)
    out = paged_decode_attention_v2(
        q[:, 0], pool, tables, ctx, block_size=bs, scale=scale, interpret=True
    )
    valid = np.asarray(ctx) > 0
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[:, 0][valid], rtol=1e-5, atol=1e-5
    )
    assert np.abs(np.asarray(out)[~valid]).max(initial=0.0) == 0.0


def make_int8_case(rng, b, nh, nkv, hd, bs, w, ctx):
    S = 16 * bs
    pool = jnp.zeros((S, row_width(nkv * hd, True)), jnp.int8)
    tables = np.full((b, w), -1, np.int32)
    nxt = 0
    for i, c in enumerate(ctx):
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
    return pool, jnp.asarray(tables), jnp.asarray(ctx, jnp.int32)


@pytest.mark.parametrize("ppc", [None, 2])
def test_kernel_v2_int8_matches_dense(ppc):
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v2

    rng = np.random.default_rng(1)
    b, nh, nkv, hd, bs, w = 2, 8, 4, 128, 16, 3
    pool, tables, ctx_a = make_int8_case(rng, b, nh, nkv, hd, bs, w, [20, 37])
    q = jnp.asarray(rng.normal(size=(b, 1, nh, hd)), jnp.float32)
    scale = hd**-0.5
    ref = paged_attention_dense(
        q, pool, tables, ctx_a, (ctx_a - 1)[:, None], bs, scale
    )
    out = paged_decode_attention_v2(
        q[:, 0], pool, tables, ctx_a, block_size=bs, scale=scale,
        interpret=True, max_pages_per_chunk=ppc,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[:, 0], rtol=1e-4, atol=1e-4)


def test_kernel_v1_int8_matches_dense():
    rng = np.random.default_rng(1)
    b, nh, nkv, hd, bs, w = 2, 8, 4, 128, 16, 3
    pool, tables, ctx_a = make_int8_case(rng, b, nh, nkv, hd, bs, w, [20, 37])
    q = jnp.asarray(rng.normal(size=(b, 1, nh, hd)), jnp.float32)
    scale = hd**-0.5
    ref = paged_attention_dense(
        q, pool, tables, ctx_a, (ctx_a - 1)[:, None], bs, scale
    )
    out = paged_decode_attention(
        q[:, 0], pool, tables, ctx_a, block_size=bs, scale=scale, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[:, 0], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ppc", [1, 2, 3])
def test_kernel_v2_multichunk_matches_dense(ppc):
    """Online softmax across chunks (long-context path) matches dense."""
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v2

    rng = np.random.default_rng(2)
    ctx_lens = [60, 17, 0, 33]
    b, nh, nkv, hd, bs = len(ctx_lens), 8, 4, 128, 16
    w = 4
    q, pool, tables, ctx = make_case(rng, b, nh, nkv, hd, bs, w, ctx_lens)
    scale = hd**-0.5
    ref = paged_attention_dense(q, pool, tables, ctx, (ctx - 1)[:, None], bs, scale)
    out = paged_decode_attention_v2(
        q[:, 0], pool, tables, ctx, block_size=bs, scale=scale,
        interpret=True, max_pages_per_chunk=ppc,
    )
    valid = np.asarray(ctx) > 0
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[:, 0][valid], rtol=1e-5, atol=1e-5
    )
    assert np.abs(np.asarray(out)[~valid]).max(initial=0.0) == 0.0


def test_v2_kernel_tail_matches_dense_merge():
    """Window-staged decode: the in-kernel tail chunk must equal attention
    over pool+tail computed densely (the engine's dense fallback path)."""
    from byox_vllm_tpu.ops.attention import decode_attention_with_tail
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v2

    rng = np.random.default_rng(5)
    b, nh, nkv, hd, bs, w = 3, 8, 4, 128, 16, 4
    ctx_lens = [20, 1, 0]  # pool tokens (pre-window); row 2 is padding
    q4, pool, tables, ctx = make_case(rng, b, nh, nkv, hd, bs, w, ctx_lens)
    q = q4[:, 0]
    t_max = 8
    k_tail = jnp.asarray(rng.normal(size=(b, t_max, nkv, hd)), jnp.float32)
    v_tail = jnp.asarray(rng.normal(size=(b, t_max, nkv, hd)), jnp.float32)
    scale = hd**-0.5
    for tail_len in (0, 3, 7):
        out_kernel = paged_decode_attention_v2(
            q, pool, tables, ctx, block_size=bs, scale=scale,
            interpret=True, k_tail=k_tail, v_tail=v_tail,
            tail_len=jnp.int32(tail_len),
        )
        out_dense = decode_attention_with_tail(
            q, pool, tables, ctx, k_tail, v_tail,
            jnp.int32(tail_len), bs, scale, backend="dense",
        )
        np.testing.assert_allclose(
            np.asarray(out_kernel[:2]), np.asarray(out_dense[:2]), rtol=2e-5, atol=2e-5
        )
        # padding row (pool ctx 0 => pool_ctx<=0): kernel zeroes it
        assert np.all(np.isfinite(np.asarray(out_kernel[2])))


def test_v2_kernel_return_ml():
    """m/l outputs must reproduce the softmax stats of the dense path."""
    rng = np.random.default_rng(6)
    b, nh, nkv, hd, bs, w = 2, 8, 4, 128, 16, 4
    ctx_lens = [20, 33]
    from byox_vllm_tpu.ops.attention import _paged_attention_ml
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v2

    q4, pool, tables, ctx = make_case(rng, b, nh, nkv, hd, bs, w, ctx_lens)
    q = q4[:, 0]
    scale = hd**-0.5
    out, ml = paged_decode_attention_v2(
        q, pool, tables, ctx, block_size=bs, scale=scale,
        interpret=True, return_ml=True,
    )
    o_d, m_d, l_d = _paged_attention_ml(
        q, pool, tables, ctx, bs, scale, backend="dense"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(o_d), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ml[..., 0]), np.asarray(m_d), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ml[..., 1]), np.asarray(l_d), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sb", [2, 4])
def test_v3_kernel_matches_dense(sb):
    """SB-batched kernel (block-diagonal masking) vs the dense fallback,
    ragged contexts including zero-context padding rows."""
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v3

    rng = np.random.default_rng(7)
    b, nh, nkv, hd, bs, w = 8, 8, 4, 128, 16, 6
    ctx_lens = [7, 33, 0, 96, 16, 1, 50, 0]
    q4, pool, tables, ctx = make_case(rng, b, nh, nkv, hd, bs, w, ctx_lens)
    scale = hd**-0.5
    positions = (ctx - 1)[:, None]
    ref = paged_attention_dense(q4, pool, tables, ctx, positions, bs, scale)
    out = paged_decode_attention_v3(
        q4[:, 0], pool, tables, ctx, block_size=bs, scale=scale,
        interpret=True, seqs_per_step=sb, max_pages_per_chunk=2,
    )
    for i, c in enumerate(ctx_lens):
        if c == 0:
            assert np.allclose(np.asarray(out[i]), 0.0)
        else:
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(ref[i, 0]), rtol=2e-5, atol=2e-5
            )


def test_v3_kernel_int8_and_tail():
    """v3 with int8 pool + window tail vs the dense merge path."""
    from byox_vllm_tpu.ops.attention import decode_attention_with_tail
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v3

    rng = np.random.default_rng(8)
    b, nh, nkv, hd, bs = 4, 8, 4, 128, 16
    ctx_lens = [20, 5, 37, 0]
    S = 32 * bs
    pool = jnp.zeros((S, row_width(nkv * hd, True)), jnp.int8)
    tables = np.full((b, 4), -1, np.int32)
    nxt = 0
    for i, c in enumerate(ctx_lens):
        for j in range(-(-c // bs)):
            tables[i, j] = nxt
            hi = min(c, (j + 1) * bs) - j * bs
            slots = jnp.asarray(range(nxt * bs, nxt * bs + hi), jnp.int32)
            rows_k = jnp.asarray(rng.normal(size=(hi, nkv, hd)), jnp.float32)
            rows_v = jnp.asarray(rng.normal(size=(hi, nkv, hd)), jnp.float32)
            pool = write_kv_quant(pool, rows_k, rows_v, slots)
            nxt += 1
    tables = jnp.asarray(tables)
    ctx = jnp.asarray(ctx_lens, jnp.int32)
    q = jnp.asarray(rng.normal(size=(b, nh, hd)), jnp.float32)
    t_max = 8
    k_tail = jnp.asarray(rng.normal(size=(b, t_max, nkv, hd)), jnp.float32)
    v_tail = jnp.asarray(rng.normal(size=(b, t_max, nkv, hd)), jnp.float32)
    scale = hd**-0.5
    for tl in (0, 5):
        out = paged_decode_attention_v3(
            q, pool, tables, ctx, block_size=bs, scale=scale, interpret=True,
            seqs_per_step=2, k_tail=k_tail, v_tail=v_tail,
            tail_len=jnp.int32(tl),
        )
        ref = decode_attention_with_tail(
            q, pool, tables, ctx, k_tail, v_tail, jnp.int32(tl), bs, scale,
            backend="dense",
        )
        for i, c in enumerate(ctx_lens):
            if c == 0:
                assert np.all(np.isfinite(np.asarray(out[i])))
            else:
                np.testing.assert_allclose(
                    np.asarray(out[i]), np.asarray(ref[i]), rtol=1e-4, atol=1e-4
                )


@pytest.mark.parametrize("kv", ["bf16", "int8"])
def test_v3_partial_and_fused_pages(kv):
    """v3's fused contiguous-page DMA path: contexts straddling page
    boundaries (incl. exact multiples and a padding row) on contiguous AND
    non-contiguous block tables must match dense."""
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v3

    rng = np.random.default_rng(5)
    ctx_lens = [1, 64, 65, 100, 128, 0, 17, 33]
    b, nh, nkv, hd, bs, w = len(ctx_lens), 8, 4, 128, 64, 2
    if kv == "int8":
        pool, tables, ctx = make_int8_case(rng, b, nh, nkv, hd, bs, w, ctx_lens)
        q = jnp.asarray(rng.normal(size=(b, 1, nh, hd)), jnp.float32)
    else:
        q, pool, tables, ctx = make_case(rng, b, nh, nkv, hd, bs, w, ctx_lens)
    scale = hd**-0.5
    ref = paged_attention_dense(q, pool, tables, ctx, (ctx - 1)[:, None], bs, scale)
    out = paged_decode_attention_v3(
        q[:, 0], pool, tables, ctx, block_size=bs, scale=scale,
        interpret=True, seqs_per_step=2,
    )
    valid = np.asarray(ctx) > 0
    tol = 1e-4 if kv == "bf16" else 2e-2
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[:, 0][valid], rtol=tol, atol=tol
    )
    assert np.abs(np.asarray(out)[~valid]).max(initial=0.0) == 0.0


def test_v3_noncontiguous_tables():
    """Interleaved page allocation (pages of one sequence NOT adjacent in
    the pool): the fused-pair DMA must fall back to per-page copies."""
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v3

    rng = np.random.default_rng(9)
    b, nh, nkv, hd, bs, w = 2, 8, 4, 128, 64, 3
    ctx_lens = [150, 130]
    S = 16 * bs
    pool = jnp.asarray(rng.normal(size=(S, 2 * nkv * hd)), jnp.bfloat16)
    # round-robin allocation: seq0 gets pages 0,2,4; seq1 gets 1,3,5
    tables = np.full((b, w), -1, np.int32)
    for i in range(b):
        for j in range(-(-ctx_lens[i] // bs)):
            tables[i, j] = 2 * j + i
    tables = jnp.asarray(tables)
    ctx = jnp.asarray(ctx_lens, jnp.int32)
    q = jnp.asarray(rng.normal(size=(b, 1, nh, hd)), jnp.bfloat16)
    scale = hd**-0.5
    ref = paged_attention_dense(q, pool, tables, ctx, (ctx - 1)[:, None], bs, scale)
    out = paged_decode_attention_v3(
        q[:, 0], pool, tables, ctx, block_size=bs, scale=scale,
        interpret=True, seqs_per_step=2,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32)[:, 0],
        rtol=2e-2, atol=2e-2,
    )


# (An int8-MXU QK/PV decode variant and its parity test lived here briefly in
# round 5 — measured engine-shaped 16.29 vs 15.76 ms/step and deleted; the
# per-row quantize/rescale VPU work outweighs the casts it removes.)
