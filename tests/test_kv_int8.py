"""INT8 KV cache: quantized write/gather roundtrip, Pallas kernel parity,
and end-to-end engine generation staying faithful to the bf16-cache model."""

import jax.numpy as jnp
import numpy as np
import pytest

from byox_vllm_tpu.ops.kv_cache import gather_kv_quant, write_kv, write_kv_quant, gather_kv


def test_quant_write_gather_roundtrip():
    from byox_vllm_tpu.ops.kv_cache import SCALE_LANES

    rng = np.random.default_rng(0)
    nkv, hd, S = 2, 16, 64
    k_new = jnp.asarray(rng.normal(0, 2.0, (5, nkv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.normal(0, 0.5, (5, nkv, hd)), jnp.float32)
    kp = jnp.zeros((S, nkv * hd), jnp.int8)
    vp = jnp.zeros((S, nkv * hd), jnp.int8)
    sc = jnp.zeros((S, SCALE_LANES), jnp.bfloat16)
    slots = jnp.asarray([0, 1, 2, 3, -1], jnp.int32)  # last row dropped
    kp, vp, sc = write_kv_quant(kp, vp, sc, k_new, v_new, slots)

    tables = jnp.asarray([[0]], jnp.int32)  # block 0 -> slots 0..63 (bs=64)
    out = gather_kv_quant(kp, sc, 0, tables, 64, hd)
    ref = np.asarray(k_new[:4])
    got = np.asarray(out[0, :4])
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2 * np.abs(ref).max())
    assert np.abs(np.asarray(out[0, 4:])).max() == 0  # dropped + unwritten rows zero
    out_v = gather_kv_quant(vp, sc, nkv, tables, 64, hd)
    ref_v = np.asarray(v_new[:4])
    np.testing.assert_allclose(
        np.asarray(out_v[0, :4]), ref_v, rtol=2e-2, atol=2e-2 * np.abs(ref_v).max()
    )


def test_paged_kernel_int8_matches_dense():
    from byox_vllm_tpu.ops.attention import paged_attention_dense
    from byox_vllm_tpu.ops.kv_cache import SCALE_LANES
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention

    rng = np.random.default_rng(1)
    b, nh, nkv, hd, bs, w = 2, 8, 4, 128, 16, 3
    ctx = [20, 37]
    S = 16 * bs
    kp = jnp.zeros((S, nkv * hd), jnp.int8)
    vp = jnp.zeros((S, nkv * hd), jnp.int8)
    sc = jnp.zeros((S, SCALE_LANES), jnp.bfloat16)
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
        kp, vp, sc = write_kv_quant(kp, vp, sc, rows_k, rows_v, jnp.asarray(slots, jnp.int32))
    tables = jnp.asarray(tables)
    ctx_a = jnp.asarray(ctx, jnp.int32)
    q = jnp.asarray(rng.normal(size=(b, 1, nh, hd)), jnp.float32)
    scale = hd**-0.5

    ref = paged_attention_dense(
        q, kp, vp, tables, ctx_a, (ctx_a - 1)[:, None], bs, scale, kv_scales=sc
    )
    out = paged_decode_attention(
        q[:, 0], kp, vp, tables, ctx_a, block_size=bs, scale=scale,
        interpret=True, kv_scales=sc,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:, 0]), rtol=1e-4, atol=1e-4)


def test_engine_e2e_kv_int8(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    Qwen3ForCausalLM(cfg).eval().save_pretrained(tmp_path, safe_serialization=True)
    common = dict(
        dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=32, kvcache_block_size=16,
    )
    prompts = [[1, 2, 3, 4, 5, 6, 7, 8]]
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    plain = LLM(str(tmp_path), **common).generate(prompts, sp, use_tqdm=False)
    q8 = LLM(str(tmp_path), kv_cache_dtype="int8", **common).generate(prompts, sp, use_tqdm=False)
    # int8 KV with per-(token, head) scales tracks fp32 closely on 2 layers
    assert q8[0]["token_ids"] == plain[0]["token_ids"]


def test_put_kv_rows_matches_scatter():
    """Aligned-DMA-put decode store (row-tiled pools) == the XLA row
    scatter, including skipped padding rows (slot -1) and both dtypes."""
    import jax.numpy as jnp
    import numpy as np

    from byox_vllm_tpu.ops.kv_cache import can_row_tile, put_kv_rows

    rng = np.random.default_rng(3)
    for dtype in (jnp.int8, jnp.bfloat16):
        S, F, N = 192, 1024, 16
        assert can_row_tile(F)
        base = rng.integers(-90, 90, (2, S, F)).astype(np.int8)
        kp = jnp.asarray(base[0]).astype(dtype)
        vp = jnp.asarray(base[1]).astype(dtype)
        rows = rng.integers(-90, 90, (2, N, F)).astype(np.int8)
        rk = jnp.asarray(rows[0]).astype(dtype)
        rv = jnp.asarray(rows[1]).astype(dtype)
        slots = np.full(N, -1, np.int32)
        slots[: N // 2] = rng.choice(S, N // 2, replace=False)
        slots_j = jnp.asarray(slots)

        got_k, got_v = put_kv_rows(
            (kp.reshape(S * 8, F // 8), vp.reshape(S * 8, F // 8)),
            (rk, rv), slots_j, interpret=True,
        )
        sl = jnp.where(slots_j < 0, S, slots_j)
        ref_k = kp.at[sl].set(rk, mode="drop")
        ref_v = vp.at[sl].set(rv, mode="drop")
        np.testing.assert_array_equal(
            np.asarray(got_k.reshape(S, F)).astype(np.float32),
            np.asarray(ref_k).astype(np.float32),
        )
        np.testing.assert_array_equal(
            np.asarray(got_v.reshape(S, F)).astype(np.float32),
            np.asarray(ref_v).astype(np.float32),
        )


def test_write_kv_dispatches_on_row_tiled_pools():
    """write_kv / write_kv_quant accept both layouts and agree with the
    flat-scatter reference, including the run-DUS prefill variants."""
    import jax.numpy as jnp
    import numpy as np

    from byox_vllm_tpu.ops.kv_cache import (
        quantize_kv_rows,
        write_kv,
        write_kv_quant,
        write_kv_runs,
        write_kv_runs_quant,
    )

    rng = np.random.default_rng(5)
    S, nkv, hd, N, BS = 128, 8, 128, 8, 16
    F = nkv * hd
    k_new = jnp.asarray(rng.normal(size=(N, nkv, hd)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(N, nkv, hd)).astype(np.float32))
    slots = np.full(N, -1, np.int32)
    slots[: N - 2] = rng.choice(S, N - 2, replace=False)
    sj = jnp.asarray(slots)

    flat = (jnp.zeros((S, F), jnp.bfloat16), jnp.zeros((S, F), jnp.bfloat16))
    tiled = tuple(p.reshape(S * 8, F // 8) for p in flat)
    fk, fv = write_kv(*flat, k_new, v_new, sj)
    tk, tv = write_kv(*tiled, k_new, v_new, sj)
    np.testing.assert_array_equal(
        np.asarray(fk).astype(np.float32), np.asarray(tk.reshape(S, F)).astype(np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(fv).astype(np.float32), np.asarray(tv.reshape(S, F)).astype(np.float32)
    )

    sc = jnp.zeros((S, 128), jnp.bfloat16)
    qflat = (jnp.zeros((S, F), jnp.int8), jnp.zeros((S, F), jnp.int8), sc)
    qtiled = (qflat[0].reshape(S * 8, F // 8), qflat[1].reshape(S * 8, F // 8), sc)
    fk, fv, fs = write_kv_quant(*qflat, k_new, v_new, sj)
    tk, tv, ts = write_kv_quant(*qtiled, k_new, v_new, sj)
    np.testing.assert_array_equal(np.asarray(fk), np.asarray(tk.reshape(S, F)))
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(tv.reshape(S, F)))
    np.testing.assert_array_equal(
        np.asarray(fs).astype(np.float32), np.asarray(ts).astype(np.float32)
    )

    # run-DUS prefill store: one full block at dst 2, rows 0.. of the batch
    run_dst = jnp.asarray([2 * BS], jnp.int32)
    run_src = jnp.asarray([0], jnp.int32)
    kb = jnp.asarray(rng.normal(size=(BS, nkv, hd)).astype(np.float32))
    vb = jnp.asarray(rng.normal(size=(BS, nkv, hd)).astype(np.float32))
    fk, fv = write_kv_runs(*flat, kb, vb, run_dst, run_src, BS)
    tk, tv = write_kv_runs(*tiled, kb, vb, run_dst, run_src, BS)
    np.testing.assert_array_equal(
        np.asarray(fk).astype(np.float32), np.asarray(tk.reshape(S, F)).astype(np.float32)
    )
    fq = write_kv_runs_quant(*qflat, kb, vb, run_dst, run_src, BS)
    tq = write_kv_runs_quant(*qtiled, kb, vb, run_dst, run_src, BS)
    np.testing.assert_array_equal(np.asarray(fq[0]), np.asarray(tq[0].reshape(S, F)))
    np.testing.assert_array_equal(np.asarray(fq[1]), np.asarray(tq[1].reshape(S, F)))
    np.testing.assert_array_equal(
        np.asarray(fq[2]).astype(np.float32), np.asarray(tq[2]).astype(np.float32)
    )
