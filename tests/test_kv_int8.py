"""INT8 KV cache (merged-pool layout): quantized write/gather roundtrip,
scale-byte codec, Pallas kernel parity, and end-to-end engine generation
staying faithful to the bf16-cache model."""

import jax.numpy as jnp
import numpy as np
import pytest

from byox_vllm_tpu.ops.kv_cache import (
    decode_scale_bytes,
    encode_scale_bytes,
    gather_kv,
    row_width,
    write_kv,
    write_kv_quant,
    write_kv_runs,
)


def test_scale_byte_codec_roundtrip():
    """bf16 scale rows survive the byte split into the int8 merged row
    bit-exactly (the dequant paths depend on this)."""
    rng = np.random.default_rng(11)
    vals = np.abs(rng.normal(0, 3.0, (7, 128))).astype(np.float32)
    sc = jnp.asarray(vals).astype(jnp.bfloat16)
    back = decode_scale_bytes(encode_scale_bytes(sc))
    np.testing.assert_array_equal(
        np.asarray(back), np.asarray(sc.astype(jnp.float32))
    )


def test_quant_write_gather_roundtrip():
    rng = np.random.default_rng(0)
    nkv, hd, S = 2, 16, 64
    k_new = jnp.asarray(rng.normal(0, 2.0, (5, nkv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.normal(0, 0.5, (5, nkv, hd)), jnp.float32)
    pool = jnp.zeros((S, row_width(nkv * hd, True)), jnp.int8)
    slots = jnp.asarray([0, 1, 2, 3, -1], jnp.int32)  # last row dropped
    pool = write_kv_quant(pool, k_new, v_new, slots)

    tables = jnp.asarray([[0]], jnp.int32)  # block 0 -> slots 0..63 (bs=64)
    out_k, out_v = gather_kv(pool, tables, 64, hd)
    ref = np.asarray(k_new[:4])
    got = np.asarray(out_k[0, :4])
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2 * np.abs(ref).max())
    assert np.abs(np.asarray(out_k[0, 4:])).max() == 0  # dropped + unwritten rows zero
    ref_v = np.asarray(v_new[:4])
    np.testing.assert_allclose(
        np.asarray(out_v[0, :4]), ref_v, rtol=2e-2, atol=2e-2 * np.abs(ref_v).max()
    )


def test_bf16_write_gather_roundtrip():
    rng = np.random.default_rng(2)
    nkv, hd, S = 2, 16, 64
    k_new = jnp.asarray(rng.normal(size=(4, nkv, hd)), jnp.float32).astype(jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(4, nkv, hd)), jnp.float32).astype(jnp.bfloat16)
    pool = jnp.zeros((S, row_width(nkv * hd, False)), jnp.bfloat16)
    pool = write_kv(pool, k_new, v_new, jnp.asarray([0, 1, 5, 63], jnp.int32))
    out_k, out_v = gather_kv(pool, jnp.asarray([[0]], jnp.int32), 64, hd)
    np.testing.assert_array_equal(
        np.asarray(out_k[0, [0, 1, 5, 63]].astype(jnp.float32)),
        np.asarray(k_new.astype(jnp.float32)),
    )
    np.testing.assert_array_equal(
        np.asarray(out_v[0, [0, 1, 5, 63]].astype(jnp.float32)),
        np.asarray(v_new.astype(jnp.float32)),
    )


def test_paged_kernel_int8_matches_dense():
    from byox_vllm_tpu.ops.attention import paged_attention_dense
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention

    rng = np.random.default_rng(1)
    b, nh, nkv, hd, bs, w = 2, 8, 4, 128, 16, 3
    ctx = [20, 37]
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
    tables = jnp.asarray(tables)
    ctx_a = jnp.asarray(ctx, jnp.int32)
    q = jnp.asarray(rng.normal(size=(b, 1, nh, hd)), jnp.float32)
    scale = hd**-0.5

    ref = paged_attention_dense(
        q, pool, tables, ctx_a, (ctx_a - 1)[:, None], bs, scale
    )
    out = paged_decode_attention(
        q[:, 0], pool, tables, ctx_a, block_size=bs, scale=scale, interpret=True
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


def test_write_kv_runs_matches_scatter():
    """The block-DUS prefill store equals the row scatter on the merged pool,
    for both dtypes (the quantized variant quantizes identically)."""
    rng = np.random.default_rng(5)
    S, nkv, hd, BS = 128, 8, 128, 16
    kb = jnp.asarray(rng.normal(size=(BS, nkv, hd)).astype(np.float32))
    vb = jnp.asarray(rng.normal(size=(BS, nkv, hd)).astype(np.float32))
    run_dst = jnp.asarray([2 * BS], jnp.int32)
    run_src = jnp.asarray([0], jnp.int32)
    slots = jnp.arange(2 * BS, 3 * BS, dtype=jnp.int32)

    pool = jnp.zeros((S, row_width(nkv * hd, False)), jnp.bfloat16)
    via_runs = write_kv_runs(pool, kb, vb, run_dst, run_src, BS)
    via_scatter = write_kv(pool, kb, vb, slots)
    np.testing.assert_array_equal(
        np.asarray(via_runs).astype(np.float32),
        np.asarray(via_scatter).astype(np.float32),
    )

    qpool = jnp.zeros((S, row_width(nkv * hd, True)), jnp.int8)
    via_runs = write_kv_runs(qpool, kb, vb, run_dst, run_src, BS)
    via_scatter = write_kv_quant(qpool, kb, vb, slots)
    np.testing.assert_array_equal(np.asarray(via_runs), np.asarray(via_scatter))
