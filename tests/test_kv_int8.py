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
    """Aligned-DMA-put decode store == the XLA row scatter, including
    skipped padding rows (slot -1) and both pool dtypes."""
    import jax.numpy as jnp
    import numpy as np

    from byox_vllm_tpu.ops.kv_cache import can_put_rows, put_kv_rows

    rng = np.random.default_rng(3)
    for dtype in (jnp.int8, jnp.bfloat16):
        S, F, N = 192, 1024, 16
        base = rng.integers(-90, 90, (2, S, F)).astype(np.int8)
        kp = jnp.asarray(base[0]).astype(dtype)
        vp = jnp.asarray(base[1]).astype(dtype)
        assert can_put_rows(kp)
        rows = rng.integers(-90, 90, (2, N, F)).astype(np.int8)
        rk = jnp.asarray(rows[0]).astype(dtype)
        rv = jnp.asarray(rows[1]).astype(dtype)
        slots = np.full(N, -1, np.int32)
        slots[: N // 2] = rng.choice(S, N // 2, replace=False)
        slots_j = jnp.asarray(slots)

        got_k, got_v = put_kv_rows((kp, vp), (rk, rv), slots_j, interpret=True)
        sl = jnp.where(slots_j < 0, S, slots_j)
        ref_k = kp.at[sl].set(rk, mode="drop")
        ref_v = vp.at[sl].set(rv, mode="drop")
        np.testing.assert_array_equal(
            np.asarray(got_k).astype(np.float32), np.asarray(ref_k).astype(np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(got_v).astype(np.float32), np.asarray(ref_v).astype(np.float32)
        )
