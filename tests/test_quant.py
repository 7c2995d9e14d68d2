"""Weight-only quantization: pack/unpack roundtrips, Pallas kernel vs XLA
fallback, and end-to-end quantized-model quality against the bf16/fp32 model
(the north-star quality gate is perplexity within 0.1 of same-bit reference;
on random tiny models we gate on logits agreement and greedy stability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byox_vllm_tpu.ops.quant import (
    dequantize,
    pick_group,
    quant_matmul_pallas,
    quantize_weight,
)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantize_dequantize_roundtrip(bits):
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, (256, 512)).astype(np.float32)
    q = quantize_weight(w, bits)
    deq = np.asarray(dequantize(q["q"], q["s"], bits, jnp.float32))
    qmax = 127 if bits == 8 else 7
    # max error is half a quantization step per group
    step = np.asarray(q["s"]).repeat(256 // q["s"].shape[0], axis=0)
    assert (np.abs(deq - w) <= step * 0.5 + 1e-6).all()
    rel = np.abs(deq - w).mean() / np.abs(w).mean()
    assert rel < (0.012 if bits == 8 else 0.15)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantize_stacked_layers(bits):
    rng = np.random.default_rng(1)
    w = rng.normal(0, 0.05, (3, 256, 256)).astype(np.float32)  # [L, K, M]
    q = quantize_weight(w, bits)
    assert q["s"].shape == (3, 2, 256)
    deq = np.asarray(dequantize(q["q"], q["s"], bits, jnp.float32))
    for i in range(3):
        ref = np.asarray(dequantize(*[quantize_weight(w[i], bits)[k] for k in ("q", "s")], bits, jnp.float32))
        np.testing.assert_allclose(deq[i], ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("bits", [8, 4])
def test_pallas_kernel_matches_fallback(bits):
    rng = np.random.default_rng(2)
    n, k, m = 16, 256, 512
    x = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    w = rng.normal(0, 0.05, (k, m)).astype(np.float32)
    q = quantize_weight(w, bits)
    ref = np.asarray(x @ dequantize(q["q"], q["s"], bits, jnp.float32))
    out = np.asarray(
        quant_matmul_pallas(x, q["q"], q["s"], bits=bits, interpret=True, tile_m=256)
    )
    # kernel computes in bf16 on the MXU; compare with bf16-ish tolerance
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2 * np.abs(ref).max())


def test_pick_group():
    assert pick_group(1024, 8) == 128
    assert pick_group(1024, 4) == 128
    assert pick_group(64, 8) == 64
    assert pick_group(64, 4) == 64


def test_int4_pack_roundtrip():
    """Row-pair two's-complement nibble packing <-> int4 values."""
    from byox_vllm_tpu.ops.quant import pack_int4, unpack_int4_np

    rng = np.random.default_rng(3)
    q = rng.integers(-8, 8, (3, 64, 128), dtype=np.int8)
    packed = pack_int4(q)
    assert packed.shape == (3, 32, 128) and packed.dtype == np.int8
    np.testing.assert_array_equal(unpack_int4_np(packed), q)


def _tiny_spec(quant_bits=None):
    from byox_vllm_tpu.models.qwen3 import Qwen3Spec

    return Qwen3Spec(
        vocab_size=128, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=32, rms_norm_eps=1e-6,
        rope_theta=1e4, tie_word_embeddings=True, attention_bias=False,
        qk_norm=True, max_position_embeddings=512, quant_bits=quant_bits,
    )


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_model_logits_close(bits):
    """End-to-end forward with quantized weights tracks the fp32 model."""
    from byox_vllm_tpu.models.qwen3 import forward, init_params, make_kv_cache

    spec_f = _tiny_spec(None)
    spec_q = _tiny_spec(bits)
    params_f = init_params(spec_f, jnp.float32, seed=3)
    # same underlying weights, quantized
    from byox_vllm_tpu.models.qwen3 import quantize_layer_params

    params_q = dict(params_f)
    params_q["layers"] = quantize_layer_params(params_f["layers"], bits)

    bs = 16
    kv_f = make_kv_cache(spec_f, 256, jnp.float32)
    kv_q = make_kv_cache(spec_q, 256, jnp.float32)
    tokens = jnp.asarray(np.arange(1, 11)[None, :], jnp.int32)
    q_lens = jnp.asarray([10], jnp.int32)
    ctx = jnp.asarray([10], jnp.int32)
    slots = jnp.arange(10, dtype=jnp.int32)[None, :]
    tables = jnp.asarray([[0, 1]], jnp.int32)

    lf, _ = forward(params_f, kv_f, tokens, q_lens, ctx, slots, tables, spec_f, bs)
    lq, _ = forward(params_q, kv_q, tokens, q_lens, ctx, slots, tables, spec_q, bs)
    lf, lq = np.asarray(lf[0]), np.asarray(lq[0])
    # logits highly correlated; top-1 agreement for int8
    corr = np.corrcoef(lf, lq)[0, 1]
    assert corr > (0.999 if bits == 8 else 0.97), corr
    if bits == 8:
        assert lf.argmax() == lq.argmax()


@pytest.mark.parametrize("quant", ["int8", "int4"])
def test_engine_e2e_quantized(quant, tmp_path):
    """Full engine with config.quantization set: generates sane tokens and
    (int8) matches the unquantized greedy continuation on a tiny model."""
    import torch
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
    quant_out = LLM(str(tmp_path), quantization=quant, **common).generate(prompts, sp, use_tqdm=False)
    assert len(quant_out[0]["token_ids"]) == 12
    if quant == "int8":
        # int8 tracks fp32 closely enough for greedy agreement on 2 layers
        assert quant_out[0]["token_ids"] == plain[0]["token_ids"]


@pytest.mark.parametrize("bits", [8, 4])
def test_offline_quantize_roundtrip(tmp_path, bits):
    """Offline pre-quantization pass: quantize a checkpoint to disk, reload
    through the engine, outputs match online quantization exactly (int4
    additionally exercises the native-int4 <-> packed-uint8 disk format)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams
    from byox_vllm_tpu.tools.quantize import quantize_checkpoint

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    src = tmp_path / "src"
    Qwen3ForCausalLM(cfg).eval().save_pretrained(src, safe_serialization=True)
    packed = tmp_path / "packed"
    quantize_checkpoint(str(src), str(packed), bits=bits, dtype="float32")

    common = dict(
        dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=32, kvcache_block_size=16,
    )
    prompts = [[1, 2, 3, 4, 5, 6]]
    sp = SamplingParams(temperature=0.0, max_tokens=10)
    quant = {8: "int8", 4: "int4"}[bits]
    online = LLM(str(src), quantization=quant, **common).generate(prompts, sp, use_tqdm=False)
    offline = LLM(str(packed), **common).generate(prompts, sp, use_tqdm=False)
    assert online[0]["token_ids"] == offline[0]["token_ids"]


def test_quantized_lm_head_matches_dense():
    """int8 pre-transposed V-padded head: logits must match the bf16 einsum
    within int8 quantization error, and padded vocab columns are sliced off."""
    import numpy as np
    from byox_vllm_tpu.models.qwen3 import quantize_head
    from byox_vllm_tpu.ops.quant import quant_matmul

    rng = np.random.default_rng(0)
    v, d, b = 500, 256, 4  # v deliberately not a multiple of anything nice
    lm_head = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32)) * 0.05
    h = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    qh = quantize_head(lm_head, 8)
    assert qh["q"].shape == (d, 1024)  # padded to a 1024 multiple
    ref = np.asarray(h @ lm_head.T)
    out = np.asarray(quant_matmul(h, qh, 8, out_dtype=jnp.float32)[..., :v])
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_engine_quantized_untied_head():
    """End-to-end engine run with an untied, int8-quantized LM head."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 512, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": False, "attention_bias": False,
           "max_position_embeddings": 4096}
    llm = LLM(hf_config=cfg, max_model_len=64, max_num_batched_tokens=256,
              num_kvcache_blocks=32, kvcache_block_size=16, quantization="int8")
    assert llm.model_runner.spec.head_bits == 8
    assert isinstance(llm.model_runner.params["lm_head"], dict)
    sp = SamplingParams(max_tokens=6, ignore_eos=True, temperature=0.0)
    out = llm.generate([[1, 2, 3]], sp, use_tqdm=False)
    assert len(out[0]["token_ids"]) == 6
    assert all(0 <= t < 512 for t in out[0]["token_ids"])  # no padded-vocab ids


def test_w4a8_kernel_matches_emulation():
    """W4A8 kernel (interpret) vs its exact XLA emulation, and sanity vs the
    unquantized matmul."""
    import numpy as np
    from byox_vllm_tpu.ops.quant import (
        dequantize,
        quant_matmul_w4a8_pallas,
        quantize_activations,
        quantize_weight,
    )

    rng = np.random.default_rng(3)
    N, K, M = 16, 1024, 512
    x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    w = rng.normal(size=(K, M)).astype(np.float32) * 0.03
    qd = quantize_weight(w, bits=4)
    out = quant_matmul_w4a8_pallas(x, qd["q"], qd["s"], interpret=True, out_dtype=jnp.float32)
    x8, sx = quantize_activations(x)
    ref = (x8.astype(jnp.float32) * sx) @ dequantize(qd["q"], qd["s"], 4, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)
    # and close to the full-precision product (quantization error only)
    full = np.asarray(x) @ w
    rel = np.linalg.norm(np.asarray(out) - full) / np.linalg.norm(full)
    # int4 group-128 noise alone is ~12% relative on N(0,1) weights
    # (delta/sqrt(12) with delta = groupmax/7.5); A8 adds ~1%
    assert rel < 0.15, rel


def test_engine_w4a8_end_to_end():
    """quantization='w4a8' drives the whole engine (dense emulation on CPU)."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 512, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": True, "attention_bias": False,
           "max_position_embeddings": 4096}
    llm = LLM(hf_config=cfg, max_model_len=64, max_num_batched_tokens=256,
              num_kvcache_blocks=32, kvcache_block_size=16, quantization="w4a8")
    assert llm.model_runner.spec.quant_bits == 4
    assert llm.model_runner.spec.act_bits == 8
    out = llm.generate([[1, 2, 3]], SamplingParams(max_tokens=6, ignore_eos=True,
                                                   temperature=0.0), use_tqdm=False)
    assert len(out[0]["token_ids"]) == 6


def test_w8a8_head_kernel_matches_emulation():
    """W8A8 kernel path (bits=8 of quant_matmul_w4a8_pallas — the LM head
    under w4a8 mode) vs its exact XLA emulation at a head-like shape
    (K = hidden, M = padded-vocab multiple). ADVICE r4: this path drove the
    head every decode step with no interpret-mode parity test (test_quant
    covered only bits=4, and the CPU e2e test ties embeddings so the
    quantized-head kernel never ran in CI)."""
    import numpy as np
    from byox_vllm_tpu.ops.quant import (
        dequantize,
        quant_matmul_w4a8_pallas,
        quantize_activations,
        quantize_weight,
    )

    rng = np.random.default_rng(7)
    N, K, M = 16, 256, 2048  # head shape class: K = hidden, M = V padded to 1024s
    x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    w = rng.normal(size=(K, M)).astype(np.float32) * 0.03
    qd = quantize_weight(w, bits=8)
    out = quant_matmul_w4a8_pallas(
        x, qd["q"], qd["s"], interpret=True, out_dtype=jnp.float32, bits=8
    )
    x8, sx = quantize_activations(x)
    ref = (x8.astype(jnp.float32) * sx) @ dequantize(qd["q"], qd["s"], 8, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)
    full = np.asarray(x) @ w
    rel = np.linalg.norm(np.asarray(out) - full) / np.linalg.norm(full)
    assert rel < 0.02, rel  # int8 weights + int8 activations: ~1% noise


# --- folded scales (ops/quant.py folded-scales block) -----------------------


def test_quantize_folded_constraint_and_roundtrip():
    """Folded int4 pack: s = m * S holds EXACTLY (m integer-valued in
    [1, 15]), and dequantization error stays within half a step of the
    (slightly coarser) constrained scales."""
    from byox_vllm_tpu.ops.quant import folded_scales, quantize_weight_folded

    rng = np.random.default_rng(11)
    k, m = 512, 256
    # mix scale magnitudes across groups to exercise the multiplier range
    w = rng.normal(0, 0.05, (k, m)).astype(np.float32)
    w[:128] *= 4.0  # one hot group per column
    qd = quantize_weight_folded(w, bits=4)
    mult, S = np.asarray(qd["m"]), np.asarray(qd["S"])
    assert mult.shape == (k // 128, m) and S.shape == (1, m)
    assert ((mult >= 1) & (mult <= 15)).all()
    np.testing.assert_array_equal(mult, np.round(mult))  # integer-valued
    s = np.asarray(folded_scales(qd, 4))
    np.testing.assert_allclose(s, mult * S, rtol=0, atol=0)
    deq = np.asarray(dequantize(qd["q"], jnp.asarray(s), 4, jnp.float32))
    step = s.repeat(k // s.shape[0], axis=0)
    assert (np.abs(deq - w) <= step * 0.5 + 1e-6).all()
    rel = np.abs(deq - w).mean() / np.abs(w).mean()
    assert rel < 0.2, rel


def test_quantize_folded_per_channel_int8():
    from byox_vllm_tpu.ops.quant import quantize_weight_folded

    rng = np.random.default_rng(12)
    w = rng.normal(0, 0.05, (256, 512)).astype(np.float32)
    qd = quantize_weight_folded(w, bits=8)
    assert set(qd) == {"q", "S"} and qd["S"].shape == (1, 512)
    deq = np.asarray(dequantize(qd["q"], qd["S"], 8, jnp.float32))
    assert (np.abs(deq - w) <= np.asarray(qd["S"]) * 0.5 + 1e-6).all()


@pytest.mark.parametrize("fold_mode", ["onedot", "grouped"])
def test_folded4_kernel_matches_emulation(fold_mode):
    """Folded W4A8 kernel (interpret) vs exact XLA emulation — the int32
    accumulation and single epilogue must reproduce the per-group math,
    in both kernel structures (one deep dot / per-group integer partials)."""
    from byox_vllm_tpu.ops.quant import (
        folded_scales,
        quant_matmul_folded_pallas,
        quantize_activations,
        quantize_weight_folded,
    )

    rng = np.random.default_rng(13)
    n, k, m = 16, 512, 256
    x = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))
    w = rng.normal(0, 0.05, (k, m)).astype(np.float32)
    w[:128] *= 3.0
    qd = quantize_weight_folded(w, bits=4)
    out = quant_matmul_folded_pallas(
        x, qd["q"], qd["m"], qd["S"], interpret=True, out_dtype=jnp.float32,
        bits=4, tile_m=256, fold_mode=fold_mode,
    )
    x8, sx = quantize_activations(x)
    s = folded_scales(qd, 4)
    ref = (x8.astype(jnp.float32) * sx) @ dequantize(qd["q"], s, 4, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)
    full = np.asarray(x) @ w
    rel = np.linalg.norm(np.asarray(out) - full) / np.linalg.norm(full)
    assert rel < 0.15, rel  # int4-class noise (same bound as the roundtrip test)


def test_folded8_kernel_matches_emulation():
    """Folded per-channel W8A8 kernel (the LM head) at a head-like shape."""
    from byox_vllm_tpu.ops.quant import (
        quant_matmul_folded_pallas,
        quantize_activations,
        quantize_weight_folded,
    )

    rng = np.random.default_rng(14)
    n, k, m = 16, 256, 2048
    x = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))
    w = rng.normal(size=(k, m)).astype(np.float32) * 0.03
    qd = quantize_weight_folded(w, bits=8)
    out = quant_matmul_folded_pallas(
        x, qd["q"], None, qd["S"], interpret=True, out_dtype=jnp.float32, bits=8
    )
    x8, sx = quantize_activations(x)
    ref = (x8.astype(jnp.float32) * sx) @ dequantize(qd["q"], qd["S"], 8, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)
    full = np.asarray(x) @ w
    rel = np.linalg.norm(np.asarray(out) - full) / np.linalg.norm(full)
    assert rel < 0.02, rel


def test_fold_pack_legacy_conversion():
    """fold_pack snaps a legacy {"q","s"} pack's scales to m * S; on
    homogeneous weights the snap error is small, and the folded dequant
    stays close to the legacy dequant."""
    from byox_vllm_tpu.ops.quant import fold_pack, folded_scales

    rng = np.random.default_rng(15)
    w = rng.normal(0, 0.05, (512, 256)).astype(np.float32)
    qd = quantize_weight(w, bits=4)
    fd = fold_pack(qd, 4)
    assert set(fd) == {"q", "m", "S"}
    legacy = np.asarray(dequantize(qd["q"], qd["s"], 4, jnp.float32))
    folded = np.asarray(dequantize(fd["q"], folded_scales(fd, 4), 4, jnp.float32))
    rel = np.abs(folded - legacy).mean() / np.abs(legacy).mean()
    assert rel < 0.05, rel
    # idempotent
    assert fold_pack(fd, 4) is fd


def test_refine_scales_folded():
    """Row-parallel sharding of a folded pack: multiplier rows refine by
    exact repetition; S stays untouched (global-K, replicated)."""
    from byox_vllm_tpu.ops.quant import (
        folded_scales, quantize_weight_folded, refine_scales,
    )

    rng = np.random.default_rng(16)
    w = rng.normal(0, 0.05, (512, 256)).astype(np.float32)
    qd = quantize_weight_folded(w, bits=4)  # 4 scale rows
    ref = refine_scales(qd, tp=8, bits=4)  # 4 % 8 != 0 -> split 2x
    assert ref["m"].shape == (8, 256)
    np.testing.assert_array_equal(np.asarray(ref["S"]), np.asarray(qd["S"]))
    a = np.asarray(folded_scales(qd, 4)).repeat(2, axis=0)
    b = np.asarray(folded_scales(ref, 4))
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_offline_quantize_w4a8_folded_pack(tmp_path):
    """--w4a8 offline packs carry folded leaves ({q, m, S}); the engine
    loads them directly (no post-hoc snap) and matches online folded
    quantization exactly."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams
    from byox_vllm_tpu.tools.quantize import load_prequantized, quantize_checkpoint

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    src = tmp_path / "src"
    Qwen3ForCausalLM(cfg).eval().save_pretrained(src, safe_serialization=True)
    packed = tmp_path / "packed"
    quantize_checkpoint(str(src), str(packed), bits=4, dtype="float32", act_bits=8)
    params, meta = load_prequantized(str(packed))
    assert meta["act_bits"] == 8 and meta["bits"] == 4
    assert set(params["layers"]["wqkv"].keys()) == {"q", "m", "S"}
    assert set(params["lm_head"].keys()) == {"q", "S"}  # per-channel head

    common = dict(
        dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=32, kvcache_block_size=16,
    )
    prompts = [[1, 2, 3, 4, 5, 6]]
    sp = SamplingParams(temperature=0.0, max_tokens=10)
    online = LLM(str(src), quantization="w4a8", **common).generate(prompts, sp, use_tqdm=False)
    offline = LLM(str(packed), quantization="w4a8", **common).generate(prompts, sp, use_tqdm=False)
    assert online[0]["token_ids"] == offline[0]["token_ids"]
