"""KV-pool sizing arithmetic: the activation headroom is derived from the
config (engine/model_runner.py::estimate_activation_bytes) instead of a
fixed guess, and the north-star 8B INT4 + INT8 KV config at
max_num_seqs=256 provably fits a 16 GiB chip."""

import math


def _spec_8b():
    from byox_vllm_tpu.models.qwen3 import Qwen3Spec
    from transformers import PretrainedConfig

    from bench import QWEN3_8B

    return Qwen3Spec.from_hf_config(PretrainedConfig(**QWEN3_8B))


def test_headroom_scales_with_config():
    from byox_vllm_tpu.config import Config
    from byox_vllm_tpu.engine.model_runner import estimate_activation_bytes

    spec = _spec_8b()
    small = Config(hf_config={"model_type": "qwen3", "max_position_embeddings": 4096},
                   max_num_batched_tokens=512, max_num_seqs=32)
    big = Config(hf_config={"model_type": "qwen3", "max_position_embeddings": 4096},
                 max_num_batched_tokens=8192, max_num_seqs=512)
    assert estimate_activation_bytes(spec, big) > estimate_activation_bytes(spec, small)
    # dense fallback materializes score matrices -> more headroom
    dense = Config(hf_config={"model_type": "qwen3", "max_position_embeddings": 4096},
                   max_num_batched_tokens=8192, max_num_seqs=512,
                   attention_backend="dense", max_model_len=4096)
    assert estimate_activation_bytes(spec, dense) > estimate_activation_bytes(spec, big)


def test_8b_int4_kvint8_fits_16gb_at_256_seqs():
    """North-star config accounting (VERDICT r1 item 9): INT4 weights + int8
    head + estimated activations + a useful KV pool fit 16 GiB."""
    from dataclasses import replace

    from byox_vllm_tpu.config import Config
    from byox_vllm_tpu.engine.model_runner import estimate_activation_bytes
    from byox_vllm_tpu.ops.kv_cache import row_width

    spec = replace(_spec_8b(), quant_bits=4, head_bits=8)
    config = Config(
        hf_config={"model_type": "qwen3", "max_position_embeddings": 40960},
        max_model_len=256, max_num_batched_tokens=2048, max_num_seqs=256,
        gpu_memory_utilization=0.7, quantization="int4", kv_cache_dtype="int8",
    )
    # weights: int4 body (packed 2/byte + bf16 scales per group of 128),
    # bf16 embed, int8 head
    body = (
        spec.num_layers
        * (spec.hidden_size * (spec.q_size + 2 * spec.kv_size)  # qkv
           + spec.q_size * spec.hidden_size  # o
           + 3 * spec.hidden_size * spec.intermediate_size)  # gate_up + down
    )
    weights = body // 2 + (body // 128) * 2
    weights += spec.vocab_size * spec.hidden_size * 2  # embed bf16
    weights += spec.vocab_size * spec.hidden_size  # head int8
    act = estimate_activation_bytes(spec, config)

    hbm = 16 * 1024**3
    budget = int(hbm * config.gpu_memory_utilization) - weights - act
    per_token = spec.num_layers * row_width(spec.num_kv_heads * spec.head_dim, True)
    blocks = budget // (per_token * config.kvcache_block_size)
    # a useful pool: at least 64 tokens of KV per sequence at 256 seqs
    assert blocks * config.kvcache_block_size >= 256 * 64, (weights, act, blocks)


def test_headroom_divides_across_dp_lanes():
    """Data parallelism: each device runs ONE lane's rows, so the headroom
    must be sized from per-lane budgets, not global ones (r3 weak #6 — the
    global-budget estimate starved the KV pool dp-fold)."""
    from dataclasses import replace

    from byox_vllm_tpu.config import Config
    from byox_vllm_tpu.engine.model_runner import estimate_activation_bytes

    spec = _spec_8b()
    base = dict(hf_config={"model_type": "qwen3", "max_position_embeddings": 4096},
                max_num_batched_tokens=8192, max_num_seqs=512)
    one = Config(**base, data_parallel_size=1)
    four = Config(**base, data_parallel_size=4)
    a1 = estimate_activation_bytes(spec, one)
    a4 = estimate_activation_bytes(spec, four)
    assert a4 < a1
    # the per-lane estimate must match a dp=1 config with lane-sized budgets
    lane = Config(**{**base, "max_num_batched_tokens": 2048, "max_num_seqs": 128})
    assert a4 == estimate_activation_bytes(spec, lane)


def test_hbm_from_device_kind():
    from byox_vllm_tpu.engine.model_runner import _hbm_bytes_from_device_kind

    assert _hbm_bytes_from_device_kind("TPU v5 lite") == 16 * 1024**3
    assert _hbm_bytes_from_device_kind("TPU v5p") == 95 * 1024**3
    assert _hbm_bytes_from_device_kind("TPU v4") == 32 * 1024**3
    assert _hbm_bytes_from_device_kind("warp drive") is None
