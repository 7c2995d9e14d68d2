"""Sliding-window attention (Mistral; Qwen2 behind use_sliding_window):
HF parity beyond the window length, kernel-vs-dense numerics, and the
decode band mask. Without this, a real Mistral checkpoint run past its
window would silently attend to everything (HF masks it — verified: the
tiny oracle's logits differ by ~0.2 with/without the window)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

BS = 16
WINDOW = 8


@pytest.fixture(scope="module")
def tiny_mistral_sw(tmp_path_factory):
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(0)
    cfg = MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, sliding_window=WINDOW,
        rope_theta=10000.0, tie_word_embeddings=False,
    )
    model = MistralForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_mistral_sw")
    model.save_pretrained(path, safe_serialization=True)
    return model, str(path)


def test_spec_reads_window(tiny_mistral_sw):
    model, _ = tiny_mistral_sw
    from byox_vllm_tpu.models import get_model

    spec = get_model("mistral").spec_from_hf(model.config)
    assert spec.sliding_window == WINDOW

    # Qwen2 gates the window behind use_sliding_window (False on releases)
    from transformers import Qwen2Config

    q2 = Qwen2Config(sliding_window=64, use_sliding_window=False)
    assert get_model("qwen2").spec_from_hf(q2).sliding_window is None
    q2on = Qwen2Config(sliding_window=64, use_sliding_window=True)
    assert get_model("qwen2").spec_from_hf(q2on).sliding_window == 64


def test_mistral_window_engine_matches_hf(tiny_mistral_sw):
    """Prompts 3x the window: greedy generation must track HF exactly —
    every decode step's attention clips to the last WINDOW positions."""
    model, path = tiny_mistral_sw
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    llm = LLM(
        path, dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=64, kvcache_block_size=BS,
    )
    prompts = [[3, 17, 99, 14, 7, 25, 31, 8, 77, 123, 9, 4, 55, 60, 71, 2,
                90, 18, 33, 44, 101, 5, 66, 12],
               list(range(100, 120))]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=12), use_tqdm=False)
    for prompt, out in zip(prompts, outs):
        with torch.no_grad():
            ref = model.generate(
                torch.tensor([prompt]), max_new_tokens=12, do_sample=False,
                eos_token_id=None, pad_token_id=0,
            )[0, len(prompt):].tolist()
        assert out["token_ids"] == ref


def test_decode_kernel_window_matches_dense():
    """v3 kernel band mask + out-of-window page-DMA skip vs the dense
    windowed fallback (interpret mode: unfetched pages stay whatever the
    buffer held — the mask must make them unobservable)."""
    import jax
    import jax.numpy as jnp

    from byox_vllm_tpu.ops.attention import paged_attention_dense
    from byox_vllm_tpu.ops.paged_attention import paged_decode_attention_v3

    rng = np.random.default_rng(0)
    b, nh, nkv, hd, bs, w = 8, 8, 4, 128, 16, 12
    num_blocks = b * w + 1
    ctx = np.array([150, 40, 17, 1, 190, 64, 96, 33], np.int32)
    window = 24
    pool = jnp.asarray(
        rng.normal(size=(num_blocks * bs, 2 * nkv * hd)).astype(np.float32)
    )
    tables = jnp.asarray(
        (np.arange(b)[:, None] * w + np.arange(w)[None, :]).astype(np.int32)
    )
    q = jnp.asarray(rng.normal(size=(b, nh, hd)).astype(np.float32))
    scale = hd**-0.5

    out_k = paged_decode_attention_v3(
        q, pool, tables, jnp.asarray(ctx),
        block_size=bs, scale=scale, interpret=True, seqs_per_step=4, window=window,
    )
    ref = paged_attention_dense(
        q[:, None], pool, tables, jnp.asarray(ctx),
        (ctx - 1)[:, None], bs, scale, window=window,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_qwen2_max_window_layers_parity(tmp_path_factory):
    """HF windows only layers >= max_window_layers; lower layers use full
    attention. A 2-layer Qwen2 with max_window_layers=1 must match HF
    past the window."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        use_sliding_window=True, sliding_window=WINDOW, max_window_layers=1,
        tie_word_embeddings=False,
    )
    model = Qwen2ForCausalLM(cfg).eval()
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith(".bias"):
                p.normal_(std=0.5)
    path = tmp_path_factory.mktemp("tiny_qwen2_sw")
    model.save_pretrained(path, safe_serialization=True)

    from byox_vllm_tpu.models import get_model

    spec = get_model("qwen2").spec_from_hf(cfg)
    assert spec.sliding_window == WINDOW and spec.first_window_layer == 1

    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    llm = LLM(
        str(path), dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=64, kvcache_block_size=BS,
    )
    prompt = [3, 17, 99, 14, 7, 25, 31, 8, 77, 123, 9, 4, 55, 60, 71, 2, 90, 18]
    out = llm.generate([prompt], SamplingParams(temperature=0.0, max_tokens=10), use_tqdm=False)
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=10, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(prompt):].tolist()
    assert out[0]["token_ids"] == ref


def test_dp_tiny_budget_no_livelock():
    """Lane budgets floor at one KV block — a per-lane budget that rounds
    chunks to zero tokens used to livelock prefill forever."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 128, "hidden_size": 64,
           "intermediate_size": 128, "num_hidden_layers": 2,
           "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": True, "attention_bias": False,
           "max_position_embeddings": 4096}
    llm = LLM(hf_config=cfg, dtype="float32", max_model_len=64,
              max_num_batched_tokens=16, num_kvcache_blocks=32,
              kvcache_block_size=16, data_parallel_size=2)
    out = llm.generate(
        [list(range(1, 21))],
        __import__("byox_vllm_tpu").SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
        use_tqdm=False,
    )
    assert len(out[0]["token_ids"]) == 4

    # non-chunked config that was valid pre-DP-split must still construct
    llm2 = LLM(hf_config=cfg, dtype="float32", max_model_len=64,
               max_num_batched_tokens=64, num_kvcache_blocks=32,
               kvcache_block_size=16, data_parallel_size=2,
               enable_chunked_prefill=False)
    out2 = llm2.generate(
        [[1, 2, 3]],
        __import__("byox_vllm_tpu").SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True),
        use_tqdm=False,
    )
    assert len(out2[0]["token_ids"]) == 3


def test_with_tail_dense_masks_old_tail_rows():
    """decode_attention_with_tail (dense merge): tail rows older than the
    window must mask out — reference = dense paged attention over a pool
    holding the same tokens."""
    import jax.numpy as jnp

    from byox_vllm_tpu.ops.attention import decode_attention_with_tail, paged_attention_dense

    rng = np.random.default_rng(0)
    b, nh, nkv, hd, bs = 2, 4, 2, 32, 16
    pool_ctx = np.array([20, 9], np.int32)
    t_max, tail_index, window = 8, 7, 4  # tail rows 0..3 fall outside
    w = 4
    num_blocks = b * w
    pool = np.zeros((num_blocks * bs, 2 * nkv * hd), np.float32)
    tables = (np.arange(b)[:, None] * w + np.arange(w)[None, :]).astype(np.int32)
    k_tail = rng.normal(size=(b, t_max, nkv, hd)).astype(np.float32)
    v_tail = rng.normal(size=(b, t_max, nkv, hd)).astype(np.float32)
    q = rng.normal(size=(b, nh, hd)).astype(np.float32)
    f = nkv * hd
    for i in range(b):
        rows = rng.normal(size=(pool_ctx[i], f)).astype(np.float32)
        vrows = rng.normal(size=(pool_ctx[i], f)).astype(np.float32)
        base = i * w * bs
        pool[base : base + pool_ctx[i], :f] = rows
        pool[base : base + pool_ctx[i], f:] = vrows
    scale = hd**-0.5

    out = decode_attention_with_tail(
        jnp.asarray(q), jnp.asarray(pool),
        jnp.asarray(tables), jnp.asarray(pool_ctx),
        jnp.asarray(k_tail), jnp.asarray(v_tail), jnp.int32(tail_index),
        bs, scale, backend="dense", window=window,
    )

    # reference: materialize tail rows into the pool and run windowed dense
    pool_ref = pool.copy()
    for i in range(b):
        base = i * w * bs
        pool_ref[base + pool_ctx[i] : base + pool_ctx[i] + tail_index + 1, :f] = (
            k_tail[i, : tail_index + 1].reshape(tail_index + 1, -1)
        )
        pool_ref[base + pool_ctx[i] : base + pool_ctx[i] + tail_index + 1, f:] = (
            v_tail[i, : tail_index + 1].reshape(tail_index + 1, -1)
        )
    full_ctx = pool_ctx + tail_index + 1
    ref = paged_attention_dense(
        jnp.asarray(q)[:, None], jnp.asarray(pool_ref),
        jnp.asarray(tables), jnp.asarray(full_ctx), (full_ctx - 1)[:, None],
        bs, scale, window=window,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_window_kv_blocks_freed_during_generation(tiny_mistral_sw):
    """All-layers-windowed models release KV blocks below the attention
    floor while generating: per-sequence KV is bounded at ~window tokens
    and outputs still match HF."""
    model, path = tiny_mistral_sw
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    llm = LLM(
        path, dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=64, kvcache_block_size=BS, async_decode=False,
        num_decode_steps=1,
    )
    assert llm.scheduler.free_window == WINDOW
    prompt = list(range(1, 25))  # 24 tokens
    seq = llm.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True))
    free0 = llm.scheduler.block_manager.num_free_blocks
    saw_freed = False
    while not llm.is_finished():
        llm.step()
        if seq.block_table and seq.block_table[0] == -1:
            saw_freed = True
    assert saw_freed, "no block was released below the window floor"
    assert llm.scheduler.block_manager.num_free_blocks == free0  # all returned
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=40, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(prompt):].tolist()
    assert seq.completion_token_ids == ref
