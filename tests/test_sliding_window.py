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
    k_pool = jnp.asarray(rng.normal(size=(num_blocks * bs, nkv * hd)).astype(np.float32))
    v_pool = jnp.asarray(rng.normal(size=(num_blocks * bs, nkv * hd)).astype(np.float32))
    tables = jnp.asarray(
        (np.arange(b)[:, None] * w + np.arange(w)[None, :]).astype(np.int32)
    )
    q = jnp.asarray(rng.normal(size=(b, nh, hd)).astype(np.float32))
    scale = hd**-0.5

    out_k = paged_decode_attention_v3(
        q, k_pool, v_pool, tables, jnp.asarray(ctx),
        block_size=bs, scale=scale, interpret=True, seqs_per_step=4, window=window,
    )
    ref = paged_attention_dense(
        q[:, None], k_pool, v_pool, tables, jnp.asarray(ctx),
        (ctx - 1)[:, None], bs, scale, window=window,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), rtol=2e-5, atol=2e-5)
