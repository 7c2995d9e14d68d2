"""Chunked prefill end to end: a prompt longer than the per-step token budget
is processed across steps and produces exactly the unchunked greedy output."""

import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    model = Qwen3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_qwen3_chunk")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_chunked_equals_unchunked(tiny_model_dir):
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    prompts = [list(range(10, 90)), list(range(30, 65))]  # 80 and 35 tokens
    sp = SamplingParams(temperature=0.0, max_tokens=10)

    ref = LLM(
        tiny_model_dir, dtype="float32", max_model_len=128,
        max_num_batched_tokens=128, num_kvcache_blocks=64,
        kvcache_block_size=16, enable_chunked_prefill=False,
    ).generate(prompts, sp, use_tqdm=False)

    # 32-token budget: the 80-token prompt takes 3 chunks (32+32+16)
    llm = LLM(
        tiny_model_dir, dtype="float32", max_model_len=128,
        max_num_batched_tokens=32, num_kvcache_blocks=64,
        kvcache_block_size=16, enable_chunked_prefill=True,
    )
    out = llm.generate(prompts, sp, use_tqdm=False)
    for r, o in zip(ref, out):
        assert r["token_ids"] == o["token_ids"]
    # prefill accounting covered every prompt token exactly once
    assert llm.metrics.prefill_tokens == sum(len(p) for p in prompts)
