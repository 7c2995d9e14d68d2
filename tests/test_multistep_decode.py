"""Multi-step (lookahead) decode must be token-identical to step-per-call
decode: the same greedy continuation, the same block-manager state evolution,
truncation at EOS / max_tokens."""

import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    model = Qwen3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_qwen3_ms")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def make_llm(path, k):
    from byox_vllm_tpu.llm import LLM

    return LLM(
        path, dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=64, kvcache_block_size=16, num_decode_steps=k,
    )


def test_lookahead_matches_single_step(tiny_model_dir):
    from byox_vllm_tpu.sampling_params import SamplingParams

    prompts = [[3, 17, 99, 140, 7], list(range(60, 90))]
    sp = SamplingParams(temperature=0.0, max_tokens=21)  # not a multiple of K
    ref = make_llm(tiny_model_dir, 1).generate(prompts, sp, use_tqdm=False)
    out = make_llm(tiny_model_dir, 4).generate(prompts, sp, use_tqdm=False)
    for r, o in zip(ref, out):
        assert r["token_ids"] == o["token_ids"]
        assert len(o["token_ids"]) == 21


def test_lookahead_truncates_at_eos(tiny_model_dir):
    from byox_vllm_tpu.sampling_params import SamplingParams

    llm = make_llm(tiny_model_dir, 4)
    # find which token the model emits greedily, then declare it EOS so the
    # sequence finishes mid-lookahead
    probe = llm.generate([[5, 6, 7]], SamplingParams(temperature=0.0, max_tokens=3), use_tqdm=False)
    third = probe[0]["token_ids"][2]
    llm2 = make_llm(tiny_model_dir, 4)
    llm2.scheduler.eos = third
    out = llm2.generate([[5, 6, 7]], SamplingParams(temperature=0.0, max_tokens=20), use_tqdm=False)[0]["token_ids"]
    # completion must stop at the FIRST greedy occurrence of the eos token,
    # even though it lands mid-lookahead-window
    first_eos = probe[0]["token_ids"].index(third)
    assert out == probe[0]["token_ids"][: first_eos + 1]
    assert out[-1] == third
    # pool fully reclaimed
    assert llm2.scheduler.block_manager.num_free_blocks == 64


def test_lookahead_blocks_sealed_like_single_step(tiny_model_dir):
    """Block hashes after multi-step generation must equal those the
    single-step path produces (prefix cache stays coherent)."""
    from byox_vllm_tpu.sampling_params import SamplingParams

    outs = {}
    hashes = {}
    for k in (1, 4):
        llm = make_llm(tiny_model_dir, k)
        seq = llm.add_request(list(range(20, 52)), SamplingParams(temperature=0.0, max_tokens=20))
        while not llm.is_finished():
            llm.step()
        outs[k] = seq.completion_token_ids
        bm = llm.scheduler.block_manager
        hashes[k] = sorted(h for h in bm.hash_to_block_id if h != -1)
    assert outs[1] == outs[4]
    assert hashes[1] == hashes[4]


def test_preemption_with_lookahead_still_correct(tiny_model_dir):
    """Tiny pool forces mid-generation preemption + recompute while decode
    runs with lookahead and chunked prefill: output must still match the
    unconstrained greedy run."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    prompts = [list(range(10, 40)), list(range(50, 80)), list(range(90, 120))]
    sp = SamplingParams(temperature=0.0, max_tokens=16)

    ref = LLM(
        tiny_model_dir, dtype="float32", max_model_len=128,
        max_num_batched_tokens=128, num_kvcache_blocks=64,
        kvcache_block_size=16, num_decode_steps=1,
    ).generate(prompts, sp, use_tqdm=False)

    # 7 blocks of 16 = 112 token slots for 3 x (30 + 16) = 138 tokens demanded:
    # preemption + requeue must kick in; budget 32 forces chunked prefill too
    tight = LLM(
        tiny_model_dir, dtype="float32", max_model_len=128,
        max_num_batched_tokens=32, num_kvcache_blocks=7,
        kvcache_block_size=16, num_decode_steps=4, enable_chunked_prefill=True,
    )
    out = tight.generate(prompts, sp, use_tqdm=False)
    for r, o in zip(ref, out):
        assert r["token_ids"] == o["token_ids"]
    # all blocks reclaimed at the end
    assert tight.scheduler.block_manager.num_free_blocks == 7


def test_window_staged_decode_matches_default(tiny_model_dir):
    """window_staged_decode=True (tail-operand attention + once-per-window
    pool commit) must reproduce the default per-step-write greedy output."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    prompts = [list(range(10, 40)), list(range(50, 75)), [7]]
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    kwargs = dict(
        dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=64, kvcache_block_size=16, num_decode_steps=4,
    )
    ref = LLM(tiny_model_dir, **kwargs).generate(prompts, sp, use_tqdm=False)
    out = LLM(tiny_model_dir, window_staged_decode=True, **kwargs).generate(
        prompts, sp, use_tqdm=False
    )
    for r, o in zip(ref, out):
        assert r["token_ids"] == o["token_ids"]
