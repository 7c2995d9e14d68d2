"""Speculative decoding: proposer behavior, rejection-sampler guarantees, and
the end-to-end invariant that greedy spec output equals greedy non-spec
output (speculative decoding must never change the distribution)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from byox_vllm_tpu.engine.spec import NgramProposer, SpecMetrics


def test_ngram_proposer_finds_recent_match():
    p = NgramProposer(num_speculative_tokens=3, prompt_lookup_min=1, prompt_lookup_max=3)
    #           0  1  2  3  4  5  6  7
    tokens = [5, 6, 7, 9, 9, 5, 6, 7]  # trailing [5,6,7] matched at 0
    assert p.propose(tokens) == [9, 9, 5]

    # most recent occurrence wins
    tokens = [1, 2, 8, 1, 2, 3, 1, 2]
    assert p.propose(tokens) == [8, 1, 2][:3] or p.propose(tokens) == [3, 1, 2]
    assert p.propose(tokens) == [3, 1, 2]  # match at index 3, follow = [3, 1, 2]

    # no recurrence -> no drafts
    assert p.propose([1, 2, 3, 4, 5]) == []


def test_ngram_proposer_prefers_longer_ngram():
    p = NgramProposer(2, 1, 3)
    # trailing 1-gram [4] appears at idx 0 (follow 9) but trailing 2-gram
    # [3, 4] appears at idx 2 (follow 7, 4): longer match wins
    tokens = [4, 9, 3, 4, 7, 4, 8, 3, 4]
    assert p.propose(tokens) == [7, 4]


def test_verify_and_sample_greedy_semantics():
    import jax
    import jax.numpy as jnp

    from byox_vllm_tpu.ops.spec_sampler import verify_and_sample

    v = 16
    # seq 0: drafts [3, 5]; model greedy argmax at pos0=3 (accept), pos1=7
    # (reject 5 -> emit 7). seq 1: drafts [2, 4] all greedy-matching ->
    # accept both + bonus argmax at pos2 = 9.
    logits = np.full((2, 3, v), -10.0, np.float32)
    logits[0, 0, 3] = 5.0
    logits[0, 1, 7] = 5.0
    logits[1, 0, 2] = 5.0
    logits[1, 1, 4] = 5.0
    logits[1, 2, 9] = 5.0
    drafts = jnp.asarray([[3, 5], [2, 4]], jnp.int32)
    nd = jnp.asarray([2, 2], jnp.int32)
    temps = jnp.zeros(2, jnp.float32)
    tokens, emitted = verify_and_sample(jnp.asarray(logits), drafts, nd, temps, jax.random.PRNGKey(0))
    tokens, emitted = np.asarray(tokens), np.asarray(emitted)
    assert emitted.tolist() == [2, 3]
    assert tokens[0, :2].tolist() == [3, 7]
    assert tokens[1, :3].tolist() == [2, 4, 9]


def test_verify_no_drafts_is_plain_sampling():
    import jax
    import jax.numpy as jnp

    from byox_vllm_tpu.ops.spec_sampler import verify_and_sample

    logits = np.full((1, 2, 8), -10.0, np.float32)
    logits[0, 0, 6] = 5.0
    tokens, emitted = verify_and_sample(
        jnp.asarray(logits), jnp.zeros((1, 1), jnp.int32), jnp.asarray([0]),
        jnp.zeros(1, jnp.float32), jax.random.PRNGKey(0),
    )
    assert np.asarray(emitted).tolist() == [1]
    assert np.asarray(tokens)[0, 0] == 6


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    model = Qwen3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_qwen3_spec")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_spec_greedy_matches_plain_greedy(tiny_model_dir):
    """The core spec-decode guarantee: greedy output is unchanged."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    common = dict(
        dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=64, kvcache_block_size=16,
    )
    # small vocab (64) makes ngram repeats frequent -> drafts actually fire
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [7, 8, 7, 8, 7, 8]]
    sp = SamplingParams(temperature=0.0, max_tokens=24)

    plain = LLM(tiny_model_dir, **common).generate(prompts, sp, use_tqdm=False)
    spec_llm = LLM(
        tiny_model_dir,
        speculative_config={
            "method": "ngram", "num_speculative_tokens": 4,
            "prompt_lookup_max": 3, "prompt_lookup_min": 1,
        },
        **common,
    )
    spec = spec_llm.generate(prompts, sp, use_tqdm=False)
    for a, b in zip(plain, spec):
        assert a["token_ids"] == b["token_ids"]
    m = spec_llm.spec_metrics.summary()
    assert m["num_drafts"] > 0  # the proposer actually proposed
    assert m["mean_acceptance_length"] >= 1.0


def test_spec_metrics_accounting():
    m = SpecMetrics()
    m.record(num_draft=3, num_accepted=2)
    m.record(num_draft=3, num_accepted=0)
    m.record(num_draft=0, num_accepted=0)  # no-draft windows don't count
    s = m.summary()
    assert s["num_drafts"] == 2
    assert s["num_draft_tokens"] == 6
    assert s["num_accepted_tokens"] == 2
    assert s["acceptance_rate_per_pos"] == [0.5, 0.5, 0.0]
    assert abs(s["mean_acceptance_length"] - 2.0) < 1e-9


def test_spec_with_top_k_1_matches_greedy(tiny_model_dir):
    """Spec decoding under top_k=1 must equal plain greedy (the filtered
    target distribution is a point mass)."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    common = dict(
        dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=64, kvcache_block_size=16,
    )
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2]]
    greedy = LLM(tiny_model_dir, **common).generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=16), use_tqdm=False
    )
    spec_llm = LLM(
        tiny_model_dir,
        speculative_config={
            "method": "ngram", "num_speculative_tokens": 4,
            "prompt_lookup_max": 3, "prompt_lookup_min": 1,
        },
        **common,
    )
    out = spec_llm.generate(
        prompts, SamplingParams(temperature=1.3, top_k=1, max_tokens=16), use_tqdm=False
    )
    assert out[0]["token_ids"] == greedy[0]["token_ids"]


TINY_DRAFT_CFG = {
    "model_type": "qwen3", "vocab_size": 64, "hidden_size": 32,
    "intermediate_size": 64, "num_hidden_layers": 1,
    "num_attention_heads": 2, "num_key_value_heads": 1, "head_dim": 16,
    "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
    "tie_word_embeddings": True, "attention_bias": False,
    "max_position_embeddings": 512,
}


def test_draft_model_spec_greedy_matches_plain(tiny_model_dir):
    """Draft-MODEL speculative decoding: greedy output must equal plain
    greedy regardless of the drafter (here a random tiny model, so
    acceptance is low but correctness must hold)."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    common = dict(
        dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=64, kvcache_block_size=16,
    )
    prompts = [[1, 2, 3, 4, 5, 6, 7, 8], [9, 10, 11], [12] * 20]
    sp = SamplingParams(temperature=0.0, max_tokens=20)
    plain = LLM(tiny_model_dir, **common).generate(prompts, sp, use_tqdm=False)
    spec_llm = LLM(
        tiny_model_dir,
        speculative_config={
            "method": "draft_model", "num_speculative_tokens": 3,
            "draft_hf_config": TINY_DRAFT_CFG,
        },
        **common,
    )
    spec = spec_llm.generate(prompts, sp, use_tqdm=False)
    for a, b in zip(plain, spec):
        assert a["token_ids"] == b["token_ids"]
    m = spec_llm.spec_metrics.summary()
    assert m["num_drafts"] > 0


def test_draft_model_spec_self_draft_full_acceptance(tiny_model_dir):
    """Drafter == target: every greedy draft must be accepted (acceptance
    rate 1.0) and the output still equals plain greedy."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    common = dict(
        dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=64, kvcache_block_size=16,
    )
    prompts = [[1, 2, 3, 4, 5]]
    sp = SamplingParams(temperature=0.0, max_tokens=18)
    plain = LLM(tiny_model_dir, **common).generate(prompts, sp, use_tqdm=False)
    spec_llm = LLM(
        tiny_model_dir,
        speculative_config={
            "method": "draft_model", "num_speculative_tokens": 3,
            "model": tiny_model_dir,  # self-draft
        },
        **common,
    )
    spec = spec_llm.generate(prompts, sp, use_tqdm=False)
    assert plain[0]["token_ids"] == spec[0]["token_ids"]
    m = spec_llm.spec_metrics.summary()
    assert m["num_drafts"] > 0
    assert m["draft_acceptance_rate"] == 1.0


def test_draft_model_spec_survives_preemption(tiny_model_dir):
    """Tiny pool forces preemption+recompute while draft-model spec decoding
    runs: outputs must still match unconstrained plain greedy."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    prompts = [list(range(10, 40)), list(range(50, 80)), list(range(1, 30))]
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    plain = LLM(
        tiny_model_dir, dtype="float32", max_model_len=128,
        max_num_batched_tokens=128, num_kvcache_blocks=64, kvcache_block_size=16,
    ).generate(prompts, sp, use_tqdm=False)
    tight = LLM(
        tiny_model_dir, dtype="float32", max_model_len=128,
        max_num_batched_tokens=64, num_kvcache_blocks=9, kvcache_block_size=16,
        speculative_config={
            "method": "draft_model", "num_speculative_tokens": 2,
            "draft_hf_config": TINY_DRAFT_CFG,
        },
    )
    out = tight.generate(prompts, sp, use_tqdm=False)
    for a, b in zip(plain, out):
        assert a["token_ids"] == b["token_ids"]
    assert tight.scheduler.block_manager.num_free_blocks == 9


def test_verify_seeded_rows_batch_independent():
    """A seeded row's verify randomness depends only on (seed, step): the
    same row must accept/sample identically regardless of batch company or
    the engine-level key."""
    import jax
    import jax.numpy as jnp

    from byox_vllm_tpu.ops.spec_sampler import verify_and_sample

    rng = np.random.default_rng(0)
    v, k = 32, 3
    row_logits = rng.normal(size=(1, k + 1, v)).astype(np.float32)
    drafts_row = rng.integers(0, v, size=(1, k)).astype(np.int32)

    def run(batch_logits, drafts, seeds, steps, key):
        tokens, emitted = verify_and_sample(
            jnp.asarray(batch_logits), jnp.asarray(drafts),
            jnp.full(len(seeds), k, jnp.int32),
            jnp.full(len(seeds), 0.9, jnp.float32),
            jax.random.PRNGKey(key),
            seeds=jnp.asarray(seeds, jnp.int32), steps=jnp.asarray(steps, jnp.int32),
        )
        return np.asarray(tokens)[0], int(np.asarray(emitted)[0])

    solo = run(row_logits, drafts_row, [77], [5], key=0)
    noise = rng.normal(size=(2, k + 1, v)).astype(np.float32)
    crowd = run(
        np.concatenate([row_logits, noise]),
        np.concatenate([drafts_row, rng.integers(0, v, size=(2, k)).astype(np.int32)]),
        [77, -1, 123], [5, 0, 9], key=42,  # different engine key too
    )
    assert solo[1] == crowd[1]
    assert solo[0][: solo[1]].tolist() == crowd[0][: crowd[1]].tolist()


def test_spec_seeded_generation_reproducible(tiny_model_dir):
    """Per-request seeds are honored under speculative decoding: two fresh
    engines produce the identical sampled stream for a seeded request, even
    with different batch company."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    common = dict(
        dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=64, kvcache_block_size=16,
        speculative_config={
            "method": "ngram", "num_speculative_tokens": 4,
            "prompt_lookup_max": 3, "prompt_lookup_min": 1,
        },
    )
    prompt = [1, 2, 3, 1, 2, 3, 1, 2]
    sp = SamplingParams(temperature=0.8, max_tokens=20, seed=1234)

    solo = LLM(tiny_model_dir, **common).generate([prompt], sp, use_tqdm=False)
    crowd_llm = LLM(tiny_model_dir, **common)
    crowd = crowd_llm.generate(
        [prompt, [7, 8, 7, 8, 7, 8]],
        [sp, SamplingParams(temperature=0.9, max_tokens=20)],
        use_tqdm=False,
    )
    assert solo[0]["token_ids"] == crowd[0]["token_ids"]
    assert crowd_llm.spec_metrics.summary()["num_drafts"] > 0


def test_ngram_proposer_cycle_extends_full_k():
    """A period-p loop must yield FULL-k drafts (cycle extension), not the
    ~p-n truncated slice after the most recent match — SPEC_r04 measured
    1.11-token drafts at 0.90 acceptance because of the truncation
    (VERDICT r4 #3a)."""
    p = NgramProposer(num_speculative_tokens=8, prompt_lookup_min=1, prompt_lookup_max=3)
    tokens = [1, 2, 3] * 5  # period-3 loop
    drafts = p.propose(tokens)
    assert drafts == [1, 2, 3, 1, 2, 3, 1, 2]  # full k=8, cycle-extended
    # period 1 (single-token loop): k copies
    p2 = NgramProposer(num_speculative_tokens=4, prompt_lookup_min=1, prompt_lookup_max=3)
    assert p2.propose([7, 7, 7, 7]) == [7, 7, 7, 7]


def test_ngram_device_propose_matches_host():
    """Device propose (ops/ngram.py) over a window covering the full history
    must agree with the host proposer (same longest-n/most-recent/cycle-extend
    semantics)."""
    import random

    import jax.numpy as jnp

    from byox_vllm_tpu.ops.ngram import ngram_propose_device

    rng = random.Random(0)
    R, k = 32, 5
    host = NgramProposer(num_speculative_tokens=k, prompt_lookup_min=1, prompt_lookup_max=3)
    rows, lens, expects = [], [], []
    for _ in range(40):
        ln = rng.randint(3, R)
        toks = [rng.randint(0, 6) for _ in range(ln)]  # tiny vocab: repeats
        expects.append(host.propose(toks))
        row = [-1] * (R - ln) + toks
        rows.append(row)
        lens.append(ln)
    drafts, nd = ngram_propose_device(
        jnp.asarray(rows, jnp.int32), jnp.asarray(lens, jnp.int32), 1, 3, k
    )
    drafts, nd = np.asarray(drafts), np.asarray(nd)
    for i, exp in enumerate(expects):
        if exp:
            assert nd[i] == k
            assert drafts[i].tolist() == exp, (i, drafts[i].tolist(), exp)
        else:
            assert nd[i] == 0


def test_ngram_device_append_tokens():
    import jax.numpy as jnp

    from byox_vllm_tpu.ops.ngram import append_tokens_device

    toks = jnp.asarray([[-1, -1, 1, 2], [5, 6, 7, 8]], jnp.int32)
    lens = jnp.asarray([2, 4], jnp.int32)
    new = jnp.asarray([[9, 0, 0], [3, 4, 0]], jnp.int32)
    counts = jnp.asarray([1, 2], jnp.int32)
    out, out_lens = append_tokens_device(toks, lens, new, counts)
    assert np.asarray(out).tolist() == [[-1, 1, 2, 9], [7, 8, 3, 4]]
    assert np.asarray(out_lens).tolist() == [3, 4]
