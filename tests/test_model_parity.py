"""Numerical parity of the JAX Qwen3 against HF transformers (torch CPU).

The oracle the reference never had: it was only ever eyeballed via
example.py. A tiny random-weight Qwen3 is saved with save_pretrained and
loaded by our safetensors loader; logits and greedy generations must match.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from transformers import Qwen3Config, Qwen3ForCausalLM

from byox_vllm_tpu.engine.batch_prep import prepare_decode, prepare_prefill
from byox_vllm_tpu.engine.block_manager import BlockManager
from byox_vllm_tpu.engine.sequence import Sequence
from byox_vllm_tpu.models.qwen3 import Qwen3Spec, forward
from byox_vllm_tpu.utils.loader import load_qwen3_params

BS = 16  # kv block size


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    model = Qwen3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_qwen3")
    model.save_pretrained(path, safe_serialization=True)
    return model, cfg, str(path)


@pytest.fixture(scope="module")
def jax_side(tiny_model):
    _, cfg, path = tiny_model
    spec = Qwen3Spec.from_hf_config(cfg)
    params = load_qwen3_params(path, spec, dtype=jnp.float32)
    return spec, params


def hf_logits(model, token_ids):
    with torch.no_grad():
        out = model(torch.tensor([token_ids], dtype=torch.long))
    return out.logits[0].float().numpy()  # [T, V]


def fresh_kv(spec, num_slots=512):
    from byox_vllm_tpu.models.qwen3 import make_kv_cache

    return make_kv_cache(spec, num_slots, jnp.float32)


def run_step(spec, params, kv, batch):
    return forward(
        params, kv,
        jnp.asarray(batch.token_ids), jnp.asarray(batch.q_lens),
        jnp.asarray(batch.context_lens), jnp.asarray(batch.slot_mapping),
        jnp.asarray(batch.block_tables), spec, BS,
    )


def test_prefill_logits_match_hf(tiny_model, jax_side):
    model, _, _ = tiny_model
    spec, params = jax_side
    prompt = [3, 17, 99, 140, 7, 250, 31, 8, 77, 123]

    bm = BlockManager(16, BS)
    seq = Sequence(prompt, BS)
    bm.allocate(seq)
    batch = prepare_prefill([seq], BS)
    logits, _ = run_step(spec, params, fresh_kv(spec), batch)

    ref = hf_logits(model, prompt)[-1]
    np.testing.assert_allclose(np.asarray(logits[0]), ref, rtol=2e-4, atol=2e-4)


def test_decode_step_matches_hf(tiny_model, jax_side):
    """Prefill n-1 tokens, decode the n-th: logits must equal HF's full-prefix
    last-position logits (validates KV write + paged read across steps)."""
    model, _, _ = tiny_model
    spec, params = jax_side
    prompt = list(range(40, 75))  # 35 tokens -> 3 blocks of 16

    bm = BlockManager(16, BS)
    seq = Sequence(prompt[:-1], BS)
    bm.allocate(seq)
    kv = fresh_kv(spec)
    _, kv = run_step(spec, params, kv, prepare_prefill([seq], BS))

    seq.append_token(prompt[-1])
    bm.may_append(seq)
    batch = prepare_decode([seq], BS)
    logits, _ = run_step(spec, params, kv, batch)

    ref = hf_logits(model, prompt)[-1]
    np.testing.assert_allclose(np.asarray(logits[0]), ref, rtol=2e-4, atol=2e-4)


def test_ragged_batch_prefill(tiny_model, jax_side):
    """Two prompts of different lengths in one padded batch: each row's
    logits must match its own HF single-prompt run."""
    model, _, _ = tiny_model
    spec, params = jax_side
    p1 = [5, 9, 200, 13]
    p2 = list(range(100, 125))

    bm = BlockManager(16, BS)
    s1, s2 = Sequence(p1, BS), Sequence(p2, BS)
    bm.allocate(s1)
    bm.allocate(s2)
    batch = prepare_prefill([s1, s2], BS)
    logits, _ = run_step(spec, params, fresh_kv(spec), batch)

    np.testing.assert_allclose(np.asarray(logits[0]), hf_logits(model, p1)[-1], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits[1]), hf_logits(model, p2)[-1], rtol=2e-4, atol=2e-4)


def test_engine_greedy_matches_hf_generate(tiny_model):
    model, _, path = tiny_model
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    llm = LLM(
        path,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=256,
        num_kvcache_blocks=64,
        kvcache_block_size=BS,
    )
    prompts = [[3, 17, 99, 140, 7], list(range(60, 80))]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=8), use_tqdm=False)

    for prompt, out in zip(prompts, outs):
        with torch.no_grad():
            ref = model.generate(
                torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
                eos_token_id=None, pad_token_id=0,
            )[0, len(prompt):].tolist()
        assert out["token_ids"] == ref


def test_prefix_cache_hit_same_output(tiny_model):
    model, _, path = tiny_model
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    llm = LLM(
        path,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=256,
        num_kvcache_blocks=64,
        kvcache_block_size=BS,
    )
    prompt = list(range(10, 50))  # 40 tokens: 2 full blocks cacheable
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    first = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
    # second run hits the prefix cache (cached blocks survive deallocation)
    second = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
    assert first == second
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(prompt):].tolist()
    assert first == ref


def test_fully_cached_prompt_still_computes_logits(tiny_model):
    """A prompt whose every block is prefix-cached must still produce correct
    next-token logits (the engine recomputes the last token; submitting an
    empty query chunk would sample from garbage)."""
    model, _, path = tiny_model
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    llm = LLM(
        path,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=256,
        num_kvcache_blocks=64,
        kvcache_block_size=BS,
    )
    prompt = list(range(10, 42))  # exactly 2 full blocks of 16: fully cacheable
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    first = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
    second = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, len(prompt):].tolist()
    assert first == ref
    assert second == ref  # the fully-cached rerun must match, not garbage
