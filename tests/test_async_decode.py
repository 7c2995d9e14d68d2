"""Async pipelined decode (config.async_decode): the engine dispatches decode
window n+1 from window n's on-device tokens before fetching window n. These
tests pin output equivalence with the synchronous path — including sequences
finishing mid-pipeline (EOS / max_tokens), which exercises the zombie
deferred-deallocation path — and block accounting integrity."""

import jax.numpy as jnp

from byox_vllm_tpu.llm import LLM
from byox_vllm_tpu.sampling_params import SamplingParams

TINY = {
    "model_type": "qwen3", "vocab_size": 512, "hidden_size": 128,
    "intermediate_size": 256, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
    "rms_norm_eps": 1e-6, "rope_theta": 1e6, "tie_word_embeddings": True,
    "attention_bias": False, "max_position_embeddings": 4096,
}

COMMON = dict(
    hf_config=TINY, max_model_len=128, max_num_batched_tokens=512,
    num_kvcache_blocks=64, kvcache_block_size=16, num_decode_steps=4,
)


def _greedy(**kw):
    return SamplingParams(temperature=0.0, **kw)


def _gen(async_decode, prompts, sp, **overrides):
    llm = LLM(async_decode=async_decode, **{**COMMON, **overrides})
    out = llm.generate(prompts, sp, use_tqdm=False)
    return [o["token_ids"] for o in out]


def test_async_matches_sync_greedy():
    prompts = [[1, 2, 3], [4, 5, 6, 7, 8, 9], [10, 11]]
    sp = _greedy(max_tokens=20, ignore_eos=True)
    assert _gen(True, prompts, sp) == _gen(False, prompts, sp)


def test_async_matches_sync_mixed_lengths():
    """Ragged max_tokens: seqs finish at different windows, shrinking the
    batch mid-pipeline (composition change -> flush + re-pipeline)."""
    prompts = [[1, 2, 3], [4, 5, 6], [7, 8, 9, 10]]
    sps = [
        _greedy(max_tokens=5, ignore_eos=True),
        _greedy(max_tokens=17, ignore_eos=True),
        _greedy(max_tokens=30, ignore_eos=True),
    ]
    a = _gen(True, prompts, sps)
    b = _gen(False, prompts, sps)
    assert a == b
    assert [len(t) for t in a] == [5, 17, 30]


def test_async_eos_mid_window():
    """A sequence hitting EOS mid-window while the next window is in flight
    must finish identically to the sync engine (deferred dealloc path)."""
    prompts = [[1, 2, 3], [4, 5, 6, 7]]
    probe = _gen(True, prompts, _greedy(max_tokens=24, ignore_eos=True))
    # pick the token each row emits somewhere mid-stream as the EOS
    eos = probe[0][9]
    sp = _greedy(max_tokens=24)  # honor EOS
    a = _gen(True, prompts, sp, eos=eos)
    b = _gen(False, prompts, sp, eos=eos)
    assert a == b
    assert any(t[-1] == eos or len(t) == 24 for t in a)


def test_async_blocks_all_freed():
    """After a drain every block must return to the free pool (zombie
    deferred deallocation must not leak)."""
    llm = LLM(async_decode=True, **COMMON)
    sp = _greedy(max_tokens=9, ignore_eos=True)
    llm.generate([[1, 2, 3], [4, 5, 6, 7, 8]], sp, use_tqdm=False)
    bm = llm.scheduler.block_manager
    assert not bm.used_block_ids
    assert len(bm.free_block_ids) == len(bm.blocks)
    assert llm._pending is None


def test_async_preemption_flush():
    """Tiny pool forces preemption pressure; the scheduler must never
    preempt a sequence with a window in flight — outputs still complete."""
    llm = LLM(async_decode=True, **{**COMMON, "num_kvcache_blocks": 10})
    sp = _greedy(max_tokens=12, ignore_eos=True)
    outs = llm.generate([[1, 2, 3]] * 3, sp, use_tqdm=False)
    assert all(len(o["token_ids"]) == 12 for o in outs)
    bm = llm.scheduler.block_manager
    assert not bm.used_block_ids


def test_async_seeded_rows_reproducible():
    """Per-request seeds stay reproducible under pipelining (noise depends
    only on (seed, sample index), not window boundaries)."""
    prompts = [[1, 2, 3], [4, 5, 6]]
    sp = [
        SamplingParams(temperature=0.8, max_tokens=12, ignore_eos=True, seed=7),
        SamplingParams(temperature=0.8, max_tokens=12, ignore_eos=True, seed=7),
    ]
    a = _gen(True, prompts, sp)
    b = _gen(False, prompts, sp)
    # same prompt + same seed -> same tokens, sync or async
    assert a[0] == b[0] and a[1] == b[1]
