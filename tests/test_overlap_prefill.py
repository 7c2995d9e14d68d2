"""Overlap prefill: an arriving request's prefill dispatches BEHIND the
in-flight decode window (no pipeline drain). Outputs must be identical to
the flush path — same tokens, all requests complete."""

import numpy as np

TINY = {
    "model_type": "qwen3", "vocab_size": 512, "hidden_size": 128,
    "intermediate_size": 256, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
    "rms_norm_eps": 1e-6, "rope_theta": 1e6, "tie_word_embeddings": True,
    "attention_bias": False, "max_position_embeddings": 4096,
}


def _drive(overlap: bool):
    """Start a batch, then inject arrivals mid-decode; collect all outputs."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    llm = LLM(
        hf_config=TINY, max_model_len=128, max_num_batched_tokens=512,
        num_kvcache_blocks=128, kvcache_block_size=16,
        overlap_prefill=overlap, num_decode_steps=4,
    )
    sp = SamplingParams(max_tokens=12, ignore_eos=True, temperature=0.0)
    rng = np.random.default_rng(0)
    first = [rng.integers(1, 500, rng.integers(4, 20)).tolist() for _ in range(4)]
    later = [rng.integers(1, 500, rng.integers(4, 20)).tolist() for _ in range(3)]
    for p in first:
        llm.add_request(p, sp)
    outputs = {}
    steps = 0
    injected = 0
    while not llm.is_finished() or injected < len(later):
        # inject an arrival every few steps while decode windows are in flight
        if injected < len(later) and steps in (2, 4, 6):
            llm.add_request(later[injected], sp)
            injected += 1
        finished, _ = llm.step()
        for sid, completion in finished:
            outputs[sid] = completion
        steps += 1
        assert steps < 400
    llm.exit()
    return [outputs[k] for k in sorted(outputs)]


def test_overlap_prefill_matches_flush_path():
    a = _drive(overlap=True)
    b = _drive(overlap=False)
    assert len(a) == 7 and all(len(t) == 12 for t in a)
    assert a == b  # greedy: identical token streams either way
