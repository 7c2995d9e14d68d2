"""Pipeline parallelism (models/pp.py): the layer stack sharded across the
'stage' mesh axis, sequential stage hand-off via ppermute, stage-uniform
outputs via the final-hidden psum. Greedy outputs must equal single-device
runs for pp alone, pp x tp, and pp x dp."""

import numpy as np
import pytest


def _cfg(**over):
    cfg = {"model_type": "qwen3", "vocab_size": 256, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 4,
           "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": True, "attention_bias": False,
           "max_position_embeddings": 4096}
    cfg.update(over)
    return cfg


_COMMON = dict(
    dtype="float32", max_model_len=64, max_num_batched_tokens=256,
    num_kvcache_blocks=32, kvcache_block_size=16, seed=9,
)

_PROMPTS = [[3, 1, 4, 1, 5], [2, 7, 2, 7, 9, 11], [8, 8, 8], [5, 4, 3, 2, 1, 6, 7]]


def _greedy(llm, prompts, n=8):
    from byox_vllm_tpu.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
    return [o["token_ids"] for o in llm.generate(prompts, sp, use_tqdm=False)]


def test_pp_matches_single_device():
    from byox_vllm_tpu.llm import LLM

    single = _greedy(LLM(hf_config=_cfg(), **_COMMON), _PROMPTS)
    pp = _greedy(LLM(hf_config=_cfg(), pipeline_parallel_size=2, **_COMMON), _PROMPTS)
    assert pp == single
    pp4 = _greedy(LLM(hf_config=_cfg(), pipeline_parallel_size=4, **_COMMON), _PROMPTS)
    assert pp4 == single


def test_pp_x_tp_matches_single_device():
    from byox_vllm_tpu.llm import LLM

    single = _greedy(LLM(hf_config=_cfg(), **_COMMON), _PROMPTS)
    mixed = _greedy(
        LLM(hf_config=_cfg(), pipeline_parallel_size=2, tensor_parallel_size=2, **_COMMON),
        _PROMPTS,
    )
    assert mixed == single


def test_pp_x_dp_matches_single_device():
    from byox_vllm_tpu.llm import LLM

    single = _greedy(LLM(hf_config=_cfg(), **_COMMON), _PROMPTS)
    mixed = _greedy(
        LLM(hf_config=_cfg(), pipeline_parallel_size=2, data_parallel_size=2, **_COMMON),
        _PROMPTS,
    )
    assert mixed == single


def test_pp_prefix_cache_and_preemption():
    """PP with a tight pool: preemption/recompute and prefix-cache reruns
    behave identically to single-device."""
    from byox_vllm_tpu.llm import LLM

    prompts = [list(range(10, 40)), list(range(50, 80)), list(range(1, 30))]
    single = _greedy(LLM(hf_config=_cfg(), **_COMMON), prompts, n=10)
    tight = LLM(
        hf_config=_cfg(), pipeline_parallel_size=2,
        **{**_COMMON, "num_kvcache_blocks": 10, "max_num_batched_tokens": 64},
    )
    out = _greedy(tight, prompts, n=10)
    assert out == single
    assert _greedy(tight, prompts, n=10) == single  # prefix-cached rerun


def test_pp_rejects_unsupported_combos():
    from byox_vllm_tpu.llm import LLM

    with pytest.raises(AssertionError):
        LLM(hf_config=_cfg(num_hidden_layers=3), pipeline_parallel_size=2, **_COMMON)
    with pytest.raises(AssertionError):
        # eagle needs capture_hidden through the pipeline register — still TBD
        LLM(
            hf_config=_cfg(), pipeline_parallel_size=2,
            speculative_config={"method": "eagle", "num_speculative_tokens": 2},
            **_COMMON,
        )


def test_pp_x_ngram_spec_decode_matches_single_device():
    """ngram speculative decoding composes with pp: the verify step drives
    forward_pp with all_logits=True (signature-compatible); greedy outputs
    must match the plain single-device engine."""
    from byox_vllm_tpu.llm import LLM

    # repetitive prompts so the ngram proposer actually drafts
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [9, 2, 9, 2, 9, 2], [4, 4, 4, 4]]
    single = _greedy(LLM(hf_config=_cfg(), **_COMMON), prompts)
    spec = dict(method="ngram", num_speculative_tokens=2, prompt_lookup_max=3)
    pp = _greedy(
        LLM(hf_config=_cfg(), pipeline_parallel_size=2,
            speculative_config=dict(spec), **_COMMON),
        prompts,
    )
    assert pp == single


def test_pp_quantized_matches_single_device():
    """PP x int8 quantization: the stage-grouped copy-free weight layout
    (per-local-layer [S, ...] arrays, models/pp.py::regroup_layers_pp) must
    reproduce single-device quantized greedy output exactly — this is the
    config the r2 verdict flagged as slow-by-construction and is now the
    supported fast path."""
    from byox_vllm_tpu.llm import LLM

    common = {**_COMMON, "quantization": "int8"}
    single = _greedy(LLM(hf_config=_cfg(), **common), _PROMPTS)
    pp = _greedy(LLM(hf_config=_cfg(), pipeline_parallel_size=2, **common), _PROMPTS)
    assert pp == single


def test_pp_microbatch_counts_match():
    """The GPipe schedule is output-invariant in the microbatch count M
    (M=1 degenerates to sequential hand-off; M=4 overlaps 4 microbatches)."""
    from byox_vllm_tpu.llm import LLM

    single = _greedy(LLM(hf_config=_cfg(), **_COMMON), _PROMPTS)
    for m in (1, 2, 4):
        out = _greedy(
            LLM(hf_config=_cfg(), pipeline_parallel_size=2, pp_microbatches=m,
                **_COMMON),
            _PROMPTS,
        )
        assert out == single, m


def test_pp_x_tp_quantized_matches_single_device():
    """PP x TP x int8: stage-grouped quantized weights also carry the TP
    column permutation and scale refinement."""
    from byox_vllm_tpu.llm import LLM

    common = {**_COMMON, "quantization": "int8"}
    cfg = _cfg(num_attention_heads=8, num_key_value_heads=4)
    single = _greedy(LLM(hf_config=cfg, **common), _PROMPTS)
    mixed = _greedy(
        LLM(hf_config=cfg, pipeline_parallel_size=2, tensor_parallel_size=2,
            **common),
        _PROMPTS,
    )
    assert mixed == single
