"""Speculative-decoding demo + acceptance metrics.

Counterpart of the reference's spec_decode.py / vllm_ngram.py pair: runs
speculative decoding and prints the acceptance metrics surface the reference
demonstrates against real vLLM (vllm_ngram.py:70-104): drafts, draft tokens,
accepted tokens, per-position acceptance rate, mean acceptance length.

Methods (BYOX_SPEC_METHOD): ngram (default), draft_model (independent small
drafter, BYOX_DRAFT_MODEL=<path> names its checkpoint), or eagle (true
feature-level drafting: the drafter consumes the target's hidden states;
random drafter weights unless injected — real acceptance needs a trained
EAGLE head).

Without a checkpoint (zero-egress environment) it runs the Qwen3-0.6B
geometry with random weights on repetitive token-id prompts (ngram-friendly);
draft_model mode then self-drafts with a random 2-layer model.
"""

import json
import os
import sys

from byox_vllm_tpu import LLM, SamplingParams


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.expanduser("~/huggingface/Qwen3-0.6B/")
    method = os.environ.get("BYOX_SPEC_METHOD", "ngram")
    if method == "draft_model":
        spec_cfg = {"method": "draft_model", "num_speculative_tokens": 4}
        draft = os.environ.get("BYOX_DRAFT_MODEL")
        if draft:
            spec_cfg["model"] = draft
        else:  # no checkpoint: a tiny random drafter exercises the machinery
            spec_cfg["draft_hf_config"] = {
                "model_type": "qwen3", "vocab_size": 151936, "hidden_size": 256,
                "intermediate_size": 512, "num_hidden_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "head_dim": 128, "rms_norm_eps": 1e-6, "rope_theta": 1e6,
                "tie_word_embeddings": True, "attention_bias": False,
                "max_position_embeddings": 40960,
            }
    elif method == "eagle":
        spec_cfg = {"method": "eagle", "num_speculative_tokens": 4, "draft_num_layers": 1}
    else:
        spec_cfg = {
            "method": "ngram",
            "num_speculative_tokens": 4,
            "prompt_lookup_max": 3,
            "prompt_lookup_min": 1,
        }
    if os.path.isdir(path):
        llm = LLM(path, max_model_len=4096, speculative_config=spec_cfg)
        prompts = [
            "Repeat after me: the quick brown fox jumps over the lazy dog. "
            "The quick brown fox jumps over the lazy dog. The quick",
            "Count: 1 2 3 4 5 6 7 8 9 10 1 2 3 4 5 6 7",
        ]
        sp = SamplingParams(temperature=0.6, max_tokens=256)
    else:
        from bench import QWEN3_0_6B

        llm = LLM(
            hf_config=dict(QWEN3_0_6B),
            max_model_len=512,
            max_num_batched_tokens=2048,
            speculative_config=spec_cfg,
        )
        prompts = [([5, 6, 7, 8] * 16)[:50], ([11, 12, 13] * 20)[:45]]
        sp = SamplingParams(temperature=0.6, max_tokens=128, ignore_eos=True)

    outs = llm.generate(prompts, sp, use_tqdm=False)
    for out in outs:
        print(f"completion ({len(out['token_ids'])} tokens): {out['text'][:120] or out['token_ids'][:24]}")

    print(json.dumps(llm.spec_metrics.summary(), indent=2))


if __name__ == "__main__":
    main()
