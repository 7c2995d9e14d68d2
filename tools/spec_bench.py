"""On-chip speculative-decoding benchmark -> SPEC_rNN.json.

Measures ngram prompt-lookup speculative decoding on a repetitive workload
(the reference demonstrates this surface with real vLLM in
/root/reference/vllm_ngram.py:70-104: drafts / draft tokens / accepted /
per-position acceptance / mean acceptance length) against a no-spec baseline
on the SAME engine config, on real hardware.

Zero-egress: random-init weights at the Qwen3-0.6B geometry. Greedy sampling
(temperature 0) — a random-weight model decodes into repetitive loops, which
is exactly the regime prompt-lookup drafting serves; acceptance on a trained
model with natural text is higher still.

Usage: python tools/spec_bench.py [--out SPEC_r04.json] [--seqs 32] [--k 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--seqs", type=int, default=32)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--model", default="0.6b")
    ap.add_argument("--ckpt", default=None, help="real HF checkpoint dir (overrides --model geometry)")
    ap.add_argument("--quant", default=None, help="None | int8 | int4 | w4a8 (north-star cfg 4: w4a8)")
    ap.add_argument("--kv", default="auto", help="KV cache dtype: auto | int8")
    args = ap.parse_args()

    from bench import QWEN3_0_6B, QWEN3_8B

    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    hf = dict(QWEN3_8B if args.model == "8b" else QWEN3_0_6B)
    import random

    rng = random.Random(0)
    prompts = []
    for _ in range(args.seqs):
        period = rng.randint(2, 5)
        motif = [rng.randint(0, 10000) for _ in range(period)]
        reps = rng.randint(10, 16)
        prompts.append((motif * reps)[: rng.randint(40, 64)])
    sp = [
        SamplingParams(temperature=0.0, ignore_eos=True, max_tokens=args.max_tokens)
        for _ in range(args.seqs)
    ]

    common = dict(
        hf_config=hf,
        max_model_len=256,
        max_num_batched_tokens=2048,
        max_num_seqs=max(args.seqs, 8),
        gpu_memory_utilization=0.6,
        kv_cache_dtype=args.kv,
    )
    if args.quant:
        common["quantization"] = args.quant
    if args.ckpt:
        # trained weights + natural-text prompts (tools/real_ckpt_gate.py):
        # acceptance on natural text is the serving-relevant number
        common["model"] = args.ckpt
        del common["hf_config"]
        prompts = [
            "The quick brown fox jumps over the lazy dog. " * 4
            + "Repeat the previous sentence ten times:"
        ] * args.seqs

    def run(spec_cfg):
        llm = LLM(**common, speculative_config=spec_cfg)
        llm.generate(prompts, sp, use_tqdm=False)  # warmup: compile all buckets
        if llm.spec_metrics is not None:
            llm.spec_metrics.__init__()
        t0 = time.perf_counter()
        outs = llm.generate(prompts, sp, use_tqdm=False)
        dt = time.perf_counter() - t0
        toks = sum(len(o["token_ids"]) for o in outs)
        result = {
            "tok_s": round(toks / dt, 1),
            "wall_s": round(dt, 3),
            "total_tokens": toks,
        }
        if llm.spec_metrics is not None:
            result["acceptance"] = llm.spec_metrics.summary()
        first = [o["token_ids"][:16] for o in outs[:4]]
        llm.exit()
        return result, first

    base, base_toks = run(None)
    spec, spec_toks = run(
        {
            "method": "ngram",
            "num_speculative_tokens": args.k,
            "prompt_lookup_max": 3,
            "prompt_lookup_min": 1,
        }
    )

    import jax

    record = {
        "date": time.strftime("%Y-%m-%d"),
        "backend": jax.default_backend(),
        "model": args.model,
        "num_seqs": args.seqs,
        "max_tokens": args.max_tokens,
        "num_speculative_tokens": args.k,
        "workload": "repetitive token-id prompts (period 2-5), greedy",
        "baseline": base,
        "ngram_spec": spec,
        "speedup": round(spec["tok_s"] / base["tok_s"], 3),
        "greedy_prefix16_match": base_toks == spec_toks,
    }
    line = json.dumps(record)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
