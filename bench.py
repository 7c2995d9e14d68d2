"""Offline throughput benchmark — methodology parity with the reference's
bench.py: 128 sequences, input len ~U(100,128) random token ids, output len
~U(100,128) with ignore_eos, temperature 0.6, Qwen3-0.6B geometry,
max_model_len 256; metric = total generated tokens / wall-clock seconds after
one warmup generate.

No checkpoint is required (zero-egress environment): weights are
random-initialized at the real Qwen3-0.6B shape, which exercises the
identical compute/memory path. Prints one JSON line for the driver.
"""

import glob
import json
import os
import random
import re
import sys
import time

NUM_SEQS = 128
MAX_INPUT_LEN = 128
MAX_OUTPUT_LEN = 128

QWEN3_0_6B = {
    "model_type": "qwen3",
    "vocab_size": 151936,
    "hidden_size": 1024,
    "intermediate_size": 3072,
    "num_hidden_layers": 28,
    "num_attention_heads": 16,
    "num_key_value_heads": 8,
    "head_dim": 128,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "tie_word_embeddings": True,
    "attention_bias": False,
    "max_position_embeddings": 40960,
}

QWEN3_8B = {
    "model_type": "qwen3",
    "vocab_size": 151936,
    "hidden_size": 4096,
    "intermediate_size": 12288,
    "num_hidden_layers": 36,
    "num_attention_heads": 32,
    "num_key_value_heads": 8,
    "head_dim": 128,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "tie_word_embeddings": False,
    "attention_bias": False,
    "max_position_embeddings": 40960,
}


def main():
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    random.seed(0)
    num_seqs = int(os.environ.get("BYOX_BENCH_SEQS", NUM_SEQS))
    quant = os.environ.get("BYOX_BENCH_QUANT")  # None | int8 | int4
    kv_dtype = os.environ.get("BYOX_BENCH_KV", "auto")  # auto | int8
    model = os.environ.get("BYOX_BENCH_MODEL", "0.6b")  # 0.6b | 8b
    hf_cfg = QWEN3_8B if model == "8b" else QWEN3_0_6B
    llm = LLM(
        hf_config=dict(hf_cfg),
        max_model_len=256,
        max_num_batched_tokens=int(os.environ.get("BYOX_BENCH_BUDGET", "2048")),
        max_num_seqs=256,
        gpu_memory_utilization=float(os.environ.get("BYOX_BENCH_UTIL", "0.7")),
        num_decode_steps=int(os.environ.get("BYOX_BENCH_STEPS", "16")),
        quantization=quant,
        kv_cache_dtype=kv_dtype,
    )

    prompts = [
        [random.randint(0, 10000) for _ in range(random.randint(100, MAX_INPUT_LEN))]
        for _ in range(num_seqs)
    ]
    sampling = [
        SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=random.randint(100, MAX_OUTPUT_LEN))
        for _ in range(num_seqs)
    ]

    # Warmup with a full same-shape workload on *different* prompts:
    # compiles/loads every shape-bucket program the timed run will hit,
    # without priming the prefix cache (cache hits would change the timed
    # run's prefill shapes). The reference methodology warms up once too
    # (bench.py:38); steady-state serving throughput is the metric.
    warm_prompts = [
        [random.randint(0, 10000) for _ in range(len(p))] for p in prompts
    ]
    llm.generate(
        warm_prompts,
        [SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=sp.max_tokens) for sp in sampling],
        use_tqdm=False,
    )

    t0 = time.time()
    llm.generate(prompts, sampling, use_tqdm=False)
    dt = time.time() - t0
    total_tokens = sum(sp.max_tokens for sp in sampling)
    tok_s = total_tokens / dt

    tag = "bf16" if not quant else quant
    if kv_dtype != "auto":
        tag += f"_kv{kv_dtype}"
    metric = f"offline_throughput_qwen3_{model}_{tag}"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(tok_s, 2),
                "unit": "tok/s",
                "vs_baseline": _vs_previous_round(metric, tok_s),
            }
        )
    )


def _vs_previous_round(metric: str, value: float) -> float:
    """Ratio vs the most recent recorded round (driver writes BENCH_r{N}.json);
    1.0 when no prior same-metric record exists (the reference publishes no
    numbers to compare against, BASELINE.md)."""
    best = None
    for path in glob.glob("BENCH_r*.json"):
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        if rec.get("metric") == metric and rec.get("value"):
            n = int(re.search(r"BENCH_r(\d+)", path).group(1))
            if best is None or n > best[0]:
                best = (n, rec["value"])
    return round(value / best[1], 4) if best else 1.0
    print(f"# {total_tokens} tokens in {dt:.2f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
