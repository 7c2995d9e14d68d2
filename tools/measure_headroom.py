"""Measure peak transient (activation) memory of the largest-bucket compiled
programs via XLA's memory_analysis, and compare against the analytic
estimate used for KV-pool sizing (engine/model_runner.py::
estimate_activation_bytes). The TPU-native counterpart of the reference's
CUDA warmup probe (nanovllm/engine/model_runner.py:102-136): instead of
running at max shapes and reading allocator stats, the compiled executable
reports its temp-buffer requirement exactly, without touching the chip.

Usage:
  python tools/measure_headroom.py [--model 0.6b|8b] [--quant int4] [--kv int8]
  BYOX_CPU=1 ... to force the CPU backend (sanity only; TPU numbers matter).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("BYOX_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="8b")
    ap.add_argument("--quant", default=None)
    ap.add_argument("--kv", default="auto")
    ap.add_argument("--seqs", type=int, default=256)
    ap.add_argument("--budget", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import QWEN3_0_6B, QWEN3_8B, QWEN3_TINY
    from byox_vllm_tpu.config import Config
    from byox_vllm_tpu.engine.model_runner import ModelRunner, estimate_activation_bytes

    hf = {"8b": QWEN3_8B, "tiny": QWEN3_TINY}.get(args.model, QWEN3_0_6B)
    config = Config(
        hf_config=dict(hf),
        max_model_len=256,
        max_num_batched_tokens=args.budget,
        max_num_seqs=args.seqs,
        num_kvcache_blocks=64,  # tiny pool: activations don't depend on it
        quantization=args.quant,
        kv_cache_dtype=args.kv,
    )
    runner = ModelRunner(config)
    est = estimate_activation_bytes(runner.spec, config)

    bs = runner.block_size
    w = runner.table_buckets[-1]
    key = jax.random.PRNGKey(0)

    # Reachable prefill buckets only: the scheduler's padded-shape admission
    # caps bucket(num_seqs) x bucket(chunk) at max_num_batched_tokens (for
    # budgets >= 1024), so the largest real prefill programs lie on the
    # s x t == budget diagonal — lowering (max_num_seqs x max_model_len)
    # instead asks XLA about a shape the engine can never run (and OOMs the
    # analysis at 8B).
    t_max = min(args.budget, config.max_model_len)
    pairs = [(8, t_max)]  # a SINGLE long seq may fill the whole budget
    s = 16
    while s <= args.seqs:
        t = min(t_max, max(16, args.budget // s))
        if s * t <= args.budget:  # the admission check's padded-shape cap
            pairs.append((s, t))
        s *= 2

    def analyze(name, fn, *arrs):
        lowered = fn.lower(runner.params, runner.kv_cache, *arrs)
        compiled = lowered.compile()
        try:
            mem = compiled.memory_analysis()
            temp = getattr(mem, "temp_size_in_bytes", None)
            out = getattr(mem, "output_size_in_bytes", None)
            arg = getattr(mem, "argument_size_in_bytes", None)
        except Exception as e:
            temp = out = arg = None
            print(f"# {name}: memory_analysis unavailable: {e}", file=sys.stderr)
        rec = {
            "program": name,
            "temp_bytes": temp,
            "output_bytes": out,
            "argument_bytes": arg,
        }
        print(json.dumps(rec), flush=True)
        return temp or 0

    peak = 0
    if runner.tp == 1 and runner.dp == 1:
        for s, t in pairs:
            prefill_args = (
                jnp.zeros((s, t), jnp.int32),
                jnp.full((s,), 1, jnp.int32),
                jnp.full((s,), 1, jnp.int32),
                jnp.full((s, t), -1, jnp.int32),
                jnp.full((s, w), -1, jnp.int32),
                jnp.ones((s,), jnp.float32),
                key,
                None,
                None,
                None,
            )
            peak = max(peak, analyze(f"prefill_{s}x{t}", runner._step, *prefill_args))
        # largest decode bucket (multi-step window)
        b = max(8, args.seqs)
        k = config.num_decode_steps
        decode_args = (
            jnp.zeros((b,), jnp.int32),
            jnp.full((b,), 1, jnp.int32),
            jnp.full((b, k), -1, jnp.int32),
            jnp.full((b, w), -1, jnp.int32),
            jnp.ones((b,), jnp.float32),
            key,
            None,
            None,
        )
        peak = max(peak, analyze("decode_max", runner._decode, *decode_args))
    else:
        print("# tp/dp > 1: shard_map callers not lowered here", file=sys.stderr)

    print(json.dumps({
        "estimate_bytes": est,
        "measured_peak_temp_bytes": peak,
        "estimate_over_measured": round(est / peak, 3) if peak else None,
        "estimate_covers_measured": bool(est >= peak) if peak else None,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
