"""Microbench the fused dequant-matmul kernel vs the bf16 dense matmul.

In-jit scan amortizes dispatch; reports us/call and effective weight-stream
bandwidth (quantized bytes / time). A perfect weight-only kernel at decode
batch sizes is HBM-bound: int8 should run ~2x the bf16 GB-equivalent rate,
int4 ~4x.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/byox_vllm_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=["bf16", "int8", "int4"])
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from byox_vllm_tpu.ops.quant import quant_matmul_pallas, quantize_weight

    rng = np.random.default_rng(0)
    N, K, M = args.n, args.k, args.m
    x = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32)).astype(jnp.bfloat16)
    w = rng.standard_normal((K, M)).astype(np.float32) * 0.02

    def bench(name, fn, weight_bytes, *operands):
        def run(x, it):
            def body(carry, _):
                o = fn(carry, *operands)
                # feed a slice back so iterations chain (defeats CSE)
                return carry + o[:, :K].astype(carry.dtype) * 0, ()
            out, _ = jax.lax.scan(body, x, jnp.arange(it))
            return out

        jitted = jax.jit(run, static_argnums=(1,))
        out = jitted(x, args.iters)
        jax.block_until_ready(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jitted(x, args.iters)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        dt = min(times) / args.iters
        print(
            f"{name}: {dt * 1e6:8.1f} us/call  {weight_bytes / 1e6:7.1f} MB"
            f"  -> {weight_bytes / dt / 1e9:6.1f} GB/s effective",
            flush=True,
        )

    for v in args.variants:
        if v == "bf16":
            wd = jnp.asarray(w).astype(jnp.bfloat16)
            bench("bf16", lambda a, wd: a @ wd, K * M * 2, wd)
        else:
            bits = {"int8": 8, "int4": 4}[v]
            q = quantize_weight(w, bits=bits)
            wb = K * M * (1 if bits == 8 else 0.5)
            bench(
                v,
                lambda a, qq, ss, bits=bits: quant_matmul_pallas(a, qq, ss, bits=bits),
                wb,
                q["q"],
                q["s"],
            )


if __name__ == "__main__":
    main()
