"""Microbench the paged decode attention kernels in isolation.

Methodology (the axon tunnel makes naive timing lie twice over):
- the tunnel caches identical dispatches -> inputs must vary per call
- block_until_ready returns before device completion -> only jax.device_get
  is a true sync; the ~49 ms tunnel RTT then dominates any single call
So: run the kernel in an in-jit scan at two iteration counts and report the
MARGINAL time per iteration, (T(hi) - T(lo)) / (hi - lo), with device_get
and varied inputs. Reports us/iter and effective HBM bandwidth (KV bytes
actually in-context / time) vs the chip's ~819 GB/s (v5e).
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
    ap.add_argument("variants", nargs="*", default=["v1", "v2"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=150)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--nh", type=int, default=16)
    ap.add_argument("--nkv", type=int, default=8)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--kv", default="bf16", choices=["bf16", "int8"])
    args = ap.parse_args()

    from byox_vllm_tpu.ops.paged_attention import (
        paged_decode_attention,
        paged_decode_attention_v2,
        paged_decode_attention_v3,
    )

    B, CTX, BS, NH, NKV, HD = args.batch, args.ctx, args.block, args.nh, args.nkv, args.hd
    W = -(-CTX // BS)
    F = NKV * HD
    num_slots = B * W * BS
    rng = np.random.default_rng(0)
    kv_dtype = jnp.int8 if args.kv == "int8" else jnp.bfloat16
    from byox_vllm_tpu.ops.kv_cache import SCALE_LANES, encode_scale_bytes, row_width

    if args.kv == "int8":
        data = rng.integers(-127, 127, (num_slots, 2 * F), dtype=np.int8)
        sc = np.zeros((num_slots, SCALE_LANES), np.float32)
        sc[:, : 2 * NKV] = rng.random((num_slots, 2 * NKV), dtype=np.float32) * 0.01
        sc_bytes = np.asarray(encode_scale_bytes(jnp.asarray(sc).astype(jnp.bfloat16)))
        pool = jnp.asarray(np.concatenate([data, sc_bytes], axis=1))
        assert pool.shape[1] == row_width(F, True)
    else:
        pool = jnp.asarray(
            rng.standard_normal((num_slots, 2 * F)).astype(np.float32)
        ).astype(kv_dtype)
    if os.environ.get("BYOX_BENCH_CONTIG_TABLES", "1") == "1":
        # per-seq sequential pages (what the block manager actually
        # allocates at prefill — enables the v3 fused-pair DMA)
        tables = jnp.asarray(np.arange(B * W, dtype=np.int32).reshape(B, W))
    else:
        # shuffled page assignment (worst-case fragmented tables)
        perm = rng.permutation(B * W).astype(np.int32)
        tables = jnp.asarray(perm.reshape(B, W))
    ctx_lens = jnp.asarray(
        rng.integers(max(1, CTX - 30), CTX + 1, B).astype(np.int32)
    )
    q0 = jnp.asarray(rng.standard_normal((B, NH, HD)).astype(np.float32)).astype(jnp.bfloat16)
    scale = HD ** -0.5

    import functools
    fns = {
        "v1": paged_decode_attention,
        "v2": paged_decode_attention_v2,
        "v3": functools.partial(paged_decode_attention_v3, seqs_per_step=4),
        "v3sb2": functools.partial(paged_decode_attention_v3, seqs_per_step=2),
        "v3sb8": functools.partial(paged_decode_attention_v3, seqs_per_step=8),
        "v3sb16": functools.partial(paged_decode_attention_v3, seqs_per_step=16),
        "v3ppc1": functools.partial(paged_decode_attention_v3, seqs_per_step=4, max_pages_per_chunk=1),
        "v3ppc8": functools.partial(paged_decode_attention_v3, seqs_per_step=4, max_pages_per_chunk=8),
    }

    kv_bytes = (
        int(np.sum(np.asarray(ctx_lens)))
        * F
        * 2
        * (1 if args.kv == "int8" else 2)
    )

    for name in args.variants:
        fn = fns[name]

        # pools threaded as args, NOT closure constants: closure capture
        # embeds them in the compile request (HTTP 413 past ~100 MB) and
        # bloats every cache entry
        def run(q, pool, tables, ctx_lens, it):
            def body(carry, i):
                q = carry
                o = fn(
                    q, pool, tables, ctx_lens,
                    block_size=BS, scale=scale,
                )
                return o, ()
            out, _ = jax.lax.scan(body, q, jnp.arange(it))
            return out

        jitted = jax.jit(run, static_argnums=(4,))
        lo, hi = args.iters, args.iters * 8
        for it in (lo, hi):  # compile both
            _ = jax.device_get(jitted(q0, pool, tables, ctx_lens, it))

        def timed(it, i):
            qi = q0 * (1.0 + jnp.float32(0.001 * (i + 1)).astype(q0.dtype))
            _ = jax.device_get(qi)
            t0 = time.perf_counter()
            _ = jax.device_get(jitted(qi, pool, tables, ctx_lens, it))
            return time.perf_counter() - t0

        t_lo = min(timed(lo, i) for i in range(3))
        t_hi = min(timed(hi, i + 3) for i in range(3))
        dt = (t_hi - t_lo) / (hi - lo)
        bw = kv_bytes / dt / 1e9
        print(
            f"{name}: {dt * 1e6:8.1f} us/iter (marginal)  KV {kv_bytes / 1e6:.1f} MB"
            f"  -> {bw:6.1f} GB/s effective",
            flush=True,
        )


if __name__ == "__main__":
    main()
