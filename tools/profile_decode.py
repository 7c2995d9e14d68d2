"""Decode-step timing breakdown on the north-star config.

Times the jitted multi-step decode program directly (device time per decode
iteration) and each major sub-program (qmm, paged attention) in isolation, so
engine overhead vs kernel time is separable. Run on the real chip:

    python tools/profile_decode.py [--model 8b|0.6b] [--quant int4] [--kv int8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import QWEN3_0_6B, QWEN3_8B
from byox_vllm_tpu.config import Config
from byox_vllm_tpu.engine.model_runner import ModelRunner
from byox_vllm_tpu.engine.sequence import Sequence
from byox_vllm_tpu.sampling_params import SamplingParams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="8b")
    ap.add_argument("--quant", default="int4")
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=180)
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args()

    hf = QWEN3_8B if args.model == "8b" else QWEN3_0_6B
    cfg = Config(
        hf_config=dict(hf),
        max_model_len=256,
        max_num_seqs=256,
        gpu_memory_utilization=0.7,
        num_decode_steps=args.steps,
        quantization=None if args.quant == "none" else args.quant,
        kv_cache_dtype=args.kv,
    )
    runner = ModelRunner(cfg)
    spec = runner.spec
    B, CTX, K = args.batch, args.ctx, args.steps

    # fabricate B sequences at context CTX with allocated blocks
    bs = runner.block_size
    blocks_per_seq = -(-(CTX + K) // bs)
    seqs = []
    sp = SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=K)
    for i in range(B):
        s = Sequence(list(np.random.randint(0, 1000, CTX)), bs, sp)
        s.num_computed_tokens = CTX
        s.block_table = list(range(i * blocks_per_seq, (i + 1) * blocks_per_seq))
        seqs.append(s)

    # warm
    runner.run(seqs, is_prefill=False, lookahead=K)
    for s in seqs:
        s.num_computed_tokens = CTX

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        runner.run(seqs, is_prefill=False, lookahead=K)
        for s in seqs:
            s.num_computed_tokens = CTX
    dt = time.perf_counter() - t0
    per_step_ms = dt / (iters * K) * 1e3
    print(f"full decode step (runner.run, K={K}): {per_step_ms:.3f} ms/step "
          f"=> {B / (per_step_ms / 1e3):.0f} tok/s")

    # --- isolate the device program (no batch prep / host sync per call) ---
    import byox_vllm_tpu.engine.batch_prep as bp
    batch = bp.prepare_decode(seqs, bs, K)
    padded = bp.pad_batch(
        batch, num_seqs=B, num_tokens=1,
        table_width=runner.table_buckets[-1],
    )
    key = jax.random.PRNGKey(0)
    dec_args = (
        runner.params, runner.kv_cache,
        jnp.asarray(padded.token_ids[:, 0]), jnp.asarray(padded.context_lens),
        jnp.asarray(padded.slot_mapping), jnp.asarray(padded.block_tables),
        jnp.asarray(padded.temperatures), key,
        (jnp.asarray(padded.top_k), jnp.asarray(padded.top_p)) if padded.top_k is not None else None,
        None,
    )
    toks, kv = runner._decode(*dec_args)
    jax.block_until_ready(toks)
    runner.kv_cache = kv
    dec_args = dec_args[:1] + (runner.kv_cache,) + dec_args[2:]
    t0 = time.perf_counter()
    for _ in range(iters):
        toks, kv = runner._decode(dec_args[0], kv, *dec_args[2:])
        jax.block_until_ready(toks)
    dt = time.perf_counter() - t0
    runner.kv_cache = kv
    per_step_ms = dt / (iters * K) * 1e3
    print(f"device multi-step decode: {per_step_ms:.3f} ms/step => {B / (per_step_ms / 1e3):.0f} tok/s")

    # --- single matmul roofline probes -----------------------------------
    from byox_vllm_tpu.ops.quant import quant_matmul, quantize_weight

    D, F = spec.hidden_size, spec.intermediate_size
    x = jnp.ones((B, 1, D), jnp.bfloat16)
    shapes = {
        "wqkv": (D, spec.qkv_size),
        "wo": (spec.q_size, D),
        "w_gate_up": (D, 2 * F),
        "w_down": (F, D),
    }
    total_ms = 0.0
    for name, (kk, mm) in shapes.items():
        if spec.quant_bits:
            w = quantize_weight(0.01 * jnp.ones((kk, mm), jnp.bfloat16), spec.quant_bits)
            f = jax.jit(lambda a, ww: quant_matmul(a.reshape(B, 1, kk), ww, spec.quant_bits))
        else:
            w = 0.01 * jnp.ones((kk, mm), jnp.bfloat16)
            f = jax.jit(lambda a, ww: a.reshape(B, 1, kk) @ ww)
        xx = jnp.ones((B, 1, kk), jnp.bfloat16)
        r = f(xx, w); jax.block_until_ready(r)
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(xx, w)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / n * 1e3
        if spec.quant_bits:
            wbytes = sum(v.nbytes for v in jax.tree.leaves(w))
        else:
            wbytes = w.nbytes
        bw = wbytes / (ms / 1e3) / 1e9
        total_ms += ms * spec.num_layers
        print(f"  {name}: {ms:.4f} ms ({wbytes/2**20:.1f} MiB, {bw:.0f} GB/s)")
    print(f"matmul-only extrapolation: {total_ms:.2f} ms/step => {B/(total_ms/1e3):.0f} tok/s")

    # --- paged attention probe --------------------------------------------
    from byox_vllm_tpu.ops.attention import paged_attention
    q = jnp.ones((B, 1, spec.num_heads, spec.head_dim), jnp.bfloat16)
    lay = runner.kv_cache[0]
    ctx = jnp.full((B,), CTX, jnp.int32)
    pos = jnp.full((B, 1), CTX - 1, jnp.int32)
    bt = jnp.asarray(padded.block_tables)
    att = jax.jit(lambda q, pool: paged_attention(
        q, pool, bt, ctx, pos, bs, spec.head_dim ** -0.5))
    r = att(q, lay[0]); jax.block_until_ready(r)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        r = att(q, lay[0])
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / n * 1e3
    kv_read = B * CTX * spec.num_kv_heads * spec.head_dim * 2 * (1 if args.kv == "int8" else 2)
    print(f"paged attention (1 layer): {ms:.4f} ms "
          f"({kv_read/2**20:.1f} MiB KV, {kv_read/(ms/1e3)/1e9:.0f} GB/s); "
          f"x{spec.num_layers} = {ms*spec.num_layers:.2f} ms/step")


if __name__ == "__main__":
    main()
