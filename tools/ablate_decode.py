"""Ablate the multi-step decode program to locate device-time hotspots.

Each variant compiles a K-iteration scan like the engine's _multi_decode_step
and is timed over fresh inputs (the tunnel caches identical dispatches, so
token ids vary per call). With K large, wall ~= device time.

Variants: full | noattn | nokv | nohead | v1 | dense | nosample
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/byox_vllm_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import QWEN3_0_6B, QWEN3_8B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=["full", "noattn", "nokv", "nohead", "v1", "dense"])
    ap.add_argument("--model", default="0.6b")
    ap.add_argument("--quant", default="none")
    ap.add_argument("--kv", default="auto")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=120)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--block", type=int, default=64)
    args = ap.parse_args()

    from transformers import PretrainedConfig

    from byox_vllm_tpu.models.qwen3 import (
        Qwen3Spec, forward, init_params, make_kv_cache,
    )
    from byox_vllm_tpu.ops.attention import paged_attention
    from byox_vllm_tpu.ops.sampler import sample_tokens

    hf = PretrainedConfig(**(QWEN3_8B if args.model == "8b" else QWEN3_0_6B))
    spec = Qwen3Spec.from_hf_config(hf, qk_norm=True)
    if args.quant != "none":
        from dataclasses import replace
        bits = {"int8": 8, "int4": 4, "w4a8": 4}[args.quant]
        spec = replace(
            spec, quant_bits=bits, act_bits=8 if args.quant == "w4a8" else None
        )
    B, CTX, K, BS = args.batch, args.ctx, args.steps, args.block
    pages = -(-(CTX + K) // BS)
    num_slots = B * pages * BS
    # the quantized random init costs ~25 min of host numpy at 8B scale:
    # cache the built tree on disk keyed by (model, quant)
    import pickle

    from byox_vllm_tpu.ops.quant import fold_enabled

    layout = "_folded" if fold_enabled(spec.act_bits) else ""
    cache = f"/tmp/ablate_params_{args.model}_{args.quant}{layout}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            host_tree = pickle.load(fh)
        params = jax.tree.map(jnp.asarray, host_tree)
    else:
        params = init_params(spec, jnp.bfloat16, seed=0)
        host_tree = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), params)
        with open(cache, "wb") as fh:
            pickle.dump(host_tree, fh, protocol=4)
    # quantized init generates embed/lm_head on the CPU *device* (committed):
    # left there, every jitted call re-transfers them through the tunnel
    # (~2 GB/call — measured 1.8 s/step of pure transfer). Pin to the chip.
    params = jax.device_put(params, jax.devices()[0])
    # mirror the ENGINE's serving config (otherwise this tool overstates the
    # matmul term): (a) int8 LM head — config.quantize_lm_head default; the
    # bf16 head streams 1.2 GB/step extra at 8B; (b) per-layer UNSTACKED
    # weights — stacked slices feeding Pallas custom-calls are copied every
    # step, tripling weight traffic (models/qwen3.py::unstack_layer_params)
    if args.quant != "none" and not spec.tie_word_embeddings:
        from dataclasses import replace as _replace

        from byox_vllm_tpu.models.qwen3 import quantize_head, unstack_layer_params

        if not isinstance(params.get("lm_head"), dict):
            params["lm_head"] = quantize_head(params["lm_head"], 8, on_device=True)
        spec = _replace(spec, head_bits=8)
        params["layers"] = unstack_layer_params(params["layers"], spec.num_layers)
    kv_dtype = jnp.int8 if args.kv == "int8" else jnp.bfloat16
    kv = make_kv_cache(spec, num_slots, kv_dtype)
    tables = jnp.asarray(
        np.arange(B * pages, dtype=np.int32).reshape(B, pages)
    )
    ctx0 = jnp.full((B,), CTX, jnp.int32)
    temps = jnp.full((B,), 0.6, jnp.float32)
    slot_base = np.arange(B, dtype=np.int32) * pages * BS + CTX
    slots = jnp.asarray(slot_base[:, None] + np.arange(K, dtype=np.int32)[None, :])

    def make_step(variant):
        attn_backend = "auto"
        if variant == "v1":
            os.environ["BYOX_DECODE_KERNEL"] = "v1"
        else:
            os.environ.pop("BYOX_DECODE_KERNEL", None)
        if variant == "dense":
            attn_backend = "dense"

        if variant == "noattn":
            def attend(q, pool, bt, cl, pos, bs, scale, window=None):
                return q  # skip attention entirely
        elif variant == "nokv":
            # attention over the pool but no KV writes: monkeypatched below
            attend = partial(paged_attention, backend=attn_backend)
        else:
            attend = partial(paged_attention, backend=attn_backend)

        def body(params_, carry, xs):
            tokens, kv = carry
            step_idx, slots_k = xs
            logits, kv = forward(
                params_, kv, tokens[:, None], jnp.ones_like(ctx0), ctx0 + step_idx,
                slots_k[:, None], tables, spec, BS, attention_fn=attend,
            )
            if variant == "nohead":
                next_tokens = tokens  # logits unused; keep feeding same token
            elif variant == "nosample":
                next_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                next_tokens = sample_tokens(
                    logits, temps, jax.random.fold_in(jax.random.PRNGKey(0), step_idx)
                )
            return (next_tokens, kv), next_tokens

        def run(params_, last_tokens, kv):
            xs = (jnp.arange(K, dtype=jnp.int32), slots.T)
            (_, kv), toks = jax.lax.scan(partial(body, params_), (last_tokens, kv), xs)
            return toks.T, kv

        return jax.jit(run, donate_argnums=(2,))

    if "nohead" in args.variants and "full" not in args.variants:
        pass

    for variant in args.variants:
        if variant == "nokv":
            import byox_vllm_tpu.models.qwen3 as q3
            orig_write = q3.write_kv
            orig_write_q = q3.write_kv_quant
            q3.write_kv = lambda pool, k, v, s: pool
            q3.write_kv_quant = lambda pool, k, v, s: pool
        step = make_step(variant)
        toks = jnp.asarray(np.random.randint(0, 1000, B).astype(np.int32))
        out, kv = step(params, toks, kv)
        _ = jax.device_get(out)  # true sync; surfaces async dispatch errors
        times = []
        for it in range(3):
            t_in = jnp.asarray(np.random.randint(0, 1000, B).astype(np.int32))
            t0 = time.perf_counter()
            out, kv = step(params, t_in, kv)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        _ = jax.device_get(out)
        ms = min(times) / K * 1e3
        if ms < 0.5:  # 8B at B=128 cannot run faster than ~5 ms/step
            print(f"{variant:8s}: IMPLAUSIBLE {ms:.3f} ms/step — dispatch "
                  "did not execute (async failure or non-blocking sync?)",
                  flush=True)
        print(
            f"{variant:8s}: {min(times)*1e3:8.1f} ms / {K} steps = {ms:6.2f} ms/step "
            f"=> {B/(ms/1e3):7.0f} tok/s",
            flush=True,
        )
        if variant == "nokv":
            q3.write_kv = orig_write
            q3.write_kv_quant = orig_write_q


if __name__ == "__main__":
    main()
