"""EAGLE feature-level speculative drafting (Li et al. 2024).

The drafter is a small decoder trunk that autoregresses in FEATURE space:
its input at slot p is fc([embed(x_p) ; f_{p-1}]) — the embedding of token p
fused with the target's post-final-norm hidden state of the prefix that
produced it — and its output feature estimates f_p, whose LM-head logits
draft token x_{p+1}. Embedding and LM head are SHARED with the target (the
standard EAGLE weight layout), so the drafter owns only the fusion matrix
and its decoder layer(s).

Slot indexing note: canonical EAGLE places the pair (f_t, e(x_{t+1})) at
slot t; here the same pair sits at slot t+1, which aligns drafter KV slots
1:1 with target positions — the scheduler's block tables apply to the
drafter pool verbatim and RoPE shifts by a constant (relative attention is
invariant to it). The reference declares Eagle as intended scope and never
ships it (README.md:10-34, nanovllm/config.py:30-49).

The drafter reuses the shared functional decoder (models/qwen3.py::forward)
via its ``inputs_embeds`` override, so paged KV, Pallas attention, and
quantization all apply to the drafter for free.
"""

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp

from byox_vllm_tpu.models.qwen3 import Qwen3Spec, forward, init_params
from byox_vllm_tpu.ops.attention import paged_attention


def draft_spec(target_spec: Qwen3Spec, num_layers: int = 1) -> Qwen3Spec:
    # trunk unquantized (it's tiny); head_bits follows the target because the
    # HEAD IS the target's (possibly int8-packed) array
    return replace(target_spec, num_layers=num_layers, quant_bits=None, act_bits=None)


def init_eagle_params(target_params: dict, target_spec: Qwen3Spec, num_layers: int = 1,
                      dtype=jnp.bfloat16, seed: int = 0) -> dict:
    """Random drafter (fc + trunk); embedding and LM head are references to
    the target's arrays, not copies."""
    dspec = draft_spec(target_spec, num_layers)
    trunk = init_params(dspec, dtype, seed=seed + 17)
    d = target_spec.hidden_size
    fc = jax.random.normal(jax.random.PRNGKey(seed + 31), (2 * d, d), dtype) * 0.02
    return {
        "embed": target_params["embed"],
        "lm_head": target_params.get("lm_head", target_params["embed"]),
        "fc": fc,
        "final_norm": trunk["final_norm"],
        "layers": trunk["layers"],
    }


def eagle_step(
    params: dict,
    kv_cache: list,
    token_ids: jnp.ndarray,  # [B, Tq]
    feats: jnp.ndarray,  # [B, Tq, D] f_{p-1} per slot (zeros where unknown)
    q_lens: jnp.ndarray,
    context_lens: jnp.ndarray,
    slot_mapping: jnp.ndarray,
    block_tables: jnp.ndarray,
    *,
    spec: Qwen3Spec,
    block_size: int,
    attention_backend: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray, list]:
    """One drafter call (ingest when Tq > 1, draft step when Tq == 1).
    Returns (greedy draft token [B], last-slot feature estimate [B, D],
    updated drafter KV)."""
    e = params["embed"][token_ids]  # [B, Tq, D] shared target embedding
    fused = jnp.concatenate([e, feats.astype(e.dtype)], axis=-1) @ params["fc"]
    (logits, h), kv_cache = forward(
        params, kv_cache, token_ids, q_lens, context_lens, slot_mapping, block_tables,
        spec, block_size,
        attention_fn=partial(paged_attention, backend=attention_backend),
        inputs_embeds=fused,
        capture_hidden=True,
    )
    if logits.shape[-1] > spec.vocab_size:  # quantized head keeps padded cols
        cols = jnp.arange(logits.shape[-1], dtype=jnp.int32)
        logits = jnp.where(cols[None, :] < spec.vocab_size, logits, -jnp.inf)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # greedy drafts
    last = jnp.take_along_axis(
        h, jnp.maximum(q_lens - 1, 0)[:, None, None], axis=1
    )[:, 0]
    return tok, last, kv_cache
