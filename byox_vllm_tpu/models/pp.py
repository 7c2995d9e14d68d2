"""Pipeline parallelism: the decoder's layer stack sharded across a 'stage'
mesh axis.

The reference has no pipeline parallelism (its model is built whole per rank,
nanovllm/engine/model_runner.py:32; SURVEY §2 marks PP optional). TPU-native
design: ONE SPMD program on a (data, stage, model) mesh — layer weights and
each layer's KV pool carry a leading [L] axis sharded over 'stage', so every
stage holds L/S layers' weights + KV. Execution is sequential hand-off:

  - stage t runs its layer group under ``lax.cond(my == t, ...)`` — the
    other stages' cores idle through the cond instead of burning redundant
    FLOPs (SPMD still compiles one program)
  - activations hop stage t -> t+1 via a single-edge ``ppermute`` (ICI/DCN
    neighbor transfer of [B, Tq, D] — the only inter-stage traffic)
  - the last stage's final hidden state is psum-broadcast (cheap: [B, Tq, D]
    bf16, NOT [B, V] logits) so EVERY stage computes the identical LM head +
    sampling — stages are idle at that point anyway, and identical sampled
    tokens on all shards mean the engine needs no pp-specific output
    handling (the multi-step decode scan feeds them straight back into
    stage 0's embedding).

This is memory-scaling PP (serve models pp x larger than one chip/host
group): there is no microbatch overlap yet, so throughput does not scale
with S — use TP for that; PP's bubble-free microbatching is future work.

``forward_pp`` is signature-compatible with models/qwen3.py::forward so the
runner's step/multi-step-decode programs work unchanged; bind num_stages via
functools.partial. KV layout differs: a tuple of stacked pools
(k [L, S_slots, F], v [L, S_slots, F][, scales]) instead of a per-layer
list — per-layer lists cannot shard across stages.
"""

import jax
import jax.numpy as jnp

from byox_vllm_tpu.models.qwen3 import (
    Qwen3Spec,
    _finalize,
    _slice_layer,
    decoder_layer,
)
from byox_vllm_tpu.ops.attention import paged_attention
from byox_vllm_tpu.ops.rope import rope_cos_sin, rope_inv_freq

STAGE_AXIS = "stage"


def make_kv_cache_stacked(spec: Qwen3Spec, num_slots: int, dtype=jnp.bfloat16, tp: int = 1):
    """Stacked KV pools (k, v[, scales]) with a leading [L] layer axis —
    the stage-shardable layout."""
    from byox_vllm_tpu.models.qwen3 import make_kv_cache

    per_layer = make_kv_cache(spec, num_slots, dtype, tp=tp)
    n = len(per_layer[0])
    return tuple(jnp.stack([lay[t] for lay in per_layer]) for t in range(n))


def forward_pp(
    params: dict,
    kv_cache,  # tuple of stacked pools, each [L_local, S_slots, ...] in-shard
    token_ids: jnp.ndarray,
    q_lens: jnp.ndarray,
    context_lens: jnp.ndarray,
    slot_mapping: jnp.ndarray,
    block_tables: jnp.ndarray,
    spec: Qwen3Spec,  # LOCAL spec: num_layers == layers per stage
    block_size: int,
    attention_fn=None,
    all_logits: bool = False,
    write_runs=None,
    decode_tails=None,
    tail_index=None,
    attention_backend: str = "auto",
    fused_store: bool = False,
    tp_axis: str | None = None,
    inputs_embeds=None,
    capture_hidden: bool = False,
    *,
    num_stages: int,
    stage_axis: str = STAGE_AXIS,
):
    """Pipeline-parallel model step. Runs inside shard_map over
    (data, stage[, model])."""
    assert decode_tails is None and not fused_store and inputs_embeds is None, (
        "pp supports the standard store path only"
    )
    # per-layer window gating needs static global layer indices, which a
    # stage-generic program doesn't have; uniform windows (Mistral) are fine
    assert spec.sliding_window is None or spec.first_window_layer == 0

    b, tq = token_ids.shape
    positions = (context_lens - q_lens)[:, None] + jnp.arange(tq, dtype=jnp.int32)[None, :]
    if tp_axis is not None:
        vloc = params["embed"].shape[0]
        local_ids = token_ids - jax.lax.axis_index(tp_axis) * vloc
        ok = (local_ids >= 0) & (local_ids < vloc)
        h = params["embed"][jnp.clip(local_ids, 0, vloc - 1)]
        h = jax.lax.psum(h * ok[..., None].astype(h.dtype), tp_axis)
    else:
        h = params["embed"][token_ids]
    inv_freq = rope_inv_freq(spec.head_dim, spec.rope_theta)
    cos, sin = rope_cos_sin(positions, inv_freq)
    flat_slots = slot_mapping.reshape(-1)
    scale = spec.head_dim**-0.5
    attend = attention_fn or paged_attention
    layers = params["layers"]
    my = jax.lax.axis_index(stage_axis)

    def run_stage(op):
        x, kvs = op
        for j in range(spec.num_layers):  # local layers, static unroll
            lp = {name: _slice_layer(w, j) for name, w in layers.items()}
            kv_j = tuple(p[j] for p in kvs)
            x, kv_new = decoder_layer(
                x, lp, kv_j,
                spec=spec, block_size=block_size, positions=positions,
                cos=cos, sin=sin, flat_slots=flat_slots, scale=scale,
                attend=attend, context_lens=context_lens,
                block_tables=block_tables, layer_window=spec.sliding_window,
                write_runs=write_runs, tp_axis=tp_axis,
                attention_backend=attention_backend,
            )
            kvs = tuple(p.at[j].set(n) for p, n in zip(kvs, kv_new))
        return x, kvs

    kvs = kv_cache
    for t in range(num_stages):
        h, kvs = jax.lax.cond(my == t, run_stage, lambda op: op, (h, kvs))
        if t < num_stages - 1:
            # hand the activations to the next stage (single ICI edge);
            # shards not targeted receive zeros, which only stage t+1 reads
            h = jax.lax.ppermute(h, stage_axis, [(t, t + 1)])

    # broadcast the last stage's final hidden: every stage then computes the
    # identical head + sampling (they are idle here anyway), so outputs are
    # stage-uniform and the engine needs no pp-specific handling
    h = jax.lax.psum(jnp.where(my == num_stages - 1, h, jnp.zeros_like(h)), stage_axis)
    return _finalize(h, params, spec, q_lens, tp_axis, all_logits, capture_hidden), kvs
