"""Pipeline parallelism: the decoder's layer stack sharded across a 'stage'
mesh axis, with GPipe-style microbatch overlap.

The reference has no pipeline parallelism (its model is built whole per rank,
nanovllm/engine/model_runner.py:32; SURVEY §2 marks PP optional). TPU-native
design: ONE SPMD program on a (data, stage, model) mesh.

Weight / KV layout (copy-free stage sharding)
  Layer parameters and KV pools are STAGE-GROUPED: for each of the L/S local
  layer indices j there is a separate array of shape [S, ...] whose entry s
  is global layer s*(L/S)+j, sharded P('stage', ...). Inside shard_map each
  shard's block is [1, ...] and the ``[0]`` squeeze is a whole-buffer
  reshape, so Pallas custom-calls (quantized matmul, attention) consume the
  weight buffer DIRECTLY. The previous layout — one stacked [L, ...] array
  sliced per layer — materialized a full copy of every sliced operand each
  step (the 3x quantized-weight-traffic pathology documented at
  models/qwen3.py::unstack_layer_params), which made PP + quantization slow
  by construction.

Schedule (microbatched, bubble-amortized)
  The batch splits into M microbatches (``num_microbatches``, default = S).
  One step runs S + M - 1 ticks; at tick t, stage s processes microbatch
  t - s (when 0 <= t-s < M), so in steady state EVERY stage computes — the
  bubble fraction is (S-1)/(S+M-1) instead of the (S-1)/S of sequential
  hand-off. Mechanics, all inside one shard_map program:

  - the pipeline register x holds each stage's current activation
    [B/M, Tq, D]; ticks hand it to the next stage via single-edge
    ``ppermute``
  - stage 0 ingests microbatch t's embeddings at tick t (static index);
    other stages read the register
  - per-tick attention metadata is dynamically indexed by each stage's own
    microbatch number (a traced ``axis_index``-derived scalar)
  - invalid (bubble) ticks still execute the stage compute — predicating it
    would serialize on control flow — but their KV writes are masked to
    slot -1 (dropped) and their outputs feed only other invalid ticks
  - the last stage collects microbatch outputs into an [M, B/M, Tq, D]
    buffer (static index: t - (S-1)); a final psum broadcasts it so every
    stage computes the identical LM head + sampling and the engine needs no
    pp-specific output handling.

``forward_pp`` is signature-compatible with models/qwen3.py::forward so the
runner's step/multi-step-decode programs work unchanged; bind num_stages /
num_microbatches via functools.partial.
"""

import jax
import jax.numpy as jnp

from byox_vllm_tpu.models.qwen3 import (
    Qwen3Spec,
    _finalize,
    decoder_layer,
)
from byox_vllm_tpu.ops.attention import paged_attention
from byox_vllm_tpu.ops.rope import rope_cos_sin, rope_inv_freq

STAGE_AXIS = "stage"


def regroup_layers_pp(layer_params: dict, num_layers: int, num_stages: int) -> dict:
    """Stacked [L, ...] layer leaves -> per-LOCAL-layer lists of
    stage-grouped [S, ...] arrays (entry s = global layer s*(L/S)+j), the
    copy-free pp layout (module docstring). Quantized {q, s} dicts become
    dicts of lists, mirroring the pp=1 unstacked convention."""
    l_loc = num_layers // num_stages

    def group(x):
        return [
            jnp.stack([x[s * l_loc + j] for s in range(num_stages)])
            for j in range(l_loc)
        ]

    out = {}
    for name, w in layer_params.items():
        if isinstance(w, dict):
            out[name] = {leaf: group(v) for leaf, v in w.items()}
        else:
            out[name] = group(w)
    return out


def make_kv_cache_pp(
    spec: Qwen3Spec, num_slots: int, dtype=jnp.bfloat16, num_stages: int = 1, tp: int = 1
):
    """Stage-grouped KV pools: a list over local layer indices j of tuples
    (k [S, slots, F], v [S, slots, F][, scales]) sharded P('stage', ...)."""
    from byox_vllm_tpu.models.qwen3 import make_kv_cache

    per_layer = make_kv_cache(spec, num_slots, dtype, tp=tp)
    l_loc = spec.num_layers // num_stages
    n = len(per_layer[0])
    return [
        tuple(
            jnp.stack([per_layer[s * l_loc + j][t] for s in range(num_stages)])
            for t in range(n)
        )
        for j in range(l_loc)
    ]


def forward_pp(
    params: dict,
    kv_cache,  # list per local layer of tuples of [1, S_slots, ...] in-shard
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
    tp_axis: str | None = None,
    inputs_embeds=None,
    capture_hidden: bool = False,
    *,
    num_stages: int,
    num_microbatches: int | None = None,
    stage_axis: str = STAGE_AXIS,
):
    """Pipeline-parallel model step (microbatched — module docstring). Runs
    inside shard_map over (data, stage[, model])."""
    assert decode_tails is None and inputs_embeds is None, (
        "pp supports the standard store path only"
    )
    assert write_runs is None, (
        "pp uses the scatter KV store (run-DUS src rows index the whole "
        "batch; microbatches slice it)"
    )
    # per-layer window gating needs static global layer indices, which a
    # stage-generic program doesn't have; uniform windows (Mistral) are fine
    assert spec.sliding_window is None or spec.first_window_layer == 0

    S = num_stages
    M = num_microbatches or S
    b, tq = token_ids.shape
    assert b % M == 0, (b, M)
    mb = b // M

    if tp_axis is not None:
        vloc = params["embed"].shape[0]
        local_ids = token_ids - jax.lax.axis_index(tp_axis) * vloc
        ok = (local_ids >= 0) & (local_ids < vloc)
        h = params["embed"][jnp.clip(local_ids, 0, vloc - 1)]
        h = jax.lax.psum(h * ok[..., None].astype(h.dtype), tp_axis)
    else:
        h = params["embed"][token_ids]
    d = h.shape[-1]
    inv_freq = rope_inv_freq(spec.head_dim, spec.rope_theta)
    scale = spec.head_dim**-0.5
    attend = attention_fn or paged_attention
    layers = params["layers"]
    my = jax.lax.axis_index(stage_axis)

    def split(x):  # [B, ...] -> [M, B/M, ...]
        return x.reshape(M, mb, *x.shape[1:])

    H = split(h)
    QL, CTX = split(q_lens), split(context_lens)
    SLOTS, BT = split(slot_mapping), split(block_tables)

    def run_stage(x, ql, ctx, slots, bt, kvs):
        positions = (ctx - ql)[:, None] + jnp.arange(tq, dtype=jnp.int32)[None, :]
        cos, sin = rope_cos_sin(positions, inv_freq)
        flat_slots = slots.reshape(-1)
        new_kvs = []
        for j in range(spec.num_layers):  # local layers, static unroll
            # [1, ...] -> [...]: whole-buffer squeeze, no slice copy
            lp = {
                name: ({leaf: v[j][0] for leaf, v in w.items()}
                       if isinstance(w, dict) else w[j][0])
                for name, w in layers.items()
            }
            kv_j = tuple(p[0] for p in kvs[j])
            x, kv_new = decoder_layer(
                x, lp, kv_j,
                spec=spec, block_size=block_size, positions=positions,
                cos=cos, sin=sin, flat_slots=flat_slots, scale=scale,
                attend=attend, context_lens=ctx,
                block_tables=bt, layer_window=spec.sliding_window,
                write_runs=None, tp_axis=tp_axis,
                attention_backend=attention_backend,
            )
            new_kvs.append(tuple(n[None] for n in kv_new))
        return x, new_kvs

    kvs = list(kv_cache)
    x = jnp.zeros((mb, tq, d), h.dtype)  # pipeline register
    out = jnp.zeros((M, mb, tq, d), h.dtype)
    neighbors = [(s, s + 1) for s in range(S - 1)]

    for t in range(S + M - 1):
        m = t - my  # this stage's microbatch number (traced)
        valid = (m >= 0) & (m < M)
        mc = jnp.clip(m, 0, M - 1)
        # stage 0 ingests fresh embeddings (static index); others use the
        # register handed off by the previous stage
        if t < M:
            x_in = jnp.where(my == 0, H[t], x)
        else:
            x_in = x
        ql = jax.lax.dynamic_index_in_dim(QL, mc, 0, keepdims=False)
        ctx = jax.lax.dynamic_index_in_dim(CTX, mc, 0, keepdims=False)
        slots = jax.lax.dynamic_index_in_dim(SLOTS, mc, 0, keepdims=False)
        bt = jax.lax.dynamic_index_in_dim(BT, mc, 0, keepdims=False)
        # bubble ticks run the compute (no control flow) but never write KV
        slots = jnp.where(valid, slots, -1)
        y, kvs = run_stage(x_in, ql, ctx, slots, bt, kvs)
        done = t - (S - 1)  # microbatch the LAST stage just finished (static)
        if 0 <= done < M:
            out = jnp.where(my == S - 1, out.at[done].set(y), out)
        if S > 1 and t < S + M - 2:
            x = jax.lax.ppermute(y, stage_axis, neighbors)

    # broadcast the collected outputs: every stage then computes the
    # identical head + sampling (they are idle here anyway), so outputs are
    # stage-uniform and the engine needs no pp-specific handling
    out = jax.lax.psum(jnp.where(my == S - 1, out, jnp.zeros_like(out)), stage_axis)
    h = out.reshape(b, tq, d)
    return _finalize(h, params, spec, q_lens, tp_axis, all_logits, capture_hidden), kvs
