"""Qwen3 dense decoder — TPU-native functional implementation.

Capability parity with the reference model (nanovllm/models/qwen3.py:14-208):
GQA attention with per-head q/k RMSNorm, half-split RoPE, SiLU-gated MLP,
RMSNorm pre-norm residual structure, tied embeddings. Architecture differs
deliberately:

- pure functions over an explicit parameter pytree (no modules); the whole
  forward lives inside one ``jax.jit``: XLA fuses what the reference needed
  torch.compile decorators + CUDA graphs for
- layer weights are stacked along a leading [L, ...] axis (uniform loading
  and sharding); the forward unrolls the layer loop statically so each
  layer's KV-pool scatter stays an in-place HBM update (see forward())
- QKV and gate/up projections are fused at load time (the reference fuses
  them via weight_loader shard copies, nanovllm/layers/linear.py:73-123)
- attention metadata arrives as an explicit pytree argument, not via the
  Context thread-global (nanovllm/utils/context.py)
- KV cache is a paged slot pool threaded through the step function and
  donated, not module attributes.
"""

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from byox_vllm_tpu.ops.attention import paged_attention
from byox_vllm_tpu.ops.kv_cache import write_kv, write_kv_quant, write_kv_runs
from byox_vllm_tpu.ops.norms import rms_norm
from byox_vllm_tpu.ops.quant import (
    fold_enabled, quant_matmul, quantize_weight, quantize_weight_folded,
)
from byox_vllm_tpu.ops.rope import apply_rope, rope_cos_sin, rope_inv_freq

QUANTIZED_LAYER_WEIGHTS = ("wqkv", "wo", "w_gate_up", "w_down")


def _linear(x, w, quant_bits, act_bits=None):
    """x [..., K] @ w — w is either a dense [K, M] array or a quantized
    {"q", "s"} pytree (fused dequant-matmul on TPU; W4A8 when act_bits=8)."""
    if isinstance(w, dict):
        return quant_matmul(x, w, quant_bits, act_bits=act_bits)
    return jnp.einsum("btd,df->btf", x, w, preferred_element_type=x.dtype)


def _moe_mlp(x: jnp.ndarray, lp: dict, spec: "Qwen3Spec", tp_axis: str | None = None) -> jnp.ndarray:
    """Routed top-k mixture-of-experts MLP (Qwen3-MoE semantics: fp32 softmax
    routing, optional top-k renormalization, SiLU-gated experts).

    TPU-shaped dispatch: token->expert assignments are SORTED by expert id
    (jnp stable argsort) and both expert matmuls run as ONE grouped
    ``jax.lax.ragged_dot`` over the contiguous per-expert segments — the MXU
    sees E dense matmuls back to back with no one-hot blowup and no
    [N, E, ...] materialization; the weighted scatter-add restores token
    order. (Reference scope: none — nano-vLLM is dense-only; this follows
    the MaxText/megablocks grouped-matmul pattern.)

    Expert parallelism (tp_axis set, experts sharded on 'model'): routing is
    computed identically on every shard (the router is replicated), each
    shard runs the grouped matmuls over ITS E/tp experts with non-local
    assignments weight-masked to zero, and the caller's MLP psum merges the
    shards' contributions — experts stream from HBM once across the mesh
    (weight traffic is the decode bottleneck; the redundant N*K row FLOPs
    are noise at serving batch sizes)."""
    b, t, d = x.shape
    e, k = spec.num_experts, spec.num_experts_per_tok  # e = LOCAL expert count
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    router = lp["router"]
    logits = jnp.einsum("nd,de->ne", xf.astype(jnp.float32), router.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    topw, topi = jax.lax.top_k(probs, k)  # [N, K] over the GLOBAL expert space
    if spec.norm_topk_prob:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    if tp_axis is not None and router.shape[-1] != e:
        lo = jax.lax.axis_index(tp_axis) * e
        local = (topi >= lo) & (topi < lo + e)
        topi = jnp.where(local, topi - lo, 0)
        topw = jnp.where(local, topw, 0.0)

    flat_expert = topi.reshape(-1)  # [N*K]
    flat_tok = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    order = jnp.argsort(flat_expert)  # stable: ties keep token order
    sort_tok = flat_tok[order]
    xs = xf[sort_tok]  # [N*K, D] grouped by expert
    group_sizes = jnp.bincount(flat_expert, length=e).astype(jnp.int32)

    gu = jax.lax.ragged_dot(xs, lp["moe_gate_up"], group_sizes)  # [N*K, 2*Fm]
    gate, up = jnp.split(gu, 2, axis=-1)
    y = jax.nn.silu(gate) * up
    out = jax.lax.ragged_dot(y, lp["moe_down"], group_sizes)  # [N*K, D]

    w_sorted = topw.reshape(-1)[order].astype(out.dtype)
    mixed = jnp.zeros((n, d), out.dtype).at[sort_tok].add(out * w_sorted[:, None])
    return mixed.reshape(b, t, d).astype(x.dtype)


def _slice_layer(w, i):
    if isinstance(w, dict):
        return {k: v[i] for k, v in w.items()}
    return w[i]


def quantize_layer_params(
    layer_params: dict, bits: int, group: int | None = None, fold: bool = False
) -> dict:
    """Quantize the four big per-layer matmul weights (stacked [L, K, M]);
    norms/bias stay dense. TP-agnostic: serving-time scale-row sharding is
    handled by exact group refinement (parallel/tp.py::tp_refine_layer_scales).
    ``group`` threads config.quant_group so checkpoint loads honor the same
    knob as random init (ADVICE r4: it was silently dropped here).
    ``fold``: folded-scale packs for the int8-MXU kernels (ops/quant.py)."""
    quant = quantize_weight_folded if fold else quantize_weight
    out = dict(layer_params)
    for name in QUANTIZED_LAYER_WEIGHTS:
        if name in layer_params:  # MoE layers have no dense w_gate_up/w_down
            out[name] = quant(layer_params[name], bits, group=group)
    return out


def quantize_head(
    lm_head, bits: int, on_device: bool = False, group: int | None = None,
    fold: bool = False,
) -> dict:
    """lm_head [V, D] float -> {"q": int8 [D, V_pad], "s": f32 [D/G, V_pad]}
    stored pre-transposed for the fused dequant-matmul (x [N, D] @ W [D, V]).
    V is padded up to a multiple of 1024 so the qmm kernel can tile the
    output dim (151936 = 1187 * 128 would force 128-wide tiles); the forward
    slices logits back to the real vocab. ``on_device``: pad/transpose/
    quantize on the accelerator (random init) instead of host numpy.
    ``fold``: per-channel {"q", "S"} pack for the folded W8A8 head kernel."""
    quant = quantize_weight_folded if fold else quantize_weight
    v, d = lm_head.shape
    v_pad = -(-v // 1024) * 1024
    if on_device:
        w = jnp.zeros((d, v_pad), jnp.float32)
        w = jax.lax.dynamic_update_slice(w, lm_head.astype(jnp.float32).T, (0, 0))
        return quant(w, bits=bits, group=group, on_device=True)
    import numpy as np

    w = np.zeros((d, v_pad), np.float32)
    w[:, :v] = np.asarray(jax.device_get(lm_head)).astype(np.float32).T
    return quant(w, bits=bits, group=group)


def unstack_layer_params(layer_params: dict, num_layers: int) -> dict:
    """Stacked [L, ...] layer leaves -> per-layer LISTS of device arrays.

    Inside jit, slicing a stacked array that feeds a Pallas custom-call
    materializes a full copy of the layer's weights every step (custom-call
    operands can't alias a slice), tripling HBM weight traffic — measured
    6.8 us vs 0.6 us per VMEM-resident quantized matmul. Einsum fuses the
    slice for free, so only quantized weights strictly need this, but lists
    are never worse: do it for all leaves. One jitted call slices everything
    on-device (eager per-leaf slicing costs a tunnel round trip each).
    ``_slice_layer`` indexes lists and stacked arrays identically, so
    ``forward`` accepts both layouts."""

    def unstack(tree):
        return jax.tree.map(lambda x: [x[i] for i in range(num_layers)], tree)

    return jax.jit(unstack)(layer_params)


@dataclass(frozen=True)
class Qwen3Spec:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rms_norm_eps: float
    rope_theta: float
    tie_word_embeddings: bool
    attention_bias: bool
    qk_norm: bool  # per-head q/k RMSNorm (Qwen3: yes; Qwen2/Llama: no)
    max_position_embeddings: int
    quant_bits: int | None = None  # weight-only quantization: None | 8 | 4
    quant_group: int | None = None  # scale group size (None = 128)
    act_bits: int | None = None  # 8 = W4A8: int8 activations on the int8 MXU
    # LM head quantization (untied heads only). Always int8 even for int4
    # body weights: the head is the single largest matrix (V x D, 1.2 GB
    # bf16 on 8B) and streams fully every decode step, but it is also the
    # most quality-sensitive matmul — int8 halves its traffic at ~0 ppl cost.
    head_bits: int | None = None
    # Mixture-of-experts (Qwen3-MoE family): every layer's MLP is a routed
    # top-k expert block. None = dense model.
    num_experts: int | None = None
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = True
    # Sliding-window attention (Mistral; Qwen2 when use_sliding_window):
    # each query attends to at most the last `sliding_window` positions.
    # Layers below `first_window_layer` use FULL attention (HF Qwen2
    # semantics: only layers >= max_window_layers are windowed).
    sliding_window: int | None = None
    first_window_layer: int = 0

    @classmethod
    def from_hf_config(cls, hf, qk_norm: bool = True, attention_bias: bool | None = None) -> "Qwen3Spec":
        """``attention_bias=None`` reads the HF config attribute (Qwen3/Llama
        expose it); Qwen2's qkv bias is unconditional in the HF architecture
        and its config has NO such attribute, so that family passes True."""
        get = lambda name, default=None: getattr(hf, name, default)
        num_heads = hf.num_attention_heads
        if attention_bias is None:
            attention_bias = get("attention_bias", False)
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size,
            num_layers=hf.num_hidden_layers,
            num_heads=num_heads,
            num_kv_heads=get("num_key_value_heads", num_heads),
            head_dim=get("head_dim", None) or hf.hidden_size // num_heads,
            rms_norm_eps=get("rms_norm_eps", 1e-6),
            rope_theta=get("rope_theta", 1000000.0),
            tie_word_embeddings=get("tie_word_embeddings", False),
            attention_bias=attention_bias,
            qk_norm=qk_norm,
            max_position_embeddings=get("max_position_embeddings", 40960),
            # MoE fields exist only on sparse configs (qwen3_moe). Dense
            # layers interleaved via decoder_sparse_step/mlp_only_layers are
            # not supported (Qwen3-MoE ships all-sparse by default).
            num_experts=get("num_experts", None),
            num_experts_per_tok=get("num_experts_per_tok", 0) or 0,
            moe_intermediate_size=get("moe_intermediate_size", 0) or 0,
            norm_topk_prob=bool(get("norm_topk_prob", True)),
            # Mistral: sliding_window set directly; Qwen2 gates it behind
            # use_sliding_window (False on the released checkpoints)
            sliding_window=(
                get("sliding_window", None)
                if get("use_sliding_window", True) is not False
                else None
            ),
            first_window_layer=get("max_window_layers", 0) or 0,
        )

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def qkv_size(self) -> int:
        return self.q_size + 2 * self.kv_size


def init_params(spec: Qwen3Spec, dtype=jnp.bfloat16, seed: int = 0) -> dict:
    """Random-initialized parameter pytree (for benchmarks / tests without a
    checkpoint). Layout matches utils/loader.py output exactly. Generated
    on-device with jax.random (a host numpy init of a 0.6B model costs ~70s;
    this takes well under a second)."""
    key = jax.random.PRNGKey(seed)
    counter = [0]
    L, D, F = spec.num_layers, spec.hidden_size, spec.intermediate_size
    quantizing = spec.quant_bits is not None

    def w(*shape, scale=0.02):
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        return scale * jax.random.normal(k, shape, dtype=dtype)

    def wq(*shape, scale=0.02):
        """Stacked [L, ..., K, M] weight, quantized. Generated and quantized
        ON the accelerator one layer at a time: the transient full-precision
        tensor is a single layer (hundreds of MB), never the whole stack
        (which would OOM the chip), and the generation itself runs at device
        speed (jax.random.normal of one stacked 8B weight takes ~8 min on a
        2-vCPU host CPU backend — the whole tree close to an hour)."""
        if not quantizing:
            return w(*shape, scale=scale)
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        quant = (
            quantize_weight_folded if fold_enabled(spec.act_bits) else quantize_weight
        )
        per_layer = []
        for layer in range(shape[0]):
            x = scale * jax.random.normal(
                jax.random.fold_in(k, layer), shape[1:], dtype=dtype
            )
            per_layer.append(
                quant(x, spec.quant_bits, group=spec.quant_group, on_device=True)
            )
        return {
            leaf: jnp.stack([p[leaf] for p in per_layer]) for leaf in per_layer[0]
        }

    def ones(*shape):
        return jnp.ones(shape, dtype=dtype)

    layer_params = {
        "attn_norm": ones(L, D),
        "wqkv": wq(L, D, spec.qkv_size),
        "wo": wq(L, spec.q_size, D),
        "mlp_norm": ones(L, D),
    }
    if spec.num_experts:
        E, Fm = spec.num_experts, spec.moe_intermediate_size
        layer_params["router"] = w(L, D, E)
        layer_params["moe_gate_up"] = w(L, E, D, 2 * Fm)
        layer_params["moe_down"] = w(L, E, Fm, D)
    else:
        layer_params["w_gate_up"] = wq(L, D, 2 * F)
        layer_params["w_down"] = wq(L, F, D)
    if spec.qk_norm:
        layer_params["q_norm"] = ones(L, spec.head_dim)
        layer_params["k_norm"] = ones(L, spec.head_dim)
    params = {
        "embed": w(spec.vocab_size, D),
        "final_norm": ones(D),
        "layers": layer_params,
    }
    if spec.attention_bias:
        params["layers"]["bqkv"] = jnp.zeros((L, spec.qkv_size), dtype=dtype)
    if not spec.tie_word_embeddings:
        params["lm_head"] = w(spec.vocab_size, D)
    # matmul weights were generated pre-quantized by wq(); only the head is left
    if spec.head_bits is not None and not spec.tie_word_embeddings:
        params["lm_head"] = quantize_head(
            params["lm_head"], spec.head_bits, on_device=True,
            fold=fold_enabled(spec.act_bits),
        )
    return params


def decoder_layer(
    h: jnp.ndarray,  # [B, Tq, D]
    lp: dict,  # this layer's parameters
    kv_layer,  # (k_pool, v_pool[, kv_scale]) for this layer
    *,
    spec: "Qwen3Spec",
    block_size: int,
    positions, cos, sin, flat_slots, scale, attend, context_lens, block_tables,
    layer_window: int | None = None,
    decode_tail=None,
    tail_index=None,
    write_runs=None,
    tp_axis: str | None = None,
    attention_backend: str = "auto",
):
    """One decoder layer: pre-norm attention (paged KV write + read in one of
    three store modes) then pre-norm MLP (dense SiLU or routed MoE). Factored
    out of ``forward`` so pipeline parallelism (models/pp.py) runs a stage's
    layer group through the identical code. Returns (h, new_kv_layer)."""
    b, tq = h.shape[:2]
    x = rms_norm(h, lp["attn_norm"], spec.rms_norm_eps)
    qkv = _linear(x, lp["wqkv"], spec.quant_bits, spec.act_bits)
    if "bqkv" in lp:
        qkv = qkv + lp["bqkv"]
    q, k, v = jnp.split(qkv, [spec.q_size, spec.q_size + spec.kv_size], axis=-1)
    q = q.reshape(b, tq, spec.num_heads, spec.head_dim)
    k = k.reshape(b, tq, spec.num_kv_heads, spec.head_dim)
    v = v.reshape(b, tq, spec.num_kv_heads, spec.head_dim)
    if spec.qk_norm:
        q = rms_norm(q, lp["q_norm"], spec.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], spec.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    k_flat = k.reshape(-1, spec.num_kv_heads, spec.head_dim)
    v_flat = v.reshape(-1, spec.num_kv_heads, spec.head_dim)
    if decode_tail is not None:
        # window-staged decode (Tq == 1): new K/V go to the bf16 tail
        # buffer, the pool stays read-only; the scatter happens once per
        # window in the caller (engine/model_runner._multi_decode_step)
        from byox_vllm_tpu.ops.attention import decode_attention_with_tail

        k_tail, v_tail = decode_tail
        k_tail = jax.lax.dynamic_update_slice(
            k_tail, k_flat[:, None].astype(k_tail.dtype), (0, tail_index, 0, 0)
        )
        v_tail = jax.lax.dynamic_update_slice(
            v_tail, v_flat[:, None].astype(v_tail.dtype), (0, tail_index, 0, 0)
        )
        new_kv_layer = (k_tail, v_tail)
        # pool holds exactly the pre-window tokens: context_lens counts
        # prefix + tail_index + 1 (the current token rides the tail)
        pool_ctx = context_lens - tail_index - 1
        o = decode_attention_with_tail(
            q[:, 0], kv_layer[0], block_tables, pool_ctx,
            k_tail, v_tail, tail_index, block_size, scale,
            backend=attention_backend,
            window=layer_window,
        )[:, None]
    else:
        pool = kv_layer[0]  # merged [S, 2F(+256)] — see ops/kv_cache.py
        if write_runs is not None:
            pool = write_kv_runs(
                pool, k_flat, v_flat, write_runs[0], write_runs[1], block_size
            )
        elif pool.dtype == jnp.int8:
            pool = write_kv_quant(pool, k_flat, v_flat, flat_slots)
        else:
            pool = write_kv(pool, k_flat, v_flat, flat_slots)
        new_kv_layer = (pool,)
        o = attend(
            q, pool, block_tables, context_lens, positions, block_size, scale,
            window=layer_window,
        )
    o = o.reshape(b, tq, spec.q_size)
    attn_out = _linear(o, lp["wo"], spec.quant_bits, spec.act_bits)
    if tp_axis is not None:  # row-parallel: sum the partial products
        attn_out = jax.lax.psum(attn_out, tp_axis)
    h = h + attn_out

    x = rms_norm(h, lp["mlp_norm"], spec.rms_norm_eps)
    if spec.num_experts:
        mlp_out = _moe_mlp(x, lp, spec, tp_axis=tp_axis)
    else:
        gate_up = _linear(x, lp["w_gate_up"], spec.quant_bits, spec.act_bits)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        y = jax.nn.silu(gate) * up
        mlp_out = _linear(y, lp["w_down"], spec.quant_bits, spec.act_bits)
    if tp_axis is not None:
        mlp_out = jax.lax.psum(mlp_out, tp_axis)
    return h + mlp_out, new_kv_layer


def forward(
    params: dict,
    kv_cache: list,  # per layer: (k_pool, v_pool), each [S, nkv*hd]
    token_ids: jnp.ndarray,  # [B, Tq]
    q_lens: jnp.ndarray,  # [B]
    context_lens: jnp.ndarray,  # [B]
    slot_mapping: jnp.ndarray,  # [B, Tq]
    block_tables: jnp.ndarray,  # [B, W]
    spec: Qwen3Spec,
    block_size: int,
    attention_fn: Any = None,
    all_logits: bool = False,
    write_runs: Any = None,  # (run_dst [R], run_src [R]) for block-aligned prefill stores
    decode_tails: Any = None,  # per-layer (k_tail, v_tail) [B, T, nkv, hd]: window-staged decode
    tail_index: Any = None,  # scalar int32 step-within-window (with decode_tails)
    attention_backend: str = "auto",
    tp_axis: str | None = None,  # set when running per-shard inside shard_map
    inputs_embeds: jnp.ndarray | None = None,  # [B, Tq, D] overrides the embed lookup (Eagle drafter)
    capture_hidden: bool = False,  # also return post-final-norm hidden states [B, Tq, D]
) -> tuple[jnp.ndarray, list]:
    """One model step (prefill when Tq > 1, decode when Tq == 1).

    Returns (last-token logits [B, V] fp32 — or [B, Tq, V] when
    ``all_logits`` is set, as the speculative-decode verify step needs a
    distribution at every draft position — and the updated kv_cache). The reference
    splits this across Qwen3Model.forward + compute_logits + the Context
    side-channel (nanovllm/models/qwen3.py:168-208); here it is one jitted
    program so XLA schedules/fuses across the whole step.

    The layer loop is a static Python unroll (not lax.scan) on purpose: the
    KV pools are separate per-layer donated arrays, so the per-layer scatter
    lowers to a true in-place HBM update. Streaming the pool through scan
    xs/ys forces XLA to copy the full pool every step — measured 4x slower
    at serving pool sizes. Layer weights stay stacked [L, ...]; indexing a
    static layer is a free slice.
    """
    b, tq = token_ids.shape
    positions = (context_lens - q_lens)[:, None] + jnp.arange(tq, dtype=jnp.int32)[None, :]

    if inputs_embeds is not None:
        h = inputs_embeds
    elif tp_axis is not None:
        # vocab-parallel embedding (reference: nanovllm/layers/embed_head.py
        # :33-41): local lookup with out-of-shard ids masked to zero, then
        # all-reduce sums the one non-zero contribution
        vloc = params["embed"].shape[0]
        local_ids = token_ids - jax.lax.axis_index(tp_axis) * vloc
        ok = (local_ids >= 0) & (local_ids < vloc)
        h = params["embed"][jnp.clip(local_ids, 0, vloc - 1)]
        h = jax.lax.psum(h * ok[..., None].astype(h.dtype), tp_axis)
    else:
        h = params["embed"][token_ids]  # [B, Tq, D] gather
    inv_freq = rope_inv_freq(spec.head_dim, spec.rope_theta)
    cos, sin = rope_cos_sin(positions, inv_freq)  # [B, Tq, hd/2]
    flat_slots = slot_mapping.reshape(-1)
    scale = spec.head_dim**-0.5
    attend = attention_fn or paged_attention
    layers = params["layers"]

    new_kv = []
    for i in range(spec.num_layers):
        lp = {name: _slice_layer(w, i) for name, w in layers.items()}
        # HF Qwen2 windows only layers >= max_window_layers; Mistral all
        layer_window = (
            spec.sliding_window
            if spec.sliding_window is not None and i >= spec.first_window_layer
            else None
        )
        h, kv_i = decoder_layer(
            h, lp, kv_cache[i],
            spec=spec, block_size=block_size, positions=positions, cos=cos,
            sin=sin, flat_slots=flat_slots, scale=scale, attend=attend,
            context_lens=context_lens, block_tables=block_tables,
            layer_window=layer_window,
            decode_tail=decode_tails[i] if decode_tails is not None else None,
            tail_index=tail_index, write_runs=write_runs,
            tp_axis=tp_axis,
            attention_backend=attention_backend,
        )
        new_kv.append(kv_i)

    return _finalize(h, params, spec, q_lens, tp_axis, all_logits, capture_hidden), new_kv


def _finalize(h, params, spec, q_lens, tp_axis, all_logits, capture_hidden):
    """Final norm + LM head (+ last-token selection): logits [B, V] fp32, or
    [B, Tq, V] with ``all_logits``; paired with the post-norm hidden states
    when ``capture_hidden``. Shared by ``forward`` and pipeline-parallel
    ``forward_pp`` (models/pp.py)."""
    h = rms_norm(h, params["final_norm"], spec.rms_norm_eps)
    lm_head = params.get("lm_head", params["embed"])

    def head(x):  # x [..., D] -> logits [..., V(_pad)] f32 (vocab-LOCAL under tp)
        if isinstance(lm_head, dict):  # int8 head, pre-transposed + V-padded
            # W8A8 under w4a8 mode: the int8 head rides the int8 MXU too
            # (the head streams fully every decode step; ~2 ms at 8B on the
            # bf16-MXU dequant path, ABLATE_r04). Padded vocab columns are
            # RETURNED (slicing [.., :V] copies the 78 MB logits array at 8B
            # every step); samplers mask them (ops/sampler.py vocab arg),
            # the all_logits path below slices for spec-decode verify.
            return quant_matmul(
                x, lm_head, spec.head_bits, out_dtype=jnp.float32,
                act_bits=spec.act_bits,
            )
        return jnp.einsum("...d,vd->...v", x, lm_head, preferred_element_type=jnp.float32)

    if all_logits:
        logits = head(h)
        if tp_axis is not None:
            # full distributions (spec-decode verify): gather the vocab axis
            logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
        logits = logits[..., : spec.vocab_size]
        if capture_hidden:
            return (logits, h)
        return logits
    last_idx = jnp.maximum(q_lens - 1, 0)  # [B]
    h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)[:, 0]  # [B, D]
    if capture_hidden:
        return (head(h_last), h)
    return head(h_last)


def make_kv_cache(spec: Qwen3Spec, num_slots: int, dtype=jnp.bfloat16, tp: int = 1) -> list:
    """Per-layer KV pool pytree: ONE merged token-major array per layer,
    ``(pool,)`` with pool [num_slots, 2*F] (bf16) or [num_slots, 2*F + 256]
    (int8: K | V | scale bytes) -- one page = one DMA, one decode store = one
    scatter (ops/kv_cache.py module docstring).

    Under shard_map TP the GLOBAL pool row is shard-major -- tp blocks of
    [K_s | V_s | scales_s] -- so the contiguous lane split P(None, 'model')
    hands each shard a self-consistent local merged pool over its own
    nkv/tp heads."""
    from byox_vllm_tpu.ops.kv_cache import row_width

    f = spec.num_kv_heads * spec.head_dim
    quantized = jnp.dtype(dtype) == jnp.int8
    width = tp * row_width(f // tp, quantized)
    pool_dtype = jnp.int8 if quantized else jnp.dtype(dtype)
    return [(jnp.zeros((num_slots, width), pool_dtype),) for _ in range(spec.num_layers)]
