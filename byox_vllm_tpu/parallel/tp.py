"""Tensor-parallel execution helpers (shard_map path).

GSPMD alone cannot partition Pallas custom-calls (no partitioning rule), so
with model-axis size > 1 the runner wraps the step functions in
``jax.shard_map``: every shard runs the SAME forward on its local weight /
KV-head shard, with explicit ``psum`` after row-parallel matmuls and a
vocab-parallel embedding/head — the TPU-native equivalent of the reference's
TP layer classes + NCCL all-reduce (nanovllm/layers/linear.py:52-147,
embed_head.py:9-66).

Fused projection weights need their output columns REORDERED before sharding
(the reference does this at weight-load time per rank,
nanovllm/layers/linear.py:92-123): the fused qkv matrix is [q | k | v] in
GLOBAL layout, but shard d must hold [q_d | k_d | v_d]; likewise gate_up
must become [gate_d | up_d] per shard. Column permutations commute with
per-column quantization, so the same permutation applies to int8/int4 packed
weights and their scale tensors.
"""

from dataclasses import replace

import numpy as np


def _qkv_permutation(q_size: int, kv_size: int, tp: int) -> np.ndarray:
    """Global column order such that contiguous 1/tp chunks are
    [q_d | k_d | v_d]."""
    ql, kl = q_size // tp, kv_size // tp
    order = []
    for d in range(tp):
        order += list(range(d * ql, (d + 1) * ql))
        order += list(range(q_size + d * kl, q_size + (d + 1) * kl))
        order += list(range(q_size + kv_size + d * kl, q_size + kv_size + (d + 1) * kl))
    return np.asarray(order, dtype=np.int64)


def _gate_up_permutation(f: int, tp: int) -> np.ndarray:
    """[gate | up] columns -> per-shard [gate_d | up_d]."""
    fl = f // tp
    order = []
    for d in range(tp):
        order += list(range(d * fl, (d + 1) * fl))
        order += list(range(f + d * fl, f + (d + 1) * fl))
    return np.asarray(order, dtype=np.int64)


def _permute_cols(w, order):
    """Permute the trailing axis of a dense array or a quantized {q, s}
    pytree (host-side numpy: one-time at load)."""
    import jax

    def perm(x):
        return np.ascontiguousarray(np.take(np.asarray(jax.device_get(x)), order, axis=-1))

    if isinstance(w, dict):
        return {k: perm(v) for k, v in w.items()}
    return perm(w)


def tp_permute_layer_params(layer_params: dict, spec, tp: int) -> dict:
    """Reorder the fused-projection output columns for tp-way sharding."""
    if tp <= 1:
        return layer_params
    out = dict(layer_params)
    qkv_order = _qkv_permutation(spec.q_size, spec.kv_size, tp)
    out["wqkv"] = _permute_cols(layer_params["wqkv"], qkv_order)
    if "bqkv" in layer_params:
        out["bqkv"] = _permute_cols(layer_params["bqkv"], qkv_order)
    if "w_gate_up" in layer_params:  # dense MLP only — MoE experts shard WHOLE
        gu_order = _gate_up_permutation(spec.intermediate_size, tp)
        out["w_gate_up"] = _permute_cols(layer_params["w_gate_up"], gu_order)
    return out


def tp_refine_layer_scales(layer_params: dict, tp: int, bits: int) -> dict:
    """Exact scale-group refinement for the ROW-PARALLEL quantized weights
    (wo, w_down: K shards across 'model', so scale rows K/G must divide tp).
    Lossless — see ops/quant.py::refine_scales. Column-parallel weights
    (wqkv, w_gate_up) shard M, never K; MoE experts shard WHOLE."""
    if tp <= 1:
        return layer_params
    from byox_vllm_tpu.ops.quant import refine_scales

    out = dict(layer_params)
    for name in ("wo", "w_down"):
        if name in layer_params and isinstance(layer_params[name], dict):
            out[name] = refine_scales(layer_params[name], tp, bits)
    return out


def local_spec(spec, tp: int):
    """The per-shard model spec: heads divide across the model axis (vocab
    stays GLOBAL — the embedding/head handle vocab sharding explicitly).
    MoE: EXPERTS divide across the model axis (expert-parallel: each shard
    streams only its experts' weights; non-local assignments contribute zero
    and the MLP psum merges — see models/qwen3.py::_moe_mlp)."""
    if tp <= 1:
        return spec
    assert spec.num_heads % tp == 0, (spec.num_heads, tp)
    assert spec.num_kv_heads % tp == 0, (spec.num_kv_heads, tp)
    kw = {}
    if spec.num_experts:
        assert spec.num_experts % tp == 0, (spec.num_experts, tp)
        kw["num_experts"] = spec.num_experts // tp
    return replace(
        spec,
        num_heads=spec.num_heads // tp,
        num_kv_heads=spec.num_kv_heads // tp,
        intermediate_size=spec.intermediate_size // tp,
        **kw,
    )
