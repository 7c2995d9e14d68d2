"""Checkpoint loading: HF safetensors -> stacked JAX parameter pytree.

Replaces the reference's per-parameter ``weight_loader`` closures + packed
module mapping (nanovllm/utils/loader.py:9-29, nanovllm/layers/linear.py:
52-123, nanovllm/models/qwen3.py:182-188): instead of narrowing tensors per
TP rank at load time, the full parameters are assembled host-side (numpy),
QKV / gate+up fused, layers stacked along [L, ...], then placed onto the
device mesh with ``jax.device_put`` under NamedShardings — GSPMD does the
narrowing the reference did by hand.

Torch linear weights are stored [out, in]; they are transposed to [in, out]
here so the model computes ``x @ W`` with no runtime transpose.
"""

import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from byox_vllm_tpu.models.qwen3 import Qwen3Spec
from byox_vllm_tpu.utils.logging import logger


def _read_checkpoint(path: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    files = sorted(glob(os.path.join(path, "*.safetensors")))
    assert files, f"no *.safetensors found in {path}"
    for file in files:
        with safe_open(file, framework="numpy") as f:
            for name in f.keys():
                tensors[name] = f.get_tensor(name)
    return tensors


def _to_np(x) -> np.ndarray:
    # bfloat16 safetensors load as ml_dtypes bfloat16 numpy arrays; keep as-is.
    return np.asarray(x)


def load_qwen3_params(path: str, spec: Qwen3Spec, dtype=jnp.bfloat16) -> dict:
    """Assemble the parameter pytree (host numpy, converted at the end)."""
    raw = _read_checkpoint(path)
    L, D = spec.num_layers, spec.hidden_size

    def get(name):
        return _to_np(raw[name])

    def linear(name):  # torch [out, in] -> [in, out]
        return get(name).T

    keys = ["attn_norm", "wqkv", "wo", "mlp_norm"]
    keys += ["router", "moe_gate_up", "moe_down"] if spec.num_experts else ["w_gate_up", "w_down"]
    if spec.qk_norm:
        keys += ["q_norm", "k_norm"]
    if spec.attention_bias:
        keys += ["bqkv"]
    layers: dict[str, list] = {k: [] for k in keys}

    for i in range(L):
        p = f"model.layers.{i}."
        layers["attn_norm"].append(get(p + "input_layernorm.weight"))
        wq = linear(p + "self_attn.q_proj.weight")
        wk = linear(p + "self_attn.k_proj.weight")
        wv = linear(p + "self_attn.v_proj.weight")
        layers["wqkv"].append(np.concatenate([wq, wk, wv], axis=1))
        if spec.attention_bias:
            layers["bqkv"].append(np.concatenate([
                get(p + "self_attn.q_proj.bias"),
                get(p + "self_attn.k_proj.bias"),
                get(p + "self_attn.v_proj.bias"),
            ]))
        if spec.qk_norm:
            layers["q_norm"].append(get(p + "self_attn.q_norm.weight"))
            layers["k_norm"].append(get(p + "self_attn.k_norm.weight"))
        layers["wo"].append(linear(p + "self_attn.o_proj.weight"))
        layers["mlp_norm"].append(get(p + "post_attention_layernorm.weight"))
        if spec.num_experts:
            layers["router"].append(linear(p + "mlp.gate.weight"))  # [D, E]
            layers["moe_gate_up"].append(np.stack([
                np.concatenate([
                    linear(p + f"mlp.experts.{e}.gate_proj.weight"),
                    linear(p + f"mlp.experts.{e}.up_proj.weight"),
                ], axis=1)
                for e in range(spec.num_experts)
            ]))  # [E, D, 2*Fm]
            layers["moe_down"].append(np.stack([
                linear(p + f"mlp.experts.{e}.down_proj.weight")
                for e in range(spec.num_experts)
            ]))  # [E, Fm, D]
        else:
            wg = linear(p + "mlp.gate_proj.weight")
            wu = linear(p + "mlp.up_proj.weight")
            layers["w_gate_up"].append(np.concatenate([wg, wu], axis=1))
            layers["w_down"].append(linear(p + "mlp.down_proj.weight"))

    def stack(name):
        return jnp.asarray(np.stack(layers[name]), dtype=dtype)

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype=dtype),
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype=dtype),
        "layers": {k: stack(k) for k in layers},
    }
    if not spec.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight"), dtype=dtype)
    if spec.quant_bits is not None:
        from byox_vllm_tpu.models.qwen3 import quantize_layer_params
        from byox_vllm_tpu.ops.quant import fold_enabled

        params["layers"] = quantize_layer_params(
            params["layers"], spec.quant_bits, group=spec.quant_group,
            fold=fold_enabled(spec.act_bits),
        )
        logger.info("quantized layer weights to int%d", spec.quant_bits)
    if spec.head_bits is not None and not spec.tie_word_embeddings:
        from byox_vllm_tpu.models.qwen3 import quantize_head
        from byox_vllm_tpu.ops.quant import fold_enabled

        params["lm_head"] = quantize_head(
            params["lm_head"], spec.head_bits, group=spec.quant_group,
            fold=fold_enabled(spec.act_bits),
        )
        logger.info("quantized lm_head to int%d", spec.head_bits)
    logger.info("loaded %d tensors from %s", len(raw), path)
    return params


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def param_bytes(params) -> int:
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in jax.tree.leaves(params))
