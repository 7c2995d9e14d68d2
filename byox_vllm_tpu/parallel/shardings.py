"""PartitionSpecs: how parameters, KV cache, and step inputs lay out on the
(data, model) mesh.

Semantics mirror the reference's TP layer classes (nanovllm/layers/linear.py:
52-147, embed_head.py:9-66) expressed as GSPMD annotations instead of
rank-local narrowing + explicit collectives:

  - QKV / gate_up projections: column-parallel -> output features on 'model'
  - o_proj / down_proj: row-parallel -> input features on 'model' (XLA emits
    the all-reduce the reference calls by hand at linear.py:146)
  - embedding & LM head: vocab-parallel -> vocab dim on 'model'
  - KV pool: kv-head dim on 'model' (reference: model_runner.py:123)
  - step inputs: batch dim on 'data'

Parameter arrays carry a leading stacked-layer axis [L, ...] (see
models/qwen3.py), hence the leading None in every layer spec.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from byox_vllm_tpu.parallel.mesh import DATA_AXIS as D, MODEL_AXIS as M


def qwen3_param_specs(params: dict) -> dict:
    layer_specs = {
        "attn_norm": P(None, None),
        "wqkv": P(None, None, M),
        "bqkv": P(None, M),
        "q_norm": P(None, None),
        "k_norm": P(None, None),
        "wo": P(None, M, None),
        "mlp_norm": P(None, None),
        "w_gate_up": P(None, None, M),
        "w_down": P(None, M, None),
    }
    def expand(key):
        base = layer_specs[key]
        value = params["layers"][key]
        if isinstance(value, dict):
            # quantized {"q", "s"}: scale dims mirror the weight dims
            # ([L, K/G, M] vs [L, K, M]), so the same spec applies to both
            return {leaf: base for leaf in value}
        return base

    specs = {
        "embed": P(M, None),
        "final_norm": P(None),
        "layers": {k: expand(k) for k in params["layers"]},
    }
    if "lm_head" in params:
        if isinstance(params["lm_head"], dict):
            # int8 head stored pre-transposed [D, V_pad]: vocab on 'model'
            specs["lm_head"] = {"q": P(None, M), "s": P(None, M)}
        else:
            specs["lm_head"] = P(M, None)
    return specs


def kv_cache_spec() -> P:
    # per-layer pools [num_slots, nkv*hd]: kv-head feature dim on 'model'
    return P(None, M)


def batch_specs() -> dict:
    return {
        "token_ids": P(D, None),
        "q_lens": P(D),
        "context_lens": P(D),
        "slot_mapping": P(D, None),
        "block_tables": P(D, None),
        "temperatures": P(D),
    }


def shard_params(params: dict, mesh) -> dict:
    specs = qwen3_param_specs(params)
    flat_p, treedef = jax.tree.flatten(params)
    flat_s, _ = jax.tree.flatten(specs, is_leaf=lambda x: isinstance(x, P))
    placed = [jax.device_put(p, NamedSharding(mesh, s)) for p, s in zip(flat_p, flat_s)]
    return jax.tree.unflatten(treedef, placed)
