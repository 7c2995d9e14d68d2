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


def qwen3_param_specs(params: dict, mesh=None, pp: int = 1) -> dict:
    # pipeline parallelism: the stacked layer axis [L, ...] shards across
    # 'stage' (models/pp.py); embed/final_norm/lm_head stay stage-replicated
    St = "stage" if pp > 1 else None
    layer_specs = {
        "attn_norm": P(St, None),
        "wqkv": P(St, None, M),
        "bqkv": P(St, M),
        "q_norm": P(St, None),
        "k_norm": P(St, None),
        "wo": P(St, M, None),
        "mlp_norm": P(St, None),
        "w_gate_up": P(St, None, M),
        "w_down": P(St, M, None),
        # MoE (qwen3_moe): EXPERT-parallel — the expert dim rides 'model', so
        # each shard streams only E/tp experts' weights (weight traffic is
        # the decode bottleneck); the router stays replicated and non-local
        # assignments are weight-masked to zero before the MLP psum
        "router": P(St, None, None),
        "moe_gate_up": P(St, M, None, None),
        "moe_down": P(St, M, None, None),
    }
    def fit(spec, value):
        """Drop axes a leaf's dims can't be divided over (e.g. quantized
        SCALE tensors: [L, K/G, M] has only K/G rows on the reduction dim —
        a tiny model or coarse grouping can make K/G < TP; replicating the
        scales is always correct and they are small)."""
        if mesh is None:
            return spec
        dims = []
        for d, axis in enumerate(spec):
            if axis is not None and value.shape[d] % mesh.shape[axis] != 0:
                axis = None
            dims.append(axis)
        return P(*dims)

    def expand(key):
        base = layer_specs[key]
        value = params["layers"][key]
        # list leaves: pp=1 unstacked per-layer arrays DROP the leading [L]
        # axis; pp>1 stage-grouped arrays KEEP it ([S, ...] on 'stage' —
        # models/pp.py::regroup_layers_pp)
        inner = base if pp > 1 else P(*base[1:])
        if isinstance(value, list):
            return [fit(inner, v) for v in value]
        if isinstance(value, dict):
            # quantized {"q", "s"}: scale dims mirror the weight dims
            # ([L, K/G, M] vs [L, K, M]), modulo divisibility
            return {
                leaf: (
                    [fit(inner, vv) for vv in v]
                    if isinstance(v, list)
                    else fit(base, v)
                )
                for leaf, v in value.items()
            }
        return fit(base, value)

    specs = {
        "embed": fit(P(M, None), params["embed"]),
        "final_norm": P(None),
        "layers": {k: expand(k) for k in params["layers"]},
    }
    if "lm_head" in params:
        if isinstance(params["lm_head"], dict):
            # int8 head stored pre-transposed [D, V_pad]: vocab on 'model'
            specs["lm_head"] = {
                leaf: fit(P(None, M), v) for leaf, v in params["lm_head"].items()
            }
        else:
            specs["lm_head"] = fit(P(M, None), params["lm_head"])
    return specs


def kv_cache_spec() -> P:
    # per-layer MERGED pools [num_slots, width], lane dim on 'model'. The
    # global row is laid out SHARD-MAJOR — tp blocks of [K_s | V_s | sc_s]
    # (models/qwen3.py::make_kv_cache builds it that way) — so the contiguous
    # lane split hands each shard its own self-consistent local merged pool;
    # nothing outside shard-local code ever interprets the global lane order.
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


def shard_params(params: dict, mesh, pp: int = 1) -> dict:
    from byox_vllm_tpu.parallel.distributed import put_global

    specs = qwen3_param_specs(params, mesh, pp=pp)
    flat_p, treedef = jax.tree.flatten(params)
    flat_s, _ = jax.tree.flatten(specs, is_leaf=lambda x: isinstance(x, P))
    placed = [put_global(p, NamedSharding(mesh, s)) for p, s in zip(flat_p, flat_s)]
    return jax.tree.unflatten(treedef, placed)
