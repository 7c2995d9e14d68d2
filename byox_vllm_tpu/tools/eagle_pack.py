"""EAGLE drafter packs: save/load the drafter's own weights (fusion matrix +
decoder trunk + final norm) as one safetensors file. The embedding and LM
head are NOT stored — they are the target's, attached at load (the standard
EAGLE weight layout: the published heads ship only fc + one decoder layer).

Pack layout (all tensors in the model dtype):
  fc                      [2D, D]
  final_norm              [D]
  layers.<name>           stacked [L_draft, ...] (same names as the target
                          trunk: attn_norm, wqkv, wo, mlp_norm, w_gate_up,
                          w_down, + q_norm/k_norm when the family has them)

``convert_hf_eagle`` maps an official EAGLE checkpoint directory (Llama-style
naming: fc.weight, layers.0.*) into this pack — best-effort, exercised only
on synthetic files in this environment (zero egress).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np


def save_eagle_pack(params: dict, path: str) -> None:
    """Write a drafter pack (ignores the shared embed / lm_head entries)."""
    from safetensors.numpy import save_file

    flat = {"fc": np.asarray(jax.device_get(params["fc"]))}
    flat["final_norm"] = np.asarray(jax.device_get(params["final_norm"]))
    layers = params["layers"]
    for name, w in layers.items():
        arr = w
        if isinstance(w, list):  # per-layer lists -> stacked
            arr = jnp.stack([jnp.asarray(x) for x in w])
        flat[f"layers.{name}"] = np.asarray(jax.device_get(arr))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file(flat, path)


def load_eagle_pack(path: str, target_params: dict, dtype=jnp.bfloat16) -> dict:
    """Read a drafter pack and attach the target's embedding / LM head."""
    from safetensors import safe_open

    layers: dict = {}
    out = {}
    with safe_open(path, framework="numpy") as f:
        for name in f.keys():
            t = jnp.asarray(f.get_tensor(name), dtype=dtype)
            if name.startswith("layers."):
                layers[name[len("layers."):]] = t
            else:
                out[name] = t
    assert "fc" in out and "final_norm" in out and layers, f"not an eagle pack: {path}"
    out["layers"] = layers
    out["embed"] = target_params["embed"]
    out["lm_head"] = target_params.get("lm_head", target_params["embed"])
    return out


def convert_hf_eagle(hf_dir: str, out_path: str, dtype=jnp.bfloat16) -> None:
    """Official EAGLE head checkpoint (fc.weight [D, 2D] torch-layout +
    Llama-style decoder layers) -> drafter pack. The official fc input order
    is [hidden ; embed]; ours is [embed ; hidden] — the conversion swaps the
    input halves."""
    from glob import glob

    from safetensors import safe_open

    raw = {}
    files = sorted(glob(os.path.join(hf_dir, "*.safetensors")))
    assert files, f"no safetensors in {hf_dir}"
    for file in files:
        with safe_open(file, framework="numpy") as f:
            for name in f.keys():
                raw[name.removeprefix("model.")] = f.get_tensor(name)

    fc_t = raw["fc.weight"]  # torch [D_out, 2D_in]
    d = fc_t.shape[0]
    fc = fc_t.T  # [2D, D] for x @ fc
    fc = np.concatenate([fc[d:], fc[:d]], axis=0)  # [hidden; embed] -> [embed; hidden]

    num_layers = 1 + max(
        int(k.split(".")[1]) for k in raw if k.startswith("layers.")
    )

    def lin(i, name):
        return raw[f"layers.{i}.{name}.weight"].T

    def stack(fn):
        return np.stack([fn(i) for i in range(num_layers)])

    layers = {
        "attn_norm": stack(lambda i: raw.get(
            f"layers.{i}.input_layernorm.weight", np.ones(d, np.float32)
        )),
        "wqkv": stack(lambda i: np.concatenate([
            lin(i, "self_attn.q_proj"), lin(i, "self_attn.k_proj"), lin(i, "self_attn.v_proj")
        ], axis=1)),
        "wo": stack(lambda i: lin(i, "self_attn.o_proj")),
        "mlp_norm": stack(lambda i: raw[f"layers.{i}.post_attention_layernorm.weight"]),
        "w_gate_up": stack(lambda i: np.concatenate([
            lin(i, "mlp.gate_proj"), lin(i, "mlp.up_proj")
        ], axis=1)),
        "w_down": stack(lambda i: lin(i, "mlp.down_proj")),
    }
    params = {
        "fc": jnp.asarray(fc, dtype),
        "final_norm": jnp.asarray(
            raw.get("norm.weight", np.ones(d, np.float32)), dtype
        ),
        "layers": {k: jnp.asarray(v, dtype) for k, v in layers.items()},
    }
    save_eagle_pack(params, out_path)
