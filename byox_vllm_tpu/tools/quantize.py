"""Offline checkpoint quantization (north-star: "offline INT4/INT8
pre-quantization pass").

Reads an HF safetensors checkpoint, assembles the stacked parameter layout
(utils/loader.py), quantizes the big per-layer matmuls, and writes one
`byox_quant.safetensors` + `byox_quant.json` back into a directory. Engine
startup then loads the pre-packed file directly — no per-boot requantization
of multi-GB weights.

    python -m byox_vllm_tpu.tools.quantize --model /path/Qwen3-8B \
        --out /path/Qwen3-8B-int4 --bits 4
"""

import argparse
import json
import os

QUANT_FILE = "byox_quant.safetensors"
QUANT_META = "byox_quant.json"


def flatten_params(params: dict, prefix: str = "") -> dict:
    flat = {}
    for name, value in params.items():
        key = f"{prefix}{name}"
        if isinstance(value, dict):
            flat.update(flatten_params(value, f"{key}."))
        else:
            flat[key] = value
    return flat


def unflatten_params(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def quantize_checkpoint(
    model_dir: str, out_dir: str, bits: int, dtype: str = "bfloat16",
    act_bits: int | None = None,
) -> None:
    """``act_bits=8`` (the w4a8 serving mode) emits FOLDED packs
    ({q, m, S} — ops/quant.py folded-scales block): weights are rounded
    against the constrained scales directly, so serving pays zero post-hoc
    snap error (legacy {q, s} packs fold at load with a bounded snap)."""
    import jax.numpy as jnp
    import numpy as np
    from safetensors.numpy import save_file
    from transformers import AutoConfig

    from byox_vllm_tpu.models import get_model

    hf = AutoConfig.from_pretrained(model_dir)
    model_cls = get_model(getattr(hf, "model_type", "qwen3"))
    spec = model_cls.spec_from_hf(hf)
    from dataclasses import replace

    head_bits = 8 if not spec.tie_word_embeddings else None
    spec = replace(spec, quant_bits=bits, head_bits=head_bits, act_bits=act_bits)
    params = model_cls.load_params(model_dir, spec, jnp.dtype(dtype))

    os.makedirs(out_dir, exist_ok=True)
    # int4 weights are already nibble-packed int8 in memory: disk == memory
    flat = {k: np.asarray(v) for k, v in flatten_params(params).items()}
    save_file(flat, os.path.join(out_dir, QUANT_FILE))
    meta = {
        "format": "byox_vllm_tpu.quantized.v1",
        "bits": bits,
        "head_bits": head_bits,
        "act_bits": act_bits,
        "dtype": dtype,
        "model_type": getattr(hf, "model_type", "qwen3"),
        "source": os.path.abspath(model_dir),
    }
    with open(os.path.join(out_dir, QUANT_META), "w") as f:
        json.dump(meta, f, indent=2)
    # copy the HF config (and tokenizer files if present) so the output dir
    # is a self-contained model directory
    hf.save_pretrained(out_dir)
    for name in os.listdir(model_dir):
        if "token" in name or name in ("special_tokens_map.json", "vocab.json", "merges.txt"):
            src = os.path.join(model_dir, name)
            dst = os.path.join(out_dir, name)
            if os.path.isfile(src) and not os.path.exists(dst):
                import shutil

                shutil.copy(src, dst)
    total = sum(v.nbytes for v in flat.values())
    print(f"wrote {len(flat)} tensors ({total/1e9:.2f} GB) to {out_dir}")


def load_prequantized(model_dir: str):
    """(params pytree, meta dict) if the dir holds a pre-quantized pack,
    else (None, None)."""
    path = os.path.join(model_dir, QUANT_FILE)
    meta_path = os.path.join(model_dir, QUANT_META)
    if not (os.path.exists(path) and os.path.exists(meta_path)):
        return None, None
    import jax.numpy as jnp
    from safetensors import safe_open

    with open(meta_path) as f:
        meta = json.load(f)
    flat = {}
    with safe_open(path, framework="numpy") as f:
        for name in f.keys():
            flat[name] = jnp.asarray(f.get_tensor(name))
    return unflatten_params(flat), meta


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, help="HF checkpoint directory")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--bits", type=int, choices=(4, 8), default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument(
        "--w4a8", action="store_true",
        help="emit folded-scale packs for the int8-activation serving mode "
        "(exact constrained-scale quantization; implies --bits 4)",
    )
    args = ap.parse_args()
    bits = 4 if args.w4a8 else args.bits
    quantize_checkpoint(
        args.model, args.out, bits, args.dtype,
        act_bits=8 if args.w4a8 else None,
    )


if __name__ == "__main__":
    main()
