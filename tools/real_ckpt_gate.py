"""Trained-weight validation battery — ONE command for the day egress exists.

Two gates stay open in the zero-egress build environment (VERDICT r4 #9,
BASELINE.md): the ABSOLUTE int4/w4a8 perplexity-within-0.1 gate and
trained-EAGLE acceptance both need real checkpoints. This script stages them
so they run the moment a machine with weights appears:

    python tools/real_ckpt_gate.py --ckpt ~/huggingface/Qwen3-8B \
        [--eagle ~/eagle_qwen3_8b.safetensors] [--out REAL_CKPT_GATE.json]

Steps (each a subprocess; a failure records and continues):
  quality   tools/quality_gate.py --ckpt <dir>: absolute ppl-ratio gate
            (< 1.105 ~ +0.1 ppl at ppl 10) for int8 / int4 / w4a8 on the
            trained weights (the random-weight build gates increments only)
  example   example.py <dir>: tokenizer-path end-to-end generation (string
            prompts -> text), eyeball-able output
  spec      tools/spec_bench.py with the real checkpoint: ngram acceptance
            on natural text (random-weight runs measure loop-heavy text)
  eagle     (with --eagle) trained-drafter acceptance: run spec_decode.py
            with method=eagle and the converted pack (tools/eagle_pack.py
            converts an upstream EAGLE checkpoint; e2e-tested so far on
            synthetic-layout files only)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name, argv, timeout=3600):
    t0 = time.time()
    try:
        r = subprocess.run(argv, capture_output=True, text=True, timeout=timeout, cwd=REPO)
        rec = {"step": name, "rc": r.returncode, "wall_s": round(time.time() - t0, 1)}
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if lines:
            try:
                rec["out"] = json.loads(lines[-1])
            except json.JSONDecodeError:
                rec["stdout_tail"] = r.stdout.splitlines()[-5:]
        else:
            rec["stdout_tail"] = r.stdout.splitlines()[-5:]
        if r.returncode != 0:
            rec["err"] = r.stderr.strip().splitlines()[-5:]
    except subprocess.TimeoutExpired:
        rec = {"step": name, "rc": -1, "err": f"timeout {timeout}s"}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="HF checkpoint dir (config + *.safetensors + tokenizer)")
    ap.add_argument("--eagle", default=None, help="EAGLE drafter checkpoint/pack for the acceptance bench")
    ap.add_argument("--out", default="REAL_CKPT_GATE.json")
    ap.add_argument("--steps", default="quality,example,spec,eagle")
    args = ap.parse_args()
    assert os.path.isdir(args.ckpt), args.ckpt
    py = sys.executable
    steps = args.steps.split(",")
    results = []

    if "quality" in steps:
        results.append(run("quality", [
            py, "tools/quality_gate.py", "--ckpt", args.ckpt,
            "--out", "QUALITY_real.json",
        ]))
    if "example" in steps:
        results.append(run("example", [py, "example.py", args.ckpt], timeout=1800))
    if "spec" in steps:
        results.append(run("spec", [
            py, "tools/spec_bench.py", "--ckpt", args.ckpt, "--out", "SPEC_real.json",
        ]))
    if "eagle" in steps and args.eagle:
        pack = args.eagle
        if not pack.endswith(".safetensors"):
            # raw upstream EAGLE checkpoint: convert to the pack format first
            results.append(run("eagle_convert", [
                py, "-m", "byox_vllm_tpu.tools.eagle_pack" if os.path.exists(
                    os.path.join(REPO, "byox_vllm_tpu", "tools", "eagle_pack.py")
                ) else "tools.eagle_pack",
                pack, os.path.join(REPO, "eagle_pack.safetensors"),
            ]))
            pack = os.path.join(REPO, "eagle_pack.safetensors")
        results.append(run("eagle", [
            py, "spec_decode.py", "--model", args.ckpt,
            "--method", "eagle", "--draft-model", pack,
        ], timeout=3600))

    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
