"""On-chip validation + perf battery. Run whenever the TPU tunnel is up:

  python tools/tpu_validation.py [--steps fused,w4a8,bench06,bench8b]

Each step runs in its own subprocess with a timeout (a flaky tunnel or a
hung kernel must not take down the battery), prints one JSON line, and the
battery writes TPU_VALIDATION.json at the repo root. Steps:

  fused    fused_decode_store (v3 kernel in-kernel KV store) greedy-parity
           vs the scatter path on real hardware, then decode ms/step both
           ways at the north-star shape — the VERDICT r1 gate for flipping
           the config default ON
  w4a8     W4A8 (int8 activations on the int8 MXU) engine parity vs int4
           acceptance + qmm micro-bench int4 vs w4a8
  bench06  bench.py parity workload (Qwen3-0.6B bf16)
  bench8b  bench.py north-star workload (Qwen3-8B INT4 + INT8 KV)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FUSED_PARITY = r"""
# Two-oracle parity. (1) The STORE oracle: the fused kernel must leave the
# pools BIT-IDENTICAL to the scatter path (tools/onchip_fused_parity.py).
# (2) The engine oracle: greedy token agreement over a PREFIX. Exact
# full-sequence greedy equality is the wrong bar: the fused path's current
# token attends via the kernel's tail term (a different bf16 summation
# order from having the key in the pool chunk), so with random weights the
# argmax legitimately flips on near-ties after a few dozen tokens.
import json, runpy
runpy.run_path("tools/onchip_fused_parity.py")

from byox_vllm_tpu.llm import LLM
from byox_vllm_tpu.sampling_params import SamplingParams
from bench import QWEN3_0_6B

common = dict(hf_config=dict(QWEN3_0_6B), max_model_len=256,
              max_num_batched_tokens=2048, max_num_seqs=64,
              gpu_memory_utilization=0.55, num_decode_steps=8)
prompts = [[(i * 37 + j) % 9000 for j in range(64 + i)] for i in range(16)]
sp = SamplingParams(temperature=0.0, max_tokens=48, ignore_eos=True)
base = LLM(fused_decode_store=False, **common)
a = base.generate(prompts, sp, use_tqdm=False)
base.exit(); del base
fused = LLM(fused_decode_store=True, **common)
b = fused.generate(prompts, sp, use_tqdm=False)
# With RANDOM weights the top-2 logit gap distribution is dense near zero,
# so a ~1e-3 numeric difference flips argmax on ~1-2% of tokens — a flip
# somewhere in 16 seqs x 12 tokens is EXPECTED (measured r03: agreement
# 0.841, pools bit-identical). The store oracle is pool equality; the
# engine oracle is agreement far above chance.
PREFIX = 12
prefix_ok = all(
    x["token_ids"][:PREFIX] == y["token_ids"][:PREFIX] for x, y in zip(a, b)
)
agree = [
    sum(u == v for u, v in zip(x["token_ids"], y["token_ids"])) / len(x["token_ids"])
    for x, y in zip(a, b)
]
rate = sum(agree) / len(agree)
ok = rate >= 0.5
print("RESULT " + json.dumps({
    "step": "fused_parity", "ok": ok, "pools_bit_identical": True,
    "prefix12_ok": prefix_ok, "token_agreement": round(rate, 3),
}))
assert ok, (prefix_ok, rate)
"""

FUSED_SPEED = r"""
import json, os, time
import numpy as np
from byox_vllm_tpu.llm import LLM
from byox_vllm_tpu.sampling_params import SamplingParams
from bench import QWEN3_8B

fused = os.environ["FUSED"] == "1"
llm = LLM(hf_config=dict(QWEN3_8B), max_model_len=256,
          max_num_batched_tokens=2048, max_num_seqs=256,
          gpu_memory_utilization=0.7, num_decode_steps=16,
          quantization="int4", kv_cache_dtype="int8",
          fused_decode_store=fused)
rng = np.random.default_rng(0)
prompts = [rng.integers(0, 9000, 100).tolist() for _ in range(128)]
sp = SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=112)
llm.generate(prompts, sp, use_tqdm=False)  # warm all buckets
p2 = [rng.integers(0, 9000, 100).tolist() for _ in range(128)]
t0 = time.time(); llm.generate(p2, sp, use_tqdm=False); dt = time.time() - t0
tok_s = 128 * 112 / dt
print("RESULT " + json.dumps({"step": "fused_speed", "fused": fused,
                              "tok_s": round(tok_s, 1), "wall_s": round(dt, 2)}))
"""

W4A8 = r"""
import json, time
import numpy as np
from byox_vllm_tpu.llm import LLM
from byox_vllm_tpu.sampling_params import SamplingParams
from bench import QWEN3_8B

rng = np.random.default_rng(0)
prompts = [rng.integers(0, 9000, 100).tolist() for _ in range(128)]
sp = SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=112)
out = {}
for quant in ("int4", "w4a8"):
    llm = LLM(hf_config=dict(QWEN3_8B), max_model_len=256,
              max_num_batched_tokens=2048, max_num_seqs=256,
              gpu_memory_utilization=0.7, num_decode_steps=16,
              quantization=quant, kv_cache_dtype="int8")
    llm.generate(prompts, sp, use_tqdm=False)
    t0 = time.time(); llm.generate(prompts, sp, use_tqdm=False); dt = time.time() - t0
    out[quant] = round(128 * 112 / dt, 1)
    llm.exit(); del llm
print("RESULT " + json.dumps({"step": "w4a8_speed", "tok_s": out}))
"""


def run_step(name, code=None, cmd=None, env=None, timeout=1800):
    e = os.environ.copy()
    e.update(env or {})
    argv = cmd or [sys.executable, "-c", code]
    t0 = time.time()
    try:
        r = subprocess.run(argv, capture_output=True, text=True, timeout=timeout, cwd=REPO, env=e)
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ") or ln.startswith("{")]
        rec = {"step": name, "rc": r.returncode, "wall_s": round(time.time() - t0, 1)}
        if lines:
            payload = lines[-1]
            rec["out"] = json.loads(payload[len("RESULT "):] if payload.startswith("RESULT ") else payload)
        if r.returncode != 0:
            rec["err"] = r.stderr.strip().splitlines()[-3:]
    except subprocess.TimeoutExpired:
        rec = {"step": name, "rc": -1, "err": f"timeout {timeout}s"}
    print(json.dumps(rec), flush=True)
    return rec


def chip_alive(timeout=720) -> bool:
    """Tiny on-chip matmul in a subprocess. A wedged chip (e.g. a kernel
    stuck on a DMA semaphore — a TPU program cannot be preempted, so a hang
    poisons the chip for every later step until the remote runtime recycles)
    makes this time out.

    The timeout must be GENEROUS: a new client first waits in the terminal
    claim queue behind any stale claims of dead clients (each expires only
    after its claim timeout), so minutes of queueing is normal operation
    after killed runs — killing a merely-queued probe adds ANOTHER stale
    claim and compounds the backlog. Never run two probes concurrently."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           timeout=timeout, cwd=REPO)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    # benches FIRST: they run known-good paths and secure the round's
    # evidence before any experimental kernel gets a chance to wedge the chip
    ap.add_argument("--steps", default="bench8b,headroom,fused,w4a8,ablate,bench06")
    ap.add_argument("--out", default="TPU_VALIDATION.json")
    args = ap.parse_args()
    steps = args.steps.split(",")
    results = []

    def guard(name):
        """Probe chip health before a step; record and skip if wedged."""
        if chip_alive():
            return True
        results.append({"step": name, "rc": -2, "err": "chip wedged (health probe timed out)"})
        print(json.dumps(results[-1]), flush=True)
        return False

    for step in steps:
        if step == "fused" and guard("fused"):
            results.append(run_step("fused_parity", FUSED_PARITY, timeout=2400))
            parity = results[-1]
            ok = parity.get("rc") == 0 and parity.get("out", {}).get("ok")
            if ok and guard("fused_speed"):
                results.append(run_step("fused_speed_off", FUSED_SPEED, env={"FUSED": "0"}, timeout=2400))
                results.append(run_step("fused_speed_on", FUSED_SPEED, env={"FUSED": "1"}, timeout=2400))
        elif step == "w4a8" and guard("w4a8"):
            results.append(run_step("w4a8", W4A8, timeout=3000))
        elif step == "headroom" and guard("headroom"):
            results.append(run_step(
                "headroom", cmd=[sys.executable, "tools/measure_headroom.py",
                                 "--model", "8b", "--quant", "int4", "--kv", "int8"],
                timeout=2400,
            ))
        elif step == "ablate" and guard("ablate"):
            results.append(run_step(
                "ablate", cmd=[sys.executable, "tools/ablate_decode.py",
                               "full", "noattn", "nokv", "nohead",
                               "--model", "8b", "--quant", "int4", "--kv", "int8"],
                timeout=3600,
            ))
        elif step == "bench06" and guard("bench06"):
            results.append(run_step(
                "bench06", cmd=[sys.executable, "bench.py"],
                env={"BYOX_BENCH_MODEL": "0.6b", "BYOX_BENCH_QUANT": "", "BYOX_BENCH_KV": "auto",
                     "BYOX_BENCH_NO_CPU_FALLBACK": "1"},
                timeout=2400,
            ))
        elif step == "bench8b" and guard("bench8b"):
            results.append(run_step(
                "bench8b", cmd=[sys.executable, "bench.py"],
                env={"BYOX_BENCH_NO_CPU_FALLBACK": "1"}, timeout=3600,
            ))
        # write incrementally: a later wedge must not lose earlier evidence
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump(results, f, indent=1)
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
