"""On-chip validation + perf battery. Run whenever the TPU tunnel is up:

  python tools/tpu_validation.py [--steps w4a8,spec,bench06,bench8b]

Each step runs in its own subprocess with a timeout (a flaky tunnel or a
hung kernel must not take down the battery), prints one JSON line, and the
battery writes TPU_VALIDATION.json at the repo root. Steps:

  w4a8     W4A8 (int8 activations on the int8 MXU) vs int4 decode
           throughput, warmed and timed on DIFFERENT prompt sets (the r3
           run timed fully-cached prefill shapes — VERDICT r3 weak #5)
  spec     ngram speculative decoding vs no-spec baseline (SPEC artifact)
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

W4A8 = r"""
import json, time
import numpy as np
from byox_vllm_tpu.llm import LLM
from byox_vllm_tpu.sampling_params import SamplingParams
from bench import QWEN3_8B

rng = np.random.default_rng(0)
warm = [rng.integers(0, 9000, 100).tolist() for _ in range(128)]
timed = [rng.integers(0, 9000, 100).tolist() for _ in range(128)]
sp = SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=112)
out = {}
for quant in ("int4", "w4a8"):
    llm = LLM(hf_config=dict(QWEN3_8B), max_model_len=256,
              max_num_batched_tokens=2048, max_num_seqs=256,
              gpu_memory_utilization=0.7, num_decode_steps=16,
              quantization=quant, kv_cache_dtype="int8")
    # warm on a DIFFERENT prompt set: timing the warmup prompts again hits
    # fully-cached prefill shapes the warmup never compiled (r3 weak #5)
    llm.generate(warm, sp, use_tqdm=False)
    # reset counters after warmup: the warm run's COMPILE time otherwise
    # stays inside decode_wall_s and decode_ms_per_step reports ~35x reality
    # (the self-contradicting TPU_VALIDATION_r04_w4a8.json — VERDICT r4 #7)
    llm.metrics = type(llm.metrics)()
    t0 = time.time(); llm.generate(timed, sp, use_tqdm=False); dt = time.time() - t0
    m = llm.metrics.summary()
    out[quant] = {"tok_s": round(128 * 112 / dt, 1),
                  "decode_ms_per_step": m.get("decode_ms_per_step")}
    llm.exit(); del llm
print("RESULT " + json.dumps({"step": "w4a8_speed", **out}))
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
    ap.add_argument("--steps", default="bench8b,headroom,w4a8,spec,ablate,bench06")
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
        if step == "w4a8" and guard("w4a8"):
            results.append(run_step("w4a8", W4A8, timeout=3000))
        elif step == "spec" and guard("spec"):
            # the north-star spec config (BASELINE config 4): 8B + ngram on
            # w4a8/int8-KV — spec economics improve with model size (verify
            # amortizes the weight stream), and r4 only measured 0.6B
            results.append(run_step(
                "spec", cmd=[sys.executable, "tools/spec_bench.py",
                             "--out", "SPEC_r05.json", "--model", "8b",
                             "--quant", "w4a8", "--kv", "int8"],
                timeout=3000,
            ))
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
                               "--model", "8b", "--quant", "w4a8", "--kv", "int8",
                               "--block", "128"],
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
