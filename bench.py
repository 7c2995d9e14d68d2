"""Offline throughput benchmark — methodology parity with the reference's
bench.py (reference bench.py:17-48): N sequences, input len ~U(100,128) random
token ids, output len ~U(100,128) with ignore_eos, temperature 0.6,
max_model_len 256; metric = total generated tokens / wall-clock seconds after
one full warmup generate.

Defaults to the NORTH-STAR config (BASELINE.md): Qwen3-8B geometry, INT4
weights + INT8 KV cache, 128 sequences on one chip. Override with
BYOX_BENCH_MODEL=0.6b BYOX_BENCH_QUANT= BYOX_BENCH_KV=auto for the
0.6B BF16 parity run.

No checkpoint is required (zero-egress environment): weights are
random-initialized at the real model shape, which exercises the identical
compute/memory path.

Robustness contract (this file must never take down a round's evidence):
  1. the accelerator backend is probed in a SUBPROCESS with retries and
     backoff before anything imports jax in this process;
  2. if in-process init still fails (flaky tunnel), the script re-execs
     itself fresh up to BYOX_BENCH_REEXEC times;
  3. if the accelerator never comes up, it falls back to a small CPU run
     tagged `backend: "cpu_fallback"` under a distinct metric name;
  4. any uncaught error still prints ONE structured JSON line (value 0,
     `error` field) instead of a bare traceback, and exits 0.

Prints exactly one JSON line on stdout:
  {"metric", "value", "unit", "vs_baseline", plus north-star gate fields
   (ttft_p50_s, ttft_p99_s, kv_gb_per_1k_seqs, ...) and "backend"}.
"""

import glob
import json
import os
import random
import re
import subprocess
import sys
import time
import traceback

NUM_SEQS = 128
MAX_INPUT_LEN = 128
MAX_OUTPUT_LEN = 128

QWEN3_0_6B = {
    "model_type": "qwen3",
    "vocab_size": 151936,
    "hidden_size": 1024,
    "intermediate_size": 3072,
    "num_hidden_layers": 28,
    "num_attention_heads": 16,
    "num_key_value_heads": 8,
    "head_dim": 128,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "tie_word_embeddings": True,
    "attention_bias": False,
    "max_position_embeddings": 40960,
}

# CPU-fallback geometry: structurally a Qwen3 but small enough that the
# evidence line lands in seconds. Its numbers are NOT comparable to TPU runs
# (distinct metric name + backend tag).
QWEN3_TINY = {
    "model_type": "qwen3",
    "vocab_size": 4096,
    "hidden_size": 256,
    "intermediate_size": 768,
    "num_hidden_layers": 4,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 128,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "tie_word_embeddings": True,
    "attention_bias": False,
    "max_position_embeddings": 40960,
}

QWEN3_8B = {
    "model_type": "qwen3",
    "vocab_size": 151936,
    "hidden_size": 4096,
    "intermediate_size": 12288,
    "num_hidden_layers": 36,
    "num_attention_heads": 32,
    "num_key_value_heads": 8,
    "head_dim": 128,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "tie_word_embeddings": False,
    "attention_bias": False,
    "max_position_embeddings": 40960,
}


def _emit(record: dict) -> None:
    print(json.dumps(record), flush=True)


def _probe_backend() -> bool:
    """Try to bring up the accelerator backend in a throwaway subprocess.

    The round-1 failure mode (BENCH_r01.json) was a one-shot
    `jax.errors.JaxRuntimeError: UNAVAILABLE: TPU backend setup/compile
    error` at init — a transient tunnel fault that torched the round's
    evidence. Probing out-of-process keeps this process's jax import
    pristine and lets us retry with backoff."""
    attempts = int(os.environ.get("BYOX_BENCH_PROBE_ATTEMPTS", "4"))
    probe_timeout = int(os.environ.get("BYOX_BENCH_PROBE_TIMEOUT", "420"))
    backoffs = [15, 45, 90, 120]
    code = "import jax; d = jax.devices(); print(jax.default_backend(), len(d))"
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=probe_timeout,
                env=os.environ.copy(),
            )
            if r.returncode == 0:
                print(f"# backend probe ok: {r.stdout.strip()}", file=sys.stderr)
                return True
            print(
                f"# backend probe attempt {i + 1}/{attempts} failed (rc={r.returncode}): "
                f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else '?'}",
                file=sys.stderr,
            )
        except subprocess.TimeoutExpired:
            print(f"# backend probe attempt {i + 1}/{attempts} timed out after {probe_timeout}s", file=sys.stderr)
        if i < attempts - 1:
            time.sleep(backoffs[min(i, len(backoffs) - 1)])
    return False


def _workload(num_seqs: int, seed: int = 0):
    from byox_vllm_tpu.sampling_params import SamplingParams

    rng = random.Random(seed)
    prompts = [
        [rng.randint(0, 10000) for _ in range(rng.randint(100, MAX_INPUT_LEN))]
        for _ in range(num_seqs)
    ]
    sampling = [
        SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=rng.randint(100, MAX_OUTPUT_LEN))
        for _ in range(num_seqs)
    ]
    return prompts, sampling


def _run_arrival_phase(llm, tok_s_capacity: float, num_seqs: int, seed: int = 2) -> dict:
    """Open-loop serving phase: Poisson arrivals at BYOX_BENCH_ARRIVAL_UTIL
    (default 0.65) x measured offline capacity. TTFT here is the
    gate-appropriate measurement (BASELINE.md: p50 < 200 ms): each request's
    clock starts at its own arrival, not at t=0 of a 128-deep batch (the
    offline number mostly measures queueing behind other prefills —
    VERDICT r2). Reuses the warmed engine, so no compiles land in the
    timings."""
    from byox_vllm_tpu.engine.metrics import EngineMetrics

    # 0.5 default: capacity is measured CLOSED-loop at full concurrency,
    # but decode step cost is nearly flat in batch size, so effective
    # capacity during the open-loop ramp is lower — at 0.65 the queue sits
    # on the stability edge (r4: p50 0.67 s but p99 16.5 s)
    util = float(os.environ.get("BYOX_BENCH_ARRIVAL_UTIL", "0.5"))
    # serving-mode decode window: the offline phase amortizes dispatch with
    # K=16-step windows, but a window is TTFT blind time — an arrival waits
    # for the in-flight window before it can prefill. K=4 bounds that at
    # ~4 decode iterations while async pipelining still hides dispatch. The
    # K=4 program is one of the scheduler's standard power-of-two lookahead
    # shapes (engine/scheduler.py:_pick_lookahead), so this compiles once.
    serve_k = int(os.environ.get("BYOX_BENCH_ARRIVAL_STEPS", "4"))
    saved_k = llm.scheduler.decode_lookahead
    llm.scheduler.decode_lookahead = min(serve_k, saved_k)
    rng = random.Random(seed)
    prompts, sampling = _workload(num_seqs, seed=seed)
    # Calibrate capacity in ARRIVAL mode (K=serve_k windows + prefill
    # interleave), not from the offline K=16 number: offline capacity is
    # higher, so pacing 0.65 x offline overloads the K=4 system and the
    # queue diverges (r3: p99 TTFT 13.5 s on an 18.9 s run — the number
    # measured overload, not the engine). This closed-loop pass doubles as
    # the compile warmup for every serving-K batch bucket the timed loop
    # can hit (a mid-run compile would be charged to some request's TTFT).
    warm_p, warm_s = _workload(num_seqs, seed=seed + 3)
    llm.generate(warm_p, warm_s, use_tqdm=False)  # compile K=serve_k buckets
    cal_p, cal_s = _workload(num_seqs, seed=seed + 1)
    t0 = time.perf_counter()
    llm.generate(cal_p, cal_s, use_tqdm=False)  # timed: all programs warm
    serve_capacity = sum(sp.max_tokens for sp in cal_s) / (time.perf_counter() - t0)
    # arrival-mode prefills land one request at a time (smallest batch
    # bucket), a shape the batched warmups above never hit
    solo_p, solo_s = _workload(1, seed=seed + 2)
    llm.generate(solo_p, solo_s, use_tqdm=False)
    avg_out = sum(sp.max_tokens for sp in sampling) / len(sampling)
    rate = util * serve_capacity / avg_out  # requests / s
    t, arrivals = 0.0, []
    for _ in range(num_seqs):
        t += rng.expovariate(rate)
        arrivals.append(t)

    # tunnel RTT probe: dispatch+fetch of a tiny array ~= one host<->device
    # round trip. Separates "the tail is the tunnel" from "the tail is a real
    # queue" (VERDICT r4 #4 demanded the excuse be proven or retired).
    import jax
    import jax.numpy as jnp
    import numpy as _np

    rtts = []
    for i_ in range(20):
        t_ = time.perf_counter()
        _np.asarray(jnp.full((8,), i_, jnp.int32))
        rtts.append(time.perf_counter() - t_)
    rtt_s = sorted(rtts)[len(rtts) // 2]

    llm.metrics = EngineMetrics()
    depths = []  # waiting-queue depth observed at each arrival
    step_s = []  # engine step wall times during the timed run
    t0 = time.perf_counter()
    i = 0
    while i < num_seqs or not llm.is_finished():
        now = time.perf_counter() - t0
        while i < num_seqs and arrivals[i] <= now:
            depths.append(len(llm.scheduler.waiting))
            llm.add_request(prompts[i], sampling[i])
            i += 1
        if llm.is_finished():
            time.sleep(min(max(arrivals[i] - now, 0.0), 0.05))
            continue
        ts = time.perf_counter()
        llm.step()
        step_s.append(time.perf_counter() - ts)
    wall = time.perf_counter() - t0
    llm.scheduler.decode_lookahead = saved_k
    msum = llm.metrics.summary()
    step_s.sort()
    depths.sort()

    def pct(xs, q):
        return xs[min(len(xs) - 1, int(q * len(xs)))] if xs else None

    # corrected TTFT: subtract the two mandatory host syncs on a request's
    # path (in-flight window commit + prefill fetch) at the measured RTT —
    # the part of TTFT the tunnel imposes regardless of engine design
    corr = 2 * rtt_s
    return {
        "arrival_rate_rps": round(rate, 3),
        "arrival_capacity_tok_s": round(serve_capacity, 1),
        "arrival_util": util,
        "arrival_decode_window": min(serve_k, saved_k),
        "arrival_num_seqs": num_seqs,
        "arrival_wall_s": round(wall, 2),
        "arrival_ttft_p50_s": msum["ttft_p50_s"],
        "arrival_ttft_p99_s": msum["ttft_p99_s"],
        "arrival_latency_p50_s": msum["latency_p50_s"],
        "tunnel_rtt_ms": round(rtt_s * 1e3, 1),
        "arrival_ttft_p50_corrected_s": (
            round(max(msum["ttft_p50_s"] - corr, 0.0), 4)
            if msum["ttft_p50_s"] is not None else None
        ),
        "arrival_ttft_p99_corrected_s": (
            round(max(msum["ttft_p99_s"] - corr, 0.0), 4)
            if msum["ttft_p99_s"] is not None else None
        ),
        "arrival_queue_depth_max": depths[-1] if depths else 0,
        "arrival_queue_depth_p90": pct(depths, 0.90),
        "arrival_step_ms_p50": round(1e3 * pct(step_s, 0.50), 1) if step_s else None,
        "arrival_step_ms_p99": round(1e3 * pct(step_s, 0.99), 1) if step_s else None,
    }


def _run_prefix_phase(llm, num_seqs: int, seed: int = 5) -> dict:
    """Shared-system-prompt workload: every request shares a 128-token
    prefix (block-aligned) plus a short unique suffix, exercising the
    hash-chained prefix cache (block reuse + freed-block resurrection,
    reference block_manager.py:41-71) under serving load.

    Two arms, same prompt shapes: (a) UNIQUE per-request prefixes — no
    sharing possible, the cold baseline; (b) one SHARED prefix — the cache
    serves it. Both run after a throwaway same-shape warmup so neither arm
    pays XLA compiles (the r3 phase hit a never-warmed 256-token prefill
    bucket and timed an 11 s compile as TTFT). The cached-token fraction is
    read from EngineMetrics (captured at schedule time — deallocate zeroes
    per-seq counts, the other r3 bug)."""
    from byox_vllm_tpu.engine.metrics import EngineMetrics
    from byox_vllm_tpu.sampling_params import SamplingParams

    rng = random.Random(seed)
    bs = llm.config.kvcache_block_size
    # block-aligned shared prefix, >= 128 tokens, but clamped so the prompt
    # (prefix + 8-token suffix) stays within max_model_len at large blocks
    prefix_len = bs * max(1, 128 // bs)
    while prefix_len + 16 > llm.config.max_model_len and prefix_len > bs:
        prefix_len -= bs

    def make_prompts(shared: bool):
        pre = [rng.randint(0, 10000) for _ in range(prefix_len)]
        out = []
        for _ in range(num_seqs):
            if not shared:
                pre = [rng.randint(0, 10000) for _ in range(prefix_len)]
            out.append(pre + [rng.randint(0, 10000) for _ in range(8)])
        return out

    def sp():
        return [SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=32)
                for _ in range(num_seqs)]

    def run(prompts) -> dict:
        llm.metrics = EngineMetrics()
        t0 = time.perf_counter()
        for p, s in zip(prompts, sp()):
            llm.add_request(p, s)
        while not llm.is_finished():
            llm.step()
        wall = time.perf_counter() - t0
        m = llm.metrics.summary()
        return {
            "frac": m["prefix_cached_token_frac"],
            "ttft_p50_s": m["ttft_p50_s"],
            "tok_s": round(num_seqs * 32 / wall, 1),
        }

    # warmups compile BOTH arms' shape buckets: unique-prefix prompts hit
    # full-length prefill shapes; shared-prefix prompts hit the short
    # cached-suffix chunk shapes (the r3 phase timed an 11 s compile as TTFT)
    run(make_prompts(False))
    run(make_prompts(True))
    cold = run(make_prompts(False))
    shared = run(make_prompts(True))
    return {
        "prefix_cached_token_frac": shared["frac"],
        "prefix_ttft_p50_s": shared["ttft_p50_s"],
        "prefix_tok_s": shared["tok_s"],
        "prefix_cold_ttft_p50_s": cold["ttft_p50_s"],
        "prefix_cold_tok_s": cold["tok_s"],
    }


def _kv_gb_per_1k_seqs(llm) -> float:
    """North-star gate: KV bytes to hold 1000 sequences at max_model_len."""
    import jax

    runner = llm.model_runner
    kv_bytes = sum(x.nbytes for x in jax.tree.leaves(runner.kv_cache))
    per_token = kv_bytes / max(runner.num_slots, 1)
    return round(per_token * llm.config.max_model_len * 1000 / 1e9, 3)


def _run_bench() -> dict:
    fallback = os.environ.get("BYOX_BENCH_FALLBACK") == "cpu"
    if fallback or os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # This environment's sitecustomize registers the TPU PJRT plugin and
        # PINS jax_platforms (plain JAX_PLATFORMS env is overridden); force
        # the CPU backend back before anything initializes a backend,
        # otherwise the "CPU" fallback still blocks on the dead tunnel.
        import jax

        jax.config.update("jax_platforms", "cpu")

    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    num_seqs = int(os.environ.get("BYOX_BENCH_SEQS", "8" if fallback else str(NUM_SEQS)))
    # north-star defaults (BASELINE.md): Qwen3-8B INT4 weights + INT8 KV.
    # CPU fallback shrinks to 0.6B BF16 so the evidence line still lands.
    if fallback:
        quant = os.environ.get("BYOX_BENCH_QUANT") or None
        kv_dtype = os.environ.get("BYOX_BENCH_KV", "auto")
        model = os.environ.get("BYOX_BENCH_MODEL", "tiny")
    else:
        # w4a8 default: int4 weights with per-token int8 activations on the
        # int8 MXU — measured +34.6% over plain int4 at the north-star shape
        # (TPU_VALIDATION_r04_w4a8.json: 3802.2 vs 2824.4 tok/s; the B=128
        # decode matmul is MXU-bound, not bandwidth-bound, ABLATE_r04)
        quant = os.environ.get("BYOX_BENCH_QUANT", "w4a8") or None
        kv_dtype = os.environ.get("BYOX_BENCH_KV", "int8")
        model = os.environ.get("BYOX_BENCH_MODEL", "8b")
    hf_cfg = {"8b": QWEN3_8B, "tiny": QWEN3_TINY}.get(model, QWEN3_0_6B)

    llm = LLM(
        hf_config=dict(hf_cfg),
        max_model_len=256,
        max_num_batched_tokens=int(os.environ.get("BYOX_BENCH_BUDGET", "2048")),
        max_num_seqs=256,
        gpu_memory_utilization=float(os.environ.get("BYOX_BENCH_UTIL", "0.7")),
        num_decode_steps=int(os.environ.get("BYOX_BENCH_STEPS", "16")),
        quantization=quant,
        kv_cache_dtype=kv_dtype,
        quant_group=int(os.environ.get("BYOX_BENCH_QUANT_GROUP", "0")) or None,
        # 128-token KV pages at this workload's ctx <= 256: half the
        # per-(seq, page) DMA issues in decode attention (~81 ns each x 3
        # pools x 36 layers was ~2.7 ms/step of ABLATE_r04's attention term)
        # for ~13% slot fragmentation — a win at serving shapes
        kvcache_block_size=int(os.environ.get("BYOX_BENCH_BLOCK", "128")),
    )

    prompts, sampling = _workload(num_seqs, seed=0)

    # Warmup with a full same-shape workload on *different* prompts: compiles
    # every shape-bucket program the timed run will hit without priming the
    # prefix cache (hits would change the timed run's prefill shapes). The
    # reference warms up once too (bench.py:38); steady-state serving
    # throughput is the metric.
    warm_prompts, _ = _workload(num_seqs, seed=1)
    llm.generate(
        warm_prompts,
        [SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=sp.max_tokens) for sp in sampling],
        use_tqdm=False,
    )
    llm.metrics = type(llm.metrics)()  # reset gate counters: report the timed run only

    t0 = time.time()
    llm.generate(prompts, sampling, use_tqdm=False)
    dt = time.time() - t0
    total_tokens = sum(sp.max_tokens for sp in sampling)
    tok_s = total_tokens / dt

    tag = "bf16" if not quant else quant
    if kv_dtype != "auto":
        tag += f"_kv{kv_dtype}"
    metric = f"offline_throughput_qwen3_{model}_{tag}"
    if fallback:
        metric += "_cpu_fallback"

    msum = llm.metrics.summary()

    # open-loop serving phase (skippable: BYOX_BENCH_ARRIVAL=0). The offline
    # phase above measured capacity; arrivals are paced off it.
    arrival = {}
    if os.environ.get("BYOX_BENCH_ARRIVAL", "1") != "0" and not fallback:
        arrival = _run_arrival_phase(llm, tok_s, num_seqs)
    if os.environ.get("BYOX_BENCH_PREFIX", "1") != "0" and not fallback:
        arrival.update(_run_prefix_phase(llm, num_seqs))

    import jax

    # roofline visibility: decode-only ms/step and the achieved WEIGHT-stream
    # bandwidth (param bytes fully re-read every model step; KV reads come on
    # top, so this is a lower bound on total HBM GB/s)
    param_bytes = sum(x.nbytes for x in jax.tree.leaves(llm.model_runner.params))
    decode_ms = msum.get("decode_ms_per_step")
    weight_gbps = round(param_bytes / (decode_ms / 1e3) / 1e9, 1) if decode_ms else None

    return {
        "metric": metric,
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": _vs_previous_round(metric, tok_s),
        "backend": "cpu_fallback" if fallback else jax.default_backend(),
        "num_seqs": num_seqs,
        "total_tokens": total_tokens,
        "wall_s": round(dt, 2),
        # north-star gates (BASELINE.md): p50 TTFT < 200 ms measured under
        # full queue load (all requests admitted at t=0), KV GB per 1k seqs
        "ttft_p50_s": msum["ttft_p50_s"],
        "ttft_p99_s": msum["ttft_p99_s"],
        "latency_p50_s": msum["latency_p50_s"],
        "kv_gb_per_1k_seqs": _kv_gb_per_1k_seqs(llm),
        "num_kvcache_blocks": llm.config.num_kvcache_blocks,
        "decode_ms_per_step": decode_ms,
        "weight_stream_gbps": weight_gbps,
        "prefill_tok_s": msum.get("prefill_tok_s"),
        **arrival,
    }


def _vs_previous_round(metric: str, value: float) -> float:
    """Ratio vs the most recent recorded round. The driver writes
    BENCH_r{N}.json as {"rc", "parsed": {...the JSON line...}, ...}; older
    hand-written records may hold the line at top level. 1.0 when no prior
    same-metric record exists (the reference publishes no numbers,
    BASELINE.md)."""
    prefix = metric.rsplit("_", 2)[0]  # same model+workload, any quant tag
    best = exact = None
    for path in glob.glob("BENCH_r*.json"):
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        inner = rec.get("parsed") if isinstance(rec.get("parsed"), dict) else rec
        m = inner.get("metric", "")
        if inner.get("value") and (m == metric or m.startswith(prefix)):
            n = int(re.search(r"BENCH_r(\d+)", path).group(1))
            if m == metric and (exact is None or n > exact[0]):
                exact = (n, inner["value"])
            if best is None or n > best[0]:
                best = (n, inner["value"])
    # exact-metric history wins; else the same-workload flagship under its
    # previous quant tag (w4a8 is the same int4 weights + int8 KV workload)
    pick = exact or best
    return round(value / pick[1], 4) if pick else 1.0


def main() -> None:
    want_cpu = os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"
    fallback = os.environ.get("BYOX_BENCH_FALLBACK") == "cpu"
    if not (want_cpu or fallback) and not _probe_backend():
        # accelerator never came up: CPU fallback keeps the evidence line
        if os.environ.get("BYOX_BENCH_NO_CPU_FALLBACK"):
            _emit({"metric": "offline_throughput", "value": 0, "unit": "tok/s",
                   "vs_baseline": 0, "error": "accelerator backend unavailable after retries"})
            return
        env = os.environ.copy()
        env["JAX_PLATFORMS"] = "cpu"
        env["BYOX_BENCH_FALLBACK"] = "cpu"
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    try:
        _emit(_run_bench())
    except Exception as e:
        traceback.print_exc()
        reexecs = int(os.environ.get("BYOX_BENCH_REEXEC", "2"))
        if reexecs > 0:
            # flaky backend mid-run: a fresh process gets a fresh jax
            print(f"# bench failed ({e!r}); re-exec with {reexecs - 1} retries left", file=sys.stderr)
            env = os.environ.copy()
            env["BYOX_BENCH_REEXEC"] = str(reexecs - 1)
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        _emit({"metric": "offline_throughput", "value": 0, "unit": "tok/s",
               "vs_baseline": 0, "error": repr(e)[:500]})


if __name__ == "__main__":
    main()
