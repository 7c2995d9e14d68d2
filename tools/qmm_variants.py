"""Microbenchmark harness for quantized-matmul kernel variants on TPU.

Goal: find the fastest W8/W4 weight-only matmul for decode (N=128) at
Qwen3-8B shapes. Peak HBM ~819 GB/s on v5e; the current kernel measures
12-72 GB/s, i.e. VPU dequant dominates. Variants isolate: integer vs f32
unpack, sublane-concat vs split-matmul, per-element vs post-matmul scaling,
and s8xs8 MXU matmuls.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 128
G = 128


def timeit(f, *args, iters=64):
    """Time a SCAN of chained calls inside ONE dispatched program, syncing
    via jax.device_get (block_until_ready DOES NOT BLOCK through the axon
    tunnel — r4 finding: it produced impossible 28 TB/s readings here) and
    subtracting the ~50 ms tunnel RTT by marginal-iteration timing: run at
    iters and 4*iters, report delta/(3*iters).

    The scan feeds each output back into the next activation: (a) that
    serializes the iterations, (b) it defeats XLA's algebraic collapse of
    sum(x @ w). NOTE: loop-invariant weights may be hoisted into VMEM
    (v5e: 128 MB), so this measures the COMPUTE-bound rate for operands
    that fit — which is exactly what the decode-batch matmul study wants
    (at B=128 the quantized matmul is MXU/VPU-bound, not HBM-bound)."""
    x0 = args[0]
    kdim = x0.shape[-1]

    @functools.partial(jax.jit, static_argnames=("it",))
    def chain(x_, *rest, it):
        def body(c, i):
            r = f((x_ + c).astype(x_.dtype), *rest)
            c_next = r[:, :kdim].astype(jnp.float32) * (1e-6 * i)
            return c_next, None

        c, _ = jax.lax.scan(
            body, jnp.zeros_like(x0, jnp.float32), jnp.arange(it, dtype=jnp.int32)
        )
        return c

    def timed(it, salt):
        xi = x0 + jnp.asarray(salt, x0.dtype)
        _ = jax.device_get(xi)
        t0 = time.perf_counter()
        _ = jax.device_get(chain(xi, *args[1:], it=it))
        return time.perf_counter() - t0

    lo, hi = iters, iters * 4
    for it in (lo, hi):  # compile + warm both
        _ = jax.device_get(chain(x0, *args[1:], it=it))
    # calibrate: RTT jitter has multi-100 ms spikes; scale iteration counts
    # until the hi-lo marginal work is ~2 s, then take the median of
    # interleaved deltas (the bench_qmm.py methodology)
    per_call = timed(hi, 99) / hi  # upper bound (includes RTT)
    boost = max(1, int(2.0 / max((hi - lo) * per_call, 1e-9)) + 1)
    boost = min(boost, 4000)
    lo, hi = lo * boost, hi * boost
    for it in (lo, hi):
        _ = jax.device_get(chain(x0, *args[1:], it=it))
    deltas = sorted(timed(hi, 2 * i + 1) - timed(lo, 2 * i + 2) for i in range(5))
    dt = deltas[len(deltas) // 2] / (hi - lo)
    return dt * 1e3, None


# --------------------------------------------------------------- variant A
# int8 weights, convert->bf16 in one op, scale per element (bf16), no reshape
# games: scales pre-expanded to [tk, tm] by repeating rows OUTSIDE the kernel
# (wasteful HBM, just to isolate the convert+mul cost).
def _kern_a(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(jnp.bfloat16) * s_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot(x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)


def run_a(x, wq, s_full, tk=1024, tm=512):
    k, m = wq.shape
    return pl.pallas_call(
        _kern_a,
        grid=(m // tm, k // tk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j)),
            pl.BlockSpec((tk, tm), lambda i, j: (j, i)),
            pl.BlockSpec((tk, tm), lambda i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((N, tm), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((N, m), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((N, tm), jnp.float32)],
    )(x, wq, s_full)


# --------------------------------------------------------------- variant B
# int8 weights, s8 x s8 MXU matmul per group, post-scale partial sums.
# x quantized per-row to int8 outside (sx [N]); within tile loop groups.
def _kern_b(x_ref, w_ref, s_ref, o_ref, acc_ref, *, gpt):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for g in range(gpt):
        part = jax.lax.dot(
            x_ref[:, g * G:(g + 1) * G],
            w_ref[g * G:(g + 1) * G, :],
            preferred_element_type=jnp.int32,
        )
        acc_ref[...] += part.astype(jnp.float32) * s_ref[g, :][None, :]

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)


def run_b(xq, wq, s, tk=1024, tm=512):
    k, m = wq.shape
    gpt = tk // G
    return pl.pallas_call(
        functools.partial(_kern_b, gpt=gpt),
        grid=(m // tm, k // tk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j)),
            pl.BlockSpec((tk, tm), lambda i, j: (j, i)),
            pl.BlockSpec((gpt, tm), lambda i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((N, tm), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((N, m), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((N, tm), jnp.float32)],
    )(xq, wq, s)


# --------------------------------------------------------------- variant C
# int8 weights, single s8 x s8 MXU matmul over the whole tile, scales folded
# differently: requires per-TILE scale only => use per-column scales (no
# k-groups). Quality differs; measures the pure MXU-int8 ceiling.
def _kern_c(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    part = jax.lax.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.int32)
    acc_ref[...] += part.astype(jnp.float32) * s_ref[0, :][None, :]

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)


def run_c(xq, wq, s_col, tk=1024, tm=512):
    k, m = wq.shape
    return pl.pallas_call(
        _kern_c,
        grid=(m // tm, k // tk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j)),
            pl.BlockSpec((tk, tm), lambda i, j: (j, i)),
            pl.BlockSpec((1, tm), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((N, tm), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((N, m), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((N, tm), jnp.float32)],
    )(xq, wq, s_col)


# --------------------------------------------------------------- variant D
# int4: whole-K split-half packing (byte row r holds rows r and r+K/2),
# integer unpack (and/shift/sub), TWO matmuls per tile against x lane-slices
# (no sublane concat), per-element bf16 scaling with pre-expanded scales.
def _kern_d(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    raw = w_ref[...].astype(jnp.int32)
    byte = jnp.where(raw < 0, raw + 256, raw)
    lo = ((byte & 15) - 8).astype(jnp.bfloat16) * slo_ref[...].astype(jnp.bfloat16)
    hi = ((byte >> 4) - 8).astype(jnp.bfloat16) * shi_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot(xlo_ref[...], lo, preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot(xhi_ref[...], hi, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)


def run_d(xlo, xhi, wq4, slo, shi, tk=512, tm=512):
    kh, m = wq4.shape  # kh = K/2 packed rows
    return pl.pallas_call(
        _kern_d,
        grid=(m // tm, kh // tk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j)),
            pl.BlockSpec((N, tk), lambda i, j: (0, j)),
            pl.BlockSpec((tk, tm), lambda i, j: (j, i)),
            pl.BlockSpec((tk, tm), lambda i, j: (j, i)),
            pl.BlockSpec((tk, tm), lambda i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((N, tm), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((N, m), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((N, tm), jnp.float32)],
    )(xlo, xhi, wq4, slo, shi)


# --------------------------------------------------------------- variant E
# int4 split-half + integer unpack + s8 MXU per group post-scale:
# x int8 lane-sliced, unpack nibbles to int8 (stay int), group matmuls.
def _kern_e(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, o_ref, acc_ref, *, gpt):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    raw = w_ref[...].astype(jnp.int32)
    byte = jnp.where(raw < 0, raw + 256, raw)
    lo = ((byte & 15) - 8).astype(jnp.int8)
    hi = ((byte >> 4) - 8).astype(jnp.int8)
    for g in range(gpt):
        sl = slice(g * G, (g + 1) * G)
        plo = jax.lax.dot(xlo_ref[:, sl], lo[sl, :], preferred_element_type=jnp.int32)
        phi = jax.lax.dot(xhi_ref[:, sl], hi[sl, :], preferred_element_type=jnp.int32)
        acc_ref[...] += plo.astype(jnp.float32) * slo_ref[g, :][None, :]
        acc_ref[...] += phi.astype(jnp.float32) * shi_ref[g, :][None, :]

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)


def run_e(xlo, xhi, wq4, slo, shi, tk=1024, tm=512):
    kh, m = wq4.shape
    gpt = tk // G
    return pl.pallas_call(
        functools.partial(_kern_e, gpt=gpt),
        grid=(m // tm, kh // tk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j)),
            pl.BlockSpec((N, tk), lambda i, j: (0, j)),
            pl.BlockSpec((tk, tm), lambda i, j: (j, i)),
            pl.BlockSpec((gpt, tm), lambda i, j: (j, i)),
            pl.BlockSpec((gpt, tm), lambda i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((N, tm), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((N, m), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((N, tm), jnp.float32)],
    )(xlo, xhi, wq4, slo, shi)


# --------------------------------------------------------------- variant F
# int4 production packing (row-pair interleave), hardware nibble bitcast
# straight to bf16 (ONE convert, no scale multiply on weight elements), then
# per-GROUP bf16 MXU matmuls with f32 post-scaling of the [N, tm] partials.
# Dequant VPU cost drops from ~3 ops/weight-elem (f32 convert, scale mul,
# bf16 convert) to ~1; the scale lands on N*tm*gpt partial elements instead
# (N/G = 1x at N=128, and those muls fuse into the accumulate).
def _kern_f(x_ref, w_ref, s_ref, o_ref, acc_ref, *, gpt):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = pltpu.bitcast(w_ref[...], jnp.int4).astype(jnp.bfloat16)  # [tk, tm]
    for g in range(gpt):
        part = jax.lax.dot(
            x_ref[:, g * G:(g + 1) * G], w[g * G:(g + 1) * G, :],
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] += part * s_ref[g, :][None, :]

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)


def run_f(x, wq4, s, tk=2048, tm=512):
    kh, m = wq4.shape  # kh = K/2 packed byte rows
    k = kh * 2
    gpt = tk // G
    return pl.pallas_call(
        functools.partial(_kern_f, gpt=gpt),
        grid=(m // tm, k // tk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j)),
            pl.BlockSpec((tk // 2, tm), lambda i, j: (j, i)),
            pl.BlockSpec((gpt, tm), lambda i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((N, tm), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((N, m), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((N, tm), jnp.float32)],
    )(x, wq4, s)


# --------------------------------------------------------------- variant I
# int4 bitcast unpack -> int8, ONE whole-tile s8xs8 MXU dot, per-column scale
# only: the FLOOR of the w4a8 approach (no per-group VPU work at all; int32
# accumulation over the full K is exact — max |x8*w4*K| = 127*7*K << 2^31).
def _kern_i(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = pltpu.bitcast(w_ref[...], jnp.int4).astype(jnp.int8)
    part = jax.lax.dot(x_ref[...], w8, preferred_element_type=jnp.int32)
    acc_ref[...] += part.astype(jnp.float32) * s_ref[0, :][None, :]

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)


def run_i(xq, wq4, s_col, tk=2048, tm=512):
    kh, m = wq4.shape
    k = kh * 2
    return pl.pallas_call(
        _kern_i,
        grid=(m // tm, k // tk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j)),
            pl.BlockSpec((tk // 2, tm), lambda i, j: (j, i)),
            pl.BlockSpec((1, tm), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((N, tm), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((N, m), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((N, tm), jnp.float32)],
    )(xq, wq4, s_col)


# --------------------------------------------------------------- variant J
# int4 weights fed DIRECTLY to the MXU dot (no unpack convert at all) — probes
# whether Mosaic lowers a mixed s8 x s4 matmul natively.
def _kern_j(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w4 = pltpu.bitcast(w_ref[...], jnp.int4)
    part = jax.lax.dot_general(
        x_ref[...], w4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc_ref[...] += part.astype(jnp.float32) * s_ref[0, :][None, :]

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)


def run_j(xq, wq4, s_col, tk=2048, tm=512):
    kh, m = wq4.shape
    k = kh * 2
    return pl.pallas_call(
        _kern_j,
        grid=(m // tm, k // tk),
        in_specs=[
            pl.BlockSpec((N, tk), lambda i, j: (0, j)),
            pl.BlockSpec((tk // 2, tm), lambda i, j: (j, i)),
            pl.BlockSpec((1, tm), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((N, tm), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((N, m), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((N, tm), jnp.float32)],
    )(xq, wq4, s_col)


# --------------------------------------------------------------- baselines
def run_bf16(x, w):
    return x @ w


def main():
    K, M = 4096, 24576
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, K)), jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, M)), jnp.int8)
    wbf = jnp.asarray(rng.normal(size=(K, M)) * 0.02, jnp.bfloat16)
    s = jnp.asarray(rng.random((K // G, M)) * 0.01, jnp.float32)
    s_full = jnp.repeat(s, G, axis=0)
    s_col = s[:1]
    xq = jnp.asarray(rng.integers(-127, 127, (N, K)), jnp.int8)
    w4 = jnp.asarray(rng.integers(-128, 127, (K // 2, M)), jnp.int8)
    slo = jnp.repeat(s[: K // 2 // G], G, axis=0)
    shi = slo
    sg = s[: K // 2 // G]
    xlo, xhi = x[:, : K // 2], x[:, K // 2:]
    xqlo, xqhi = xq[:, : K // 2], xq[:, K // 2:]

    results = {}
    which = sys.argv[1:] or ["bf16", "a", "b", "c", "d", "e", "f", "p"]
    if "bf16" in which:
        ms, _ = timeit(jax.jit(run_bf16), x, wbf)
        results["bf16 dense (XLA)"] = (ms, wbf.nbytes)
    if "a" in which:
        ms, _ = timeit(jax.jit(run_a), x, w8, s_full)
        results["A int8 conv+mul preexp"] = (ms, w8.nbytes)
    if "b" in which:
        ms, _ = timeit(jax.jit(run_b), xq, w8, s)
        results["B int8 s8xs8 group post"] = (ms, w8.nbytes)
    if "c" in which:
        ms, _ = timeit(jax.jit(run_c), xq, w8, s_col)
        results["C int8 s8xs8 col-scale"] = (ms, w8.nbytes)
    if "d" in which:
        ms, _ = timeit(jax.jit(run_d), xlo, xhi, w4, slo, shi)
        results["D int4 int-unpack 2mm"] = (ms, w4.nbytes)
    if "e" in which:
        ms, _ = timeit(jax.jit(run_e), xqlo, xqhi, w4, sg, sg)
        results["E int4 s8 group post"] = (ms, w4.nbytes)
    if "f" in which:
        ms, _ = timeit(jax.jit(run_f), x, w4, s)
        results["F int4 bitcast grp post"] = (ms, w4.nbytes)
    if "p" in which:
        from byox_vllm_tpu.ops.quant import quant_matmul_pallas

        f = jax.jit(lambda x_, w_, s_: quant_matmul_pallas(x_, w_, s_, bits=4))
        ms, _ = timeit(f, x, w4, s)
        results["P production int4 qmm"] = (ms, w4.nbytes)
    if "ps" in which:
        from byox_vllm_tpu.ops.quant import quant_matmul_pallas

        f = jax.jit(
            lambda x_, w_, s_: quant_matmul_pallas(x_, w_, s_, bits=4, post_scale=True)
        )
        ms, _ = timeit(f, x, w4, s)
        results["PS production post-scale"] = (ms, w4.nbytes)
    if "w" in which:
        from byox_vllm_tpu.ops.quant import quant_matmul_w4a8_pallas

        f = jax.jit(lambda x_, w_, s_: quant_matmul_w4a8_pallas(x_, w_, s_))
        ms, _ = timeit(f, x, w4, s)
        results["W production w4a8 g128"] = (ms, w4.nbytes)
    if "w256" in which:
        from byox_vllm_tpu.ops.quant import quant_matmul_w4a8_pallas

        s256 = s[::2]  # [K/256, M]: same kernel, half the scale rows
        f = jax.jit(lambda x_, w_, s_: quant_matmul_w4a8_pallas(x_, w_, s_))
        ms, _ = timeit(f, x, w4, s256)
        results["W production w4a8 g256"] = (ms, w4.nbytes)
    if "w512" in which:
        from byox_vllm_tpu.ops.quant import quant_matmul_w4a8_pallas

        s512 = s[::4]
        f = jax.jit(lambda x_, w_, s_: quant_matmul_w4a8_pallas(x_, w_, s_))
        ms, _ = timeit(f, x, w4, s512)
        results["W production w4a8 g512"] = (ms, w4.nbytes)
    if "i" in which:
        ms, _ = timeit(jax.jit(run_i), xq, w4, s_col)
        results["I int4->s8 1dot col-scale"] = (ms, w4.nbytes)
    if "j" in which:
        try:
            ms, _ = timeit(jax.jit(run_j), xq, w4, s_col)
            results["J int4 direct MXU dot"] = (ms, w4.nbytes)
        except Exception as e:
            print(f"J int4 direct MXU dot: FAILED ({type(e).__name__}: {str(e)[:200]})", flush=True)
    for name, (ms, nbytes) in results.items():
        print(f"{name:28s}: {ms:7.3f} ms  {nbytes/(ms/1e3)/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
