"""Probe the two hardware questions behind the all-layer token-major KV
pool layout (r4 design: one KV row per (slot) spanning ALL layers):

Q1 — decode-store cost vs layout. The engine's decode step scatters new K/V
rows into per-layer pools: 36 layers x 3 pools x 128 rows ~ 3.1 ms/step
(ABLATE_r04). If XLA's leading-axis scatter cost is per-ROW (round-1
finding), then ONE scatter of 128 rows x (L*2*F) bytes into an all-layer
pool [S, L*2*F] should cost ~1/108th of that, not ~1x.

    a) per-layer: L x (k.at[slots].set, v.at[...], sc.at[...])
    b) merged kv per-layer: L x (kv.at[slots].set, sc.at[...])
    c) all-layer: ONE kv scatter [S, L*2F] + ONE scale scatter [S, L*SC]

Q2 — strided page DMA. The all-layer layout makes an attention page fetch a
STRIDED slice [bs, 1, 2F] out of [S, L, 2F] (64 chunks of 2 KiB, stride
L*2F) instead of today's contiguous [bs, 2F]. Measures effective GB/s of
double-buffered fetches, contiguous vs strided.

Run on the chip: python tools/layout_probe.py [q1|q2]
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

L = 36
F = 1024  # nkv * hd (8 * 128)
SC = 128  # scale lanes
B = 128
S = 16384  # slots in the probe pools (real pool ~60k; scatter cost is per row)
ITERS = 24


def _time_scan(make_body, carry0, iters=ITERS):
    """Chain `iters` dependent updates in ONE dispatched program (the tunnel
    memoizes identical dispatches and batches queued ones)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, xs):
        def body(c, x):
            return make_body(c, x), ()

        c, _ = jax.lax.scan(body, carry, xs)
        leaves = jax.tree.leaves(c)
        probe = sum(x[0, :8].astype(jnp.float32).sum() for x in leaves)
        return c, probe

    # sync via device_get of a tiny probe (block_until_ready does NOT block
    # through the axon tunnel); subtract RTT by marginal-iteration timing
    def timed(carry, it):
        xs = jnp.arange(it, dtype=jnp.int32)
        t0 = time.perf_counter()
        carry, probe = run(carry, xs)
        _ = jax.device_get(probe)
        return time.perf_counter() - t0, carry

    _, carry = timed(carry0, iters)  # compile + warm lo
    _, carry = timed(carry, 4 * iters)  # compile + warm hi
    deltas = []
    for _ in range(3):
        t_hi, carry = timed(carry, 4 * iters)
        t_lo, carry = timed(carry, iters)
        deltas.append(t_hi - t_lo)
    dt = sorted(deltas)[1] / (3 * iters)
    return dt, carry


def q1():
    rng = np.random.default_rng(0)
    slots = jnp.asarray(rng.choice(S, B, replace=False).astype(np.int32))
    base_k = jnp.asarray(rng.integers(-100, 100, (B, F)).astype(np.int8))
    base_sc = jnp.asarray(rng.random((B, SC)).astype(np.float32)).astype(jnp.bfloat16)

    # a) per-layer 3-pool scatters (current engine layout)
    pools_a = [
        (jnp.zeros((S, F), jnp.int8), jnp.zeros((S, F), jnp.int8),
         jnp.zeros((S, SC), jnp.bfloat16))
        for _ in range(L)
    ]

    def body_a(pools, x):
        rows = (base_k + x.astype(jnp.int8))
        out = []
        for k, v, sc in pools:
            out.append((
                k.at[slots].set(rows),
                v.at[slots].set(rows),
                sc.at[slots].set(base_sc * x.astype(jnp.bfloat16)),
            ))
        return out

    dt, _ = _time_scan(body_a, pools_a)
    print(f"Q1a per-layer 3-pool scatters ({L}x3x{B} rows): {dt*1e3:7.3f} ms/step", flush=True)

    # b) merged-kv per-layer
    pools_b = [
        (jnp.zeros((S, 2 * F), jnp.int8), jnp.zeros((S, SC), jnp.bfloat16))
        for _ in range(L)
    ]
    base_kv = jnp.concatenate([base_k, base_k], axis=1)

    def body_b(pools, x):
        rows = base_kv + x.astype(jnp.int8)
        return [
            (kv.at[slots].set(rows), sc.at[slots].set(base_sc * x.astype(jnp.bfloat16)))
            for kv, sc in pools
        ]

    dt, _ = _time_scan(body_b, pools_b)
    print(f"Q1b merged-kv per-layer scatters ({L}x2x{B} rows): {dt*1e3:7.3f} ms/step", flush=True)

    # c) all-layer single scatter
    pool_c = (
        jnp.zeros((S, L * 2 * F), jnp.int8),
        jnp.zeros((S, L * SC), jnp.bfloat16),
    )
    base_big = jnp.tile(base_kv, (1, L))
    base_scb = jnp.tile(base_sc, (1, L))

    def body_c(pools, x):
        kv, sc = pools
        return (
            kv.at[slots].set(base_big + x.astype(jnp.int8)),
            sc.at[slots].set(base_scb * x.astype(jnp.bfloat16)),
        )

    dt, _ = _time_scan(body_c, pool_c)
    mb = (B * (L * 2 * F) + B * L * SC * 2) / 1e6
    print(f"Q1c all-layer 2 scatters (2x{B} rows, {mb:.1f} MB): {dt*1e3:7.3f} ms/step", flush=True)


def _fetch_kernel(src_hbm, o_ref, buf, sem, *, strided, layer, pages):
    i = pl.program_id(0)

    def copy(j, slot):
        if strided:
            return pltpu.make_async_copy(src_hbm.at[j, :, layer], buf.at[slot], sem.at[slot])
        return pltpu.make_async_copy(src_hbm.at[j], buf.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        copy(0, 0).start()

    slot = jax.lax.rem(i, 2)

    @pl.when(i + 1 < pages)
    def _():
        copy(i + 1, 1 - slot).start()

    copy(i, slot).wait()
    o_ref[0, :] += jnp.sum(buf[slot, 0:8, 0:128].astype(jnp.float32), axis=0)


def q2():
    bs = 64
    pages = 192
    for strided in (False, True):
        if strided:
            src = jnp.zeros((pages, bs, L, 2 * F), jnp.int8)
        else:
            src = jnp.zeros((pages, bs, 2 * F), jnp.int8)

        kern = functools.partial(_fetch_kernel, strided=strided, layer=L // 2, pages=pages)
        call = pl.pallas_call(
            kern,
            grid=(pages,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, bs, 2 * F), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

        def make_chain(reps):
            @jax.jit
            def chain(src, n):
                def body(c, _):
                    return c + call(src)[0, 0], ()

                c, _ = jax.lax.scan(body, n.astype(jnp.float32), jnp.arange(reps))
                return c

            return chain

        chain, chain2 = make_chain(8), make_chain(32)
        _ = jax.device_get(chain2(src, jnp.float32(0)))  # compile hi

        _ = jax.device_get(chain(src, jnp.float32(0)))  # compile + warm
        t0 = time.perf_counter()
        _ = jax.device_get(chain(src, jnp.float32(1)))
        rtt = time.perf_counter() - t0  # 8 reps
        t0 = time.perf_counter()
        _ = jax.device_get(chain2(src, jnp.float32(2)))
        t32 = time.perf_counter() - t0  # 32 reps
        dt = (t32 - rtt) / 24
        gb = pages * bs * 2 * F / 1e9
        print(
            f"Q2 {'strided' if strided else 'contig '} page fetch: "
            f"{dt*1e3:7.3f} ms for {gb*1e3:.0f} MB -> {gb/dt:6.1f} GB/s "
            f"({dt/pages*1e6:.2f} us/page)",
            flush=True,
        )


if __name__ == "__main__":
    which = sys.argv[1:] or ["q1", "q2"]
    if "q1" in which:
        q1()
    if "q2" in which:
        q2()
