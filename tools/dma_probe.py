"""Compile-only probes of Mosaic DMA legality for the fused decode store.

Each probe AOT-compiles (never executes) a tiny Pallas kernel exercising one
addressing pattern the fused-store redesign could use. Compile is where
Mosaic's slice/layout checks fire, so this is hang-safe: nothing runs on the
chip.

Questions:
  Q1  dynamic sublane-dim offset DMA with tile-aligned static size
      (pool.at[blk, pl.ds(woff, T), :]) — per dtype (bf16 T=8, int8 T=32)
  Q3  dynamic sublane-index vector read from a whole-array VMEM block
  Q4  int8 sublane slice of size 8 (is the requirement 8 or 32?)
  Q5  window-major pool view (S//T, T, F): dynamic leading index DMA
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, F, S = 16, 1024, 4096
HBM = pltpu.MemorySpace.HBM


def compile_only(name, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{name}: COMPILE OK", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        lines = [ln for ln in str(e).split("\n") if ln.strip()]
        key = next((ln for ln in lines if "Mosaic" in ln or "must be" in ln or "error" in ln.lower()), lines[0] if lines else "?")
        print(f"{name}: FAIL {type(e).__name__}: {key.strip()[:200]}", flush=True)
        return False


def probe_q1(dtype, tile):
    def kernel(slots_ref, pool_in, pool_out, buf, sem):
        blk = slots_ref[0] // 64
        woff = (slots_ref[0] % 64) // tile * tile
        fetch = pltpu.make_async_copy(pool_out.at[blk, pl.ds(woff, tile), :], buf, sem)
        fetch.start()
        fetch.wait()
        buf[...] = buf[...]
        put = pltpu.make_async_copy(buf, pool_out.at[blk, pl.ds(woff, tile), :], sem)
        put.start()
        put.wait()

    def fn(slots, pool):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=HBM)],
                out_specs=pl.BlockSpec(memory_space=HBM),
                scratch_shapes=[pltpu.VMEM((tile, F), dtype), pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((S // 64, 64, F), dtype),
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(slots, pool)

    slots = jnp.zeros((B,), jnp.int32)
    pool = jnp.zeros((S // 64, 64, F), dtype)
    return fn, (slots, pool)


def probe_q3():
    def kernel(slots_ref, rows_ref, out_ref):
        i = slots_ref[0]
        out_ref[...] = rows_ref[i, :][None, :]

    def fn(slots, rows):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec((B, F), lambda i, s: (0, 0))],
                out_specs=pl.BlockSpec((1, F), lambda i, s: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((1, F), jnp.bfloat16),
        )(slots, rows)

    return fn, (jnp.zeros((B,), jnp.int32), jnp.zeros((B, F), jnp.bfloat16))


def probe_q4():
    def kernel(slots_ref, pool_in, pool_out, buf, sem):
        blk = slots_ref[0] // 64
        fetch = pltpu.make_async_copy(pool_out.at[blk, pl.ds(0, 8), :], buf, sem)
        fetch.start()
        fetch.wait()

    def fn(slots, pool):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=HBM)],
                out_specs=pl.BlockSpec(memory_space=HBM),
                scratch_shapes=[pltpu.VMEM((8, F), jnp.int8), pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((S // 64, 64, F), jnp.int8),
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(slots, pool)

    return fn, (jnp.zeros((B,), jnp.int32), jnp.zeros((S // 64, 64, F), jnp.int8))


def probe_q5(dtype, tile):
    def kernel(slots_ref, pool_in, pool_out, buf, sem):
        w = slots_ref[0] // tile
        fetch = pltpu.make_async_copy(pool_out.at[w], buf, sem)
        fetch.start()
        fetch.wait()
        buf[...] = buf[...]
        put = pltpu.make_async_copy(buf, pool_out.at[w], sem)
        put.start()
        put.wait()

    def fn(slots, pool):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=HBM)],
                out_specs=pl.BlockSpec(memory_space=HBM),
                scratch_shapes=[pltpu.VMEM((tile, F), dtype), pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((S // tile, tile, F), dtype),
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(slots, pool)

    slots = jnp.zeros((B,), jnp.int32)
    pool = jnp.zeros((S // tile, tile, F), dtype)
    return fn, (slots, pool)


def main():
    results = {}
    probes = [
        ("Q1_dyn_sublane_bf16_t8", *probe_q1(jnp.bfloat16, 8)),
        ("Q1_dyn_sublane_int8_t32", *probe_q1(jnp.int8, 32)),
        ("Q1_dyn_sublane_int8_t8", *probe_q1(jnp.int8, 8)),
        ("Q3_dyn_row_read_vmem", *probe_q3()),
        ("Q4_static_int8_slice8", *probe_q4()),
        ("Q5_window_view_bf16_t8", *probe_q5(jnp.bfloat16, 8)),
        ("Q5_window_view_int8_t32", *probe_q5(jnp.int8, 32)),
    ]
    only = sys.argv[1:] or None
    for name, fn, args in probes:
        if only and not any(o in name for o in only):
            continue
        results[name] = compile_only(name, fn, *args)
    print(results)


if __name__ == "__main__":
    main()
