"""Paged KV-cache pool update (the TPU equivalent of the reference's Triton
``store_kvcache`` scatter, nanovllm/layers/attention.py:10-49).

Pool layout is token-major flat rows: one layer holds K and V as
``[num_slots, num_kv_heads * head_dim]`` with slot = block_id * block_size +
offset. Two hardware reasons, both measured on v5e:

- the per-step store must be a LEADING-axis scatter: XLA aliases a donated
  leading-axis scatter in place (~3 ms regardless of pool size), while a
  scatter on an inner axis silently copies the whole pool every step
  (~40 ms/6.5 GiB — catastrophic for serving)
- each token's K row is one contiguous 2 KiB transfer, and a page view
  ``[block_size, nkv*hd]`` = (64, 1024) is a perfectly tiled VMEM block for
  the Pallas paged-attention kernel (per-head slices are static lane slices).

New K/V rows are scattered at ``slot_mapping``; slot -1 marks padding and is
dropped via an out-of-bounds sentinel (negative indices would wrap; the
reference kernel skips slot==-1 the same way).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _put_rows_kernel(slots_ref, *refs, num_rows: int, pools: int, group: int):
    """Issue one aligned 8-sublane DMA put per (row, pool), then drain.

    refs = [src_0..src_{pools-1} (ANY [N*8, F/8]), pool-input refs (unused —
    they alias the outputs), dst_0..dst_{pools-1} (ANY [S*8, F/8], aliased
    outputs), sem (DMA (pools,))]. Row i of pool p goes to slot
    slots_ref[i]; slot -1 (padding) is skipped. All copies to pool p share
    one counting semaphore: every start is matched by a wait before the
    grid step ends."""
    g = pl.program_id(0)
    srcs = refs[:pools]
    dsts = refs[2 * pools : 3 * pools]  # the aliased OUTPUT refs
    sem = refs[3 * pools]

    def copy(p, i, slot):
        return pltpu.make_async_copy(
            srcs[p].at[pl.ds(i * 8, 8)], dsts[p].at[pl.ds(slot * 8, 8)], sem.at[p]
        )

    def each(fn):
        for j in range(group):  # static unroll within the grid step
            i = g * group + j

            @pl.when((i < num_rows) & (slots_ref[jnp.minimum(i, num_rows - 1)] >= 0))
            def _(i=i):
                slot = slots_ref[i]
                for p in range(pools):
                    fn(p, i, slot)

    each(lambda p, i, slot: copy(p, i, slot).start())
    each(lambda p, i, slot: copy(p, i, slot).wait())


def put_kv_rows(pools, rows, slot_mapping, *, interpret: bool = False):
    """Scatter one new row per token into each ROW-TILED pool via aligned
    DMA puts. NOT jitted on purpose: a nested jit boundary around the
    aliased pallas_call defeats XLA's in-place analysis and the pools get
    copied (engine-measured +400 us/layer); callers are always inside the
    step program's jit already.

    ``pools``: tuple of [S*8, F/8] arrays in the row-tiled layout (token
    slot s = sublane rows 8s..8s+7; see ``row_tiled``). ``rows``: matching
    tuple of [N, F] flat rows. ``slot_mapping`` [N] int32, -1 = padding
    (skipped). Each put writes a whole (8, F/8)-row window — a pure aligned
    write: no read-modify-write, unlike both the XLA row scatter (~8 GB/s
    effective, tools/layout_probe.py Q1) and the deleted fused-store RMW
    windows. The pools must arrive in the tiled shape: reshaping [S, F]
    pools at the call site BREAKS XLA's in-place aliasing (measured 769 us
    vs 12.6 us per 36-layer-equivalent store — the pools get copied).
    Measured on chip: 12.6 us per 2-pool 128-row store vs the scatter's
    45.3 us, bit-identical results for int8 and bf16."""
    n = rows[0].shape[0]
    p = len(pools)
    srcs = [
        r.astype(pool.dtype).reshape(n * 8, pool.shape[1])
        for pool, r in zip(pools, rows)
    ]
    aliases = {1 + p + idx: idx for idx in range(p)}
    group = min(32, n)  # rows per grid step: bounds in-flight DMAs per step
    kernel = functools.partial(_put_rows_kernel, num_rows=n, pools=p, group=group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(-(-n // group),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * p),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * p,
        scratch_shapes=[pltpu.SemaphoreType.DMA((p,))],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in pools],
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(slot_mapping.astype(jnp.int32), *srcs, *pools)
    return tuple(outs)


def can_row_tile(f: int) -> bool:
    """True when a pool row of F lanes is a whole number of (8, 128) tiles
    in the row-tiled view [S*8, F/8] — the aligned-put granule."""
    return f % 8 == 0 and (f // 8) % 128 == 0


def is_row_tiled(pool, f: int) -> bool:
    """Whether this pool array is stored row-tiled ([S*8, F/8]) rather than
    flat ([S, F]). Shape-based: the two layouts never collide because the
    tiled lane count F/8 != F."""
    return pool.shape[1] != f


def flat_view(pool, f: int):
    """[S*8, F/8] row-tiled pool -> [S, F] flat view for READ paths
    (attention page fetches, gathers). Free for reads; never feed the
    result to an aliased write (see put_kv_rows)."""
    return pool.reshape(-1, f) if is_row_tiled(pool, f) else pool


def write_kv(
    k_pool: jnp.ndarray,  # [S, nkv*hd]
    v_pool: jnp.ndarray,  # [S, nkv*hd]
    k_new: jnp.ndarray,  # [N, nkv, hd]
    v_new: jnp.ndarray,  # [N, nkv, hd]
    slot_mapping: jnp.ndarray,  # [N] int32, -1 = padding (dropped)
):
    n, nkv, hd = k_new.shape
    if is_row_tiled(k_pool, nkv * hd):
        # aligned DMA puts into the row-tiled pool: the XLA row scatter
        # runs at ~8 GB/s effective (per-row RMW; tools/layout_probe.py)
        return put_kv_rows(
            (k_pool, v_pool),
            (k_new.reshape(n, -1), v_new.reshape(n, -1)),
            slot_mapping,
            interpret=jax.default_backend() not in ("tpu", "axon"),
        )
    num_slots = k_pool.shape[0]
    slots = jnp.where(slot_mapping < 0, num_slots, slot_mapping)
    k_pool = k_pool.at[slots].set(k_new.reshape(n, -1).astype(k_pool.dtype), mode="drop")
    v_pool = v_pool.at[slots].set(v_new.reshape(n, -1).astype(v_pool.dtype), mode="drop")
    return k_pool, v_pool


def gather_kv(pool: jnp.ndarray, block_tables: jnp.ndarray, block_size: int, head_dim: int) -> jnp.ndarray:
    """Gather per-sequence K or V from the pool (XLA fallback path).

    pool [S, nkv*hd]; block_tables [B, W] (-1 = padding) ->
    [B, W * block_size, nkv, hd]; padding slots gather zeros.
    """
    b, w = block_tables.shape
    num_slots = pool.shape[0]
    nkv = pool.shape[1] // head_dim
    offsets = jnp.arange(block_size, dtype=block_tables.dtype)
    slots = block_tables[:, :, None] * block_size + offsets[None, None, :]
    # padding blocks (-1) -> out-of-bounds sentinel (negatives would wrap)
    slots = jnp.where(block_tables[:, :, None] < 0, num_slots, slots).reshape(b, w * block_size)
    gathered = jnp.take(pool, slots, axis=0, mode="fill", fill_value=0)  # [B, K, nkv*hd]
    return gathered.reshape(b, w * block_size, nkv, head_dim)


# --- INT8 KV cache (north-star option: halves decode attention traffic) ----

KV_QMAX = 127.0
# K and V scales share one [S, SCALE_LANES] bf16 pool row per slot: K scales
# in lanes [0, nkv), V scales in [nkv, 2*nkv), zero elsewhere. One row = one
# 128-lane tile, so (a) the write is a single full-row leading-axis scatter
# (in-place, like the data pools) and (b) the Pallas kernels can DMA a page
# of scales as an aligned [block_size, 128] tile — Mosaic rejects manual
# DMAs whose lane dim isn't 128-aligned, which rules out an [S, nkv] layout
# — and extract per-head rows with a one-hot MXU matmul instead of lane
# slicing. bf16 costs 256 B/slot (12.5% of the int8 K+V payload) vs 512 B
# for f32; the quantizer rounds the scale to bf16 BEFORE quantizing so the
# kernel and the XLA fallback dequantize bit-identically.
SCALE_LANES = 128


def quantize_kv_rows(k_new: jnp.ndarray, v_new: jnp.ndarray):
    """[N, nkv, hd] float K/V rows -> (kq [N, nkv*hd] int8, vq int8,
    scale_rows [N, SCALE_LANES] bf16) in the unified pool layout. The scale
    is rounded to bf16 BEFORE quantizing so every dequant path (kernel, XLA
    fallback) reproduces the stored values bit-identically."""
    n, nkv, hd = k_new.shape
    assert 2 * nkv <= SCALE_LANES, f"nkv={nkv} too large for the scale row"

    def quantize(rows):
        rows = rows.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(rows), axis=-1), 1e-8) / KV_QMAX  # [N, nkv]
        scale = scale.astype(jnp.bfloat16)
        q = jnp.clip(jnp.round(rows / scale.astype(jnp.float32)[..., None]), -KV_QMAX, KV_QMAX)
        return q.reshape(n, nkv * hd).astype(jnp.int8), scale

    kq, ks = quantize(k_new)
    vq, vs = quantize(v_new)
    pad = jnp.zeros((n, SCALE_LANES - 2 * nkv), jnp.bfloat16)
    return kq, vq, jnp.concatenate([ks, vs, pad], axis=-1)


def write_kv_quant(
    k_pool: jnp.ndarray,  # [S, nkv*hd] int8
    v_pool: jnp.ndarray,  # [S, nkv*hd] int8
    kv_scale: jnp.ndarray,  # [S, SCALE_LANES] bf16 (see layout above)
    k_new: jnp.ndarray,  # [N, nkv, hd] float
    v_new: jnp.ndarray,  # [N, nkv, hd] float
    slot_mapping: jnp.ndarray,  # [N] int32, -1 = padding (dropped)
):
    """Per-(token, head) symmetric int8 quantization at cache-write time.
    K/V rows go via aligned DMA puts on TPU (see write_kv); the narrow scale
    rows (1 sublane each — below the put granule) stay a leading-axis
    scatter (in-place, see module docstring)."""
    n, nkv, hd = k_new.shape
    num_slots = kv_scale.shape[0]
    slots = jnp.where(slot_mapping < 0, num_slots, slot_mapping)
    kq, vq, scale_rows = quantize_kv_rows(k_new, v_new)
    if is_row_tiled(k_pool, nkv * hd):
        k_pool, v_pool = put_kv_rows(
            (k_pool, v_pool), (kq, vq), slot_mapping,
            interpret=jax.default_backend() not in ("tpu", "axon"),
        )
    else:
        k_pool = k_pool.at[slots].set(kq, mode="drop")
        v_pool = v_pool.at[slots].set(vq, mode="drop")
    kv_scale = kv_scale.at[slots].set(scale_rows, mode="drop")
    return k_pool, v_pool, kv_scale


def gather_kv_quant(
    pool: jnp.ndarray,  # [S, nkv*hd] int8
    kv_scale: jnp.ndarray,  # [S, SCALE_LANES] bf16
    lane_offset: int,  # 0 for K, nkv for V
    block_tables: jnp.ndarray,
    block_size: int,
    head_dim: int,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Dequantizing gather (XLA fallback path) -> [B, K, nkv, hd] float."""
    b, w = block_tables.shape
    num_slots = pool.shape[0]
    nkv = pool.shape[1] // head_dim
    offsets = jnp.arange(block_size, dtype=block_tables.dtype)
    slots = block_tables[:, :, None] * block_size + offsets[None, None, :]
    slots = jnp.where(block_tables[:, :, None] < 0, num_slots, slots).reshape(b * w * block_size)
    rows = jnp.take(pool, slots, axis=0, mode="fill", fill_value=0)
    scales = jnp.take(
        kv_scale[:, lane_offset : lane_offset + nkv], slots, axis=0, mode="fill", fill_value=0
    ).astype(jnp.float32)
    deq = rows.reshape(-1, nkv, head_dim).astype(jnp.float32) * scales[..., None]
    return deq.reshape(b, w * block_size, nkv, head_dim).astype(out_dtype)


def write_kv_runs(
    k_pool: jnp.ndarray,  # [S, nkv*hd]
    v_pool: jnp.ndarray,  # [S, nkv*hd]
    k_new: jnp.ndarray,  # [N, nkv, hd]
    v_new: jnp.ndarray,  # [N, nkv, hd]
    run_dst: jnp.ndarray,  # [R] int32: pool row of each run (block-aligned)
    run_src: jnp.ndarray,  # [R] int32: row in the flat new-KV array
    block_size: int,
):
    """Prefill KV store as R block-sized dynamic-update-slices instead of a
    row scatter. A (1, nkv*hd) scatter row is a sub-tile update — the TPU
    lowers it to masked read-modify-writes (~0.5 ms per layer measured);
    a block-aligned 64-row DUS is a pure aligned write. The host emits one
    run per (sequence, written block), padding the run list by duplicating
    run 0 (rewriting identical data is a no-op) and clamping every run to a
    full block: trailing rows spill into the same block's still-future slots,
    which are masked by context_len until their real tokens overwrite them.
    A lane with no prefill rows (data parallelism) pads with runs aimed at
    the pool's SCRATCH block — one extra block past the last real slot that
    no block table ever references (engine/model_runner.py allocates it).

    Row-tiled pools ([S*8, F/8], see ``row_tiled``): the same DUS runs with
    every row index and length scaled by 8 — a block-aligned run stays a
    pure aligned write in either layout."""
    n = k_new.shape[0]
    nf = k_new.shape[-2] * k_new.shape[-1] if k_new.ndim == 3 else k_new.shape[-1]
    tiled = is_row_tiled(k_pool, nf)
    r = 8 if tiled else 1
    f = k_pool.shape[1]
    bs = block_size * r

    def prep(x):
        return jnp.concatenate(
            [x.reshape(n * r, f), jnp.zeros((bs, f), x.dtype)]
        )

    kf = prep(k_new.astype(k_pool.dtype))
    vf = prep(v_new.astype(v_pool.dtype))

    def body(i, pools):
        kp, vp = pools
        kp = jax.lax.dynamic_update_slice_in_dim(
            kp, jax.lax.dynamic_slice_in_dim(kf, run_src[i] * r, bs), run_dst[i] * r, 0
        )
        vp = jax.lax.dynamic_update_slice_in_dim(
            vp, jax.lax.dynamic_slice_in_dim(vf, run_src[i] * r, bs), run_dst[i] * r, 0
        )
        return kp, vp

    return jax.lax.fori_loop(0, run_dst.shape[0], body, (k_pool, v_pool))


def write_kv_runs_quant(
    k_pool: jnp.ndarray,  # [S, nkv*hd] int8
    v_pool: jnp.ndarray,  # [S, nkv*hd] int8
    kv_scale: jnp.ndarray,  # [S, SCALE_LANES] bf16
    k_new: jnp.ndarray,  # [N, nkv, hd] float
    v_new: jnp.ndarray,  # [N, nkv, hd] float
    run_dst: jnp.ndarray,  # [R] int32 (block-aligned pool rows)
    run_src: jnp.ndarray,  # [R] int32
    block_size: int,
):
    """INT8 variant of write_kv_runs: quantize all rows once, then store
    K/V/scale via block-sized dynamic-update-slices. Replaces the prefill
    row scatter, which at 8B scale cost ~0.5 ms per layer (row-serial on
    TPU; ~50 ms of a ~300 ms prefill step across 36 layers x 3 pools).
    Handles row-tiled K/V pools like write_kv_runs; the scale pool is
    always flat."""
    n, nkv, hd = k_new.shape
    tiled = is_row_tiled(k_pool, nkv * hd)
    r = 8 if tiled else 1
    f = k_pool.shape[1]
    bs = block_size * r
    kq, vq, sc_rows = quantize_kv_rows(k_new, v_new)
    kf = jnp.concatenate([kq.reshape(n * r, f), jnp.zeros((bs, f), kq.dtype)])
    vf = jnp.concatenate([vq.reshape(n * r, f), jnp.zeros((bs, f), vq.dtype)])
    sf = jnp.concatenate([sc_rows, jnp.zeros((block_size, SCALE_LANES), sc_rows.dtype)])

    def body(i, pools):
        kp, vp, sp = pools
        src, dst = run_src[i], run_dst[i]
        kp = jax.lax.dynamic_update_slice_in_dim(
            kp, jax.lax.dynamic_slice_in_dim(kf, src * r, bs), dst * r, 0
        )
        vp = jax.lax.dynamic_update_slice_in_dim(
            vp, jax.lax.dynamic_slice_in_dim(vf, src * r, bs), dst * r, 0
        )
        sp = jax.lax.dynamic_update_slice_in_dim(
            sp, jax.lax.dynamic_slice_in_dim(sf, src, block_size), dst, 0
        )
        return kp, vp, sp

    return jax.lax.fori_loop(0, run_dst.shape[0], body, (k_pool, v_pool, kv_scale))
