"""Paged KV-cache pool update (the TPU equivalent of the reference's Triton
``store_kvcache`` scatter, nanovllm/layers/attention.py:10-49).

MERGED pool layout — one array per layer, token-major flat rows:

  bf16:  [num_slots, 2*F]              row = [ K row | V row ]
  int8:  [num_slots, 2*F + 256]        row = [ K row | V row | scale bytes ]

with F = num_kv_heads * head_dim. Three hardware reasons, all measured on
v5e:

- ONE DMA per (sequence, page): the decode attention kernels fetch a page as
  a single [block_size, row_width] copy instead of three (K pool, V pool,
  scale pool). At B=128 the per-(seq, page) DMA-issue overhead dominated the
  bandwidth-bound kernel (ABLATE_r04: attention 4.9 ms vs ~3 ms traffic
  floor) — merging divides the issue count by 3.
- ONE leading-axis scatter per layer per decode step instead of three (the
  r4 ablation charged the 3-pool scatter ~1.6-2.1 ms/step at 36 layers).
  XLA aliases a donated leading-axis scatter in place; inner-axis scatters
  would copy the pool (catastrophic — r1 finding).
- a merged page view [block_size, 2F+256] = e.g. (128, 2304) is still a
  perfectly tiled VMEM block (2304 = 18 x 128 lanes).

INT8 scales: per-(token, head) symmetric, K scales in logical lanes
[0, nkv), V in [nkv, 2*nkv) of a 128-lane bf16 row (rounded to bf16 BEFORE
quantizing, so every dequant path reproduces stored values bit-identically).
The bf16 row travels inside the int8 pool as raw bytes, stored UNINTERLEAVED
(128 low bytes then 128 high bytes) so the in-kernel decode is two
contiguous lane slices + integer ops — no sub-byte shuffles:

  f32_bits = (hi & 0xff) << 24 | (lo & 0xff) << 16     (bf16 -> f32 shift)

Under tensor parallelism the global row is laid out SHARD-MAJOR: tp blocks
of [K_s | V_s | scales_s], sharded P(None, 'model'), so each shard's local
row is a self-consistent merged pool over its own nkv/tp heads.

New K/V rows are scattered at ``slot_mapping``; slot -1 marks padding and is
dropped via an out-of-bounds sentinel (negative indices would wrap; the
reference kernel skips slot==-1 the same way).

(The r3/r4 row-tiled aligned-put experiment — ``put_kv_rows`` — is DELETED:
it was gated off both rounds because XLA materialized pool copies around the
bitcast views feeding the attention custom-calls. The merged layout banks
the same store savings by cutting the scatter count instead, with no layout
bitcasts anywhere on the read path.)
"""

import jax
import jax.numpy as jnp

KV_QMAX = 127.0
# the bf16 K+V scale row occupies SCALE_LANES logical bf16 lanes = twice that
# many raw bytes inside the int8 merged row
SCALE_LANES = 128
SCALE_BYTES = 2 * SCALE_LANES


def row_width(f: int, quantized: bool) -> int:
    """Merged pool row width for K+V features ``f`` (= nkv * head_dim)."""
    return 2 * f + (SCALE_BYTES if quantized else 0)


def pool_feature_dim(pool: jnp.ndarray) -> int:
    """K (= V) feature width of a merged pool."""
    if pool.dtype == jnp.int8:
        return (pool.shape[-1] - SCALE_BYTES) // 2
    return pool.shape[-1] // 2


def is_quantized_pool(pool: jnp.ndarray) -> bool:
    return pool.dtype == jnp.int8


def encode_scale_bytes(scales: jnp.ndarray) -> jnp.ndarray:
    """bf16 [N, SCALE_LANES] -> int8 [N, 2*SCALE_LANES]: 128 low bytes then
    128 high bytes (uninterleaved for contiguous in-kernel slices)."""
    by = jax.lax.bitcast_convert_type(scales, jnp.uint8)  # [N, 128, 2] LE
    return jax.lax.bitcast_convert_type(
        jnp.concatenate([by[..., 0], by[..., 1]], axis=-1), jnp.int8
    )


def decode_scale_bytes(raw: jnp.ndarray) -> jnp.ndarray:
    """int8 [..., 2*SCALE_LANES] -> f32 [..., SCALE_LANES]. Integer ops +
    same-width bitcast only, so it lowers identically under Pallas (compiled
    and interpret) and plain XLA."""
    lo = raw[..., :SCALE_LANES].astype(jnp.int32) & 0xFF
    hi = raw[..., SCALE_LANES:].astype(jnp.int32) & 0xFF
    bits = (hi << 24) | (lo << 16)  # bf16 bits left-shifted into f32
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def quantize_kv_rows(k_new: jnp.ndarray, v_new: jnp.ndarray) -> jnp.ndarray:
    """[N, nkv, hd] float K/V rows -> merged int8 rows [N, 2*F + 256]."""
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
    sc = encode_scale_bytes(jnp.concatenate([ks, vs, pad], axis=-1))
    return jnp.concatenate([kq, vq, sc], axis=-1)


def merge_kv_rows(k_new: jnp.ndarray, v_new: jnp.ndarray, dtype) -> jnp.ndarray:
    """[N, nkv, hd] float K/V rows -> merged rows [N, 2*F] (bf16 pools)."""
    n = k_new.shape[0]
    return jnp.concatenate(
        [k_new.reshape(n, -1), v_new.reshape(n, -1)], axis=-1
    ).astype(dtype)


def write_kv(
    pool: jnp.ndarray,  # [S, 2*F] merged bf16 pool
    k_new: jnp.ndarray,  # [N, nkv, hd]
    v_new: jnp.ndarray,  # [N, nkv, hd]
    slot_mapping: jnp.ndarray,  # [N] int32, -1 = padding (dropped)
) -> jnp.ndarray:
    num_slots = pool.shape[0]
    slots = jnp.where(slot_mapping < 0, num_slots, slot_mapping)
    rows = merge_kv_rows(k_new, v_new, pool.dtype)
    return pool.at[slots].set(rows, mode="drop")


def write_kv_quant(
    pool: jnp.ndarray,  # [S, 2*F + 256] merged int8 pool
    k_new: jnp.ndarray,  # [N, nkv, hd] float
    v_new: jnp.ndarray,  # [N, nkv, hd] float
    slot_mapping: jnp.ndarray,  # [N] int32, -1 = padding (dropped)
) -> jnp.ndarray:
    """Per-(token, head) symmetric int8 quantization at cache-write time;
    one leading-axis scatter covers K, V, and the scale bytes."""
    num_slots = pool.shape[0]
    slots = jnp.where(slot_mapping < 0, num_slots, slot_mapping)
    rows = quantize_kv_rows(k_new, v_new)
    return pool.at[slots].set(rows, mode="drop")


def gather_kv(
    pool: jnp.ndarray,  # merged pool (bf16 or int8)
    block_tables: jnp.ndarray,  # [B, W] int32, -1 padding
    block_size: int,
    head_dim: int,
    out_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather per-sequence K and V from the merged pool (XLA fallback path):
    ONE row gather serves both, dequantizing when the pool is int8.

    Returns (k, v), each [B, W*block_size, nkv, hd]; padding slots gather 0.
    """
    b, w = block_tables.shape
    num_slots = pool.shape[0]
    quantized = is_quantized_pool(pool)
    f = pool_feature_dim(pool)
    nkv = f // head_dim
    offsets = jnp.arange(block_size, dtype=block_tables.dtype)
    slots = block_tables[:, :, None] * block_size + offsets[None, None, :]
    slots = jnp.where(block_tables[:, :, None] < 0, num_slots, slots).reshape(b, w * block_size)
    rows = jnp.take(pool, slots, axis=0, mode="fill", fill_value=0)  # [B, K, width]
    kk = w * block_size
    if not quantized:
        out_dtype = out_dtype or pool.dtype
        k = rows[..., :f].reshape(b, kk, nkv, head_dim).astype(out_dtype)
        v = rows[..., f : 2 * f].reshape(b, kk, nkv, head_dim).astype(out_dtype)
        return k, v
    out_dtype = out_dtype or jnp.float32
    sc = decode_scale_bytes(rows[..., 2 * f :])  # [B, K, 128] f32
    k = rows[..., :f].astype(jnp.float32).reshape(b, kk, nkv, head_dim)
    v = rows[..., f : 2 * f].astype(jnp.float32).reshape(b, kk, nkv, head_dim)
    k = k * sc[..., :nkv, None]
    v = v * sc[..., nkv : 2 * nkv, None]
    return k.astype(out_dtype), v.astype(out_dtype)


def write_kv_runs(
    pool: jnp.ndarray,  # merged pool (bf16 or int8)
    k_new: jnp.ndarray,  # [N, nkv, hd]
    v_new: jnp.ndarray,  # [N, nkv, hd]
    run_dst: jnp.ndarray,  # [R] int32: pool row of each run (block-aligned)
    run_src: jnp.ndarray,  # [R] int32: row in the flat new-KV array
    block_size: int,
) -> jnp.ndarray:
    """Prefill KV store as R block-sized dynamic-update-slices instead of a
    row scatter. A (1, width) scatter row is a sub-tile update — the TPU
    lowers it to masked read-modify-writes (~0.5 ms per layer measured);
    a block-aligned DUS is a pure aligned write, and the merged layout makes
    it ONE DUS per (sequence, block) instead of three. The host emits one
    run per (sequence, written block), padding the run list by duplicating
    run 0 (rewriting identical data is a no-op) and clamping every run to a
    full block: trailing rows spill into the same block's still-future slots,
    which are masked by context_len until their real tokens overwrite them.
    A lane with no prefill rows (data parallelism) pads with runs aimed at
    the pool's SCRATCH block — one extra block past the last real slot that
    no block table ever references (engine/model_runner.py allocates it)."""
    n = k_new.shape[0]
    rows = (
        quantize_kv_rows(k_new, v_new)
        if is_quantized_pool(pool)
        else merge_kv_rows(k_new, v_new, pool.dtype)
    )
    flat = jnp.concatenate([rows, jnp.zeros((block_size, rows.shape[1]), rows.dtype)])

    def body(i, p):
        return jax.lax.dynamic_update_slice_in_dim(
            p,
            jax.lax.dynamic_slice_in_dim(flat, run_src[i], block_size),
            run_dst[i],
            0,
        )

    return jax.lax.fori_loop(0, run_dst.shape[0], body, pool)
