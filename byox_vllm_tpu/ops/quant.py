"""Weight-only quantization: INT8 / INT4 group-scaled storage with a fused
dequantize-matmul Pallas kernel.

No reference implementation exists to mirror (the north star adds this): the
design is TPU-first. Weights are stored as int8, or as int4 nibble-PAIRS in
an int8 carrier array: byte row r packs rows 2r (low nibble) and 2r+1 (high
nibble) in two's complement, which is exactly the in-memory layout of a
native int4 array — the kernel reinterprets the tile with a free
``pltpu.bitcast`` to int4 and lets the hardware unpack on the ``astype``,
so dequantization costs ~2 VPU passes (convert + scale) per tile.

Why the int8 carrier instead of a jnp.int4 array: device_put of sub-byte
dtypes recurses infinitely on the axon platform (device_put is itself
implemented as a jit there), so int4 arrays cannot cross a jit argument
boundary; int8 arrays can, and the bitcast inside the kernel is free.

Scales are symmetric per-(input-group, output-column). A quantized weight is
the plain pytree {"q": int8, "s": f32}; the bit width is static model
metadata (config.quantization), threaded as a Python int — never a pytree
leaf. The packed int8 layout doubles as the disk format (safetensors has no
int4).
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_GROUP = 128  # quantization group along the input (reduction) dim


def pick_group(k: int, bits: int) -> int:
    g = min(DEFAULT_GROUP, k)
    if bits == 4:
        while k % g or g % 2:
            g //= 2
        if g < 2:
            raise ValueError(f"cannot int4-group K={k}")
    else:
        while k % g:
            g //= 2
    return g


def pack_int4(q) -> np.ndarray:
    """int4-range values [..., K, M] -> int8 [..., K/2, M]: byte row r holds
    row 2r in the low nibble, row 2r+1 in the high nibble, two's complement
    (the memory layout of a native int4 array, so an in-kernel bitcast
    reinterprets it for free)."""
    q = np.asarray(q).astype(np.int8)
    *lead, k, m = q.shape
    assert k % 2 == 0
    lo = (q[..., 0::2, :] & 15).astype(np.uint8)
    hi = (q[..., 1::2, :] & 15).astype(np.uint8)
    return (lo | (hi << 4)).astype(np.int8)


def unpack_int4_np(packed) -> np.ndarray:
    """int8 carrier [..., K/2, M] -> int8 values [..., K, M] (host-side)."""
    b = np.asarray(packed).astype(np.int8)
    lo = np.left_shift(b, 4).astype(np.int8) >> 4  # sign-extended low nibble
    hi = b >> 4  # arithmetic shift: sign-extended high nibble
    *lead, kh, m = b.shape
    return np.stack([lo, hi], axis=-2).reshape(*lead, kh * 2, m)


@functools.lru_cache(maxsize=None)
def _quantize_core(bits: int, g: int):
    """Jitted quantizer shared across calls (keyed on bits/group; shapes key
    the jit cache) — per-layer random init calls this L times per weight."""
    qmax = 127.0 if bits == 8 else 7.0

    @jax.jit
    def _quantize(w):
        *lead, k, m = w.shape
        grouped = w.astype(jnp.float32).reshape(*lead, k // g, g, m)
        scales = jnp.maximum(jnp.max(jnp.abs(grouped), axis=-2) / qmax, 1e-8)
        q = jnp.clip(jnp.round(grouped / scales[..., None, :]), -qmax, qmax)
        q = q.reshape(*lead, k, m).astype(jnp.int8)
        if bits == 4:
            lo = (q[..., 0::2, :] & 15).astype(jnp.uint8)
            hi = (q[..., 1::2, :] & 15).astype(jnp.uint8)
            q = (lo | (hi << 4)).astype(jnp.int8)
        return q, scales

    return _quantize


def quantize_weight(w, bits: int = 8, group: int | None = None,
                    on_device: bool = False):
    """w [..., K, M] float -> {"q": int8 [..., K(/2), M], "s": f32 [..., K/G, M]}.

    By default computed with jax pinned to the CPU backend (multithreaded —
    the numpy version cost ~25 min for an 8B model, dominated by
    single-threaded bf16 conversions); the transient full-precision tensor
    never lands on the accelerator. Outputs are CPU-committed; callers
    device_put them. ``on_device=True`` skips the CPU pin and quantizes on
    the default backend — used by random init, which generates weights
    directly on the accelerator one layer at a time (a 2-vCPU host takes
    ~8 min per stacked 8B weight just to *generate* it).

    Quantization is deliberately TP-AGNOSTIC: a pack produced here serves at
    any tensor-parallel degree with bitwise-identical numerics. When a
    row-parallel weight's scale rows (K/G) don't divide tp at serving time,
    ``refine_scales`` splits groups exactly (scale-row repeat) — it never
    requantizes."""
    *lead, k, m = w.shape
    g = group or pick_group(k, bits)
    assert k % g == 0
    cpu = jax.devices("cpu")[0]
    _quantize = _quantize_core(bits, g)

    if on_device:
        q, scales = _quantize(jnp.asarray(w))
    else:
        with jax.default_device(cpu):
            if isinstance(w, np.ndarray):
                w = jnp.asarray(w)
            q, scales = _quantize(w)
    return {"q": q, "s": scales}


# --- folded scales (supergroup / "double quantization") --------------------
#
# The int8-MXU kernels below (W4A8/W8A8) accumulate per quantization group
# and pay a 3-pass f32 VPU epilogue (convert, scale-mul, add) on every
# [TN, TM] partial — at B=128 that VPU work costs about as much as the MXU
# dots themselves (ABLATE_r04: body 8.0 ms vs int8-MXU ideal 4.9). Folding
# removes it: per-group scales are constrained to integer multiples of ONE
# per-column super-scale, s[g, m] = m[g, m] * S[m] with m in [1, 15], so the
# kernel multiplies the int4 weights by m IN THE INTEGER DOMAIN (values
# <= 7*15 = 105 stay int8; products accumulate exactly in int32:
# 127 * 105 * K < 2^31 for any real K) and applies S once per output tile —
# ONE int8 MXU dot per k-tile, ONE epilogue per output, no per-group VPU
# work. For int8 weights (the LM head) the fold is per-channel scales
# (G = K): no multiplier needed at all.
#
# Freshly quantized packs are EXACT under the constraint (weights are
# rounded against s = m * S directly); fold_pack() converts legacy
# {"q", "s"} packs post-hoc with a bounded scale-rounding error (<= 0.5/m
# relative, only where group scales vary >15x within a column).

M_MAX = 15.0  # multiplier range: 7 * 15 = 105 keeps folded int4 values in int8


def fold_enabled(act_bits) -> bool:
    """Folded packs are the default for the int8-activation (W4A8/W8A8)
    serving mode; BYOX_NO_QMM_FOLD=1 restores the per-group kernels (A/B)."""
    return act_bits == 8 and os.environ.get("BYOX_NO_QMM_FOLD") != "1"


@functools.lru_cache(maxsize=None)
def _quantize_folded_core(bits: int, g: int):
    @jax.jit
    def _quantize(w):
        *lead, k, m = w.shape
        wf = w.astype(jnp.float32)
        if bits == 8:
            # per-channel: one scale per output column over the whole K
            s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True), 1e-8) / 127.0
            q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
            return q, s  # s == S [..., 1, M]
        grouped = wf.reshape(*lead, k // g, g, m)
        s_star = jnp.maximum(jnp.max(jnp.abs(grouped), axis=-2) / 7.0, 1e-8)
        S = jnp.max(s_star, axis=-2, keepdims=True) / M_MAX  # [..., 1, M]
        mult = jnp.clip(jnp.ceil(s_star / S - 1e-6), 1.0, M_MAX)  # integer-valued f32
        s = mult * S
        q = jnp.clip(jnp.round(grouped / s[..., :, None, :]), -7, 7)
        q = q.reshape(*lead, k, m).astype(jnp.int8)
        lo = (q[..., 0::2, :] & 15).astype(jnp.uint8)
        hi = (q[..., 1::2, :] & 15).astype(jnp.uint8)
        q = (lo | (hi << 4)).astype(jnp.int8)
        return q, mult, S

    return _quantize


def quantize_weight_folded(w, bits: int = 4, group: int | None = None,
                           on_device: bool = False) -> dict:
    """Folded-scale quantization (see block comment above).

    bits=4: {"q": int8 [..., K/2, M] nibble-packed, "m": f32 [..., K/G, M]
    integer multipliers, "S": f32 [..., 1, M]} with s = m * S exact.
    bits=8: {"q": int8 [..., K, M], "S": f32 [..., 1, M]} per-channel.
    """
    *lead, k, m = w.shape
    g = group or pick_group(k, bits)
    assert k % g == 0
    _quantize = _quantize_folded_core(bits, g)
    if on_device:
        out = _quantize(jnp.asarray(w))
    else:
        with jax.default_device(jax.devices("cpu")[0]):
            if isinstance(w, np.ndarray):
                w = jnp.asarray(w)
            out = _quantize(w)
    if bits == 8:
        q, S = out
        return {"q": q, "S": S}
    q, mult, S = out
    return {"q": q, "m": mult, "S": S}


def fold_pack(qdict: dict, bits: int) -> dict:
    """Convert a legacy {"q", "s"} pack to the folded layout post-hoc.

    The group scales are snapped to integer multiples of the column max/15;
    unlike fresh folded quantization the weights were rounded against the
    ORIGINAL scales, so this adds a bounded dequant error (relative scale
    error <= 0.5/m per group — material only where scales vary >15x within
    a column). Fresh quantization paths never take this route."""
    if "S" in qdict:
        return qdict  # already folded
    q, s = qdict["q"], jnp.asarray(qdict["s"], jnp.float32)
    if bits == 8:
        if s.shape[-2] == 1:
            return {"q": q, "S": s}
        raise ValueError(
            "cannot fold a grouped int8 pack post-hoc (multipliers would "
            "overflow int8); requantize with quantize_weight_folded"
        )
    S = jnp.max(s, axis=-2, keepdims=True) / M_MAX
    mult = jnp.clip(jnp.round(s / S), 1.0, M_MAX)
    return {"q": q, "m": mult, "S": S}


def folded_scales(w: dict, bits: int):
    """Equivalent per-group scale tensor of a folded pack (for the dense
    dequantize fallback): [..., K/G, M] (bits=4) or [..., 1, M] (bits=8)."""
    if bits == 8 or "m" not in w:
        return w["S"]
    return w["m"] * w["S"]


def refine_scales(qdict: dict, tp: int, bits: int) -> dict:
    """Split quantization groups so scale rows shard tp-ways — EXACTLY.

    A group of size G scaled by s dequantizes identically to r sub-groups of
    size G/r each scaled by the same s, so repeating every scale row r times
    is a lossless re-grouping: dequantized weights are bitwise unchanged.
    Used at serving time for row-parallel weights (K sharded across the
    'model' axis) when (K/G) % tp != 0 — which only happens for tiny test
    models (real checkpoints have K/G >= 32 at G=128). The reference has no
    analogue (its quant support is absent; TP sharding is per-rank narrowing
    at load, nanovllm/layers/linear.py:126-147).

    Folded packs ({"q", "m", "S"}): the multiplier rows refine exactly the
    same way (sub-groups share the multiplier); the per-column S is over the
    GLOBAL K and stays replicated across row shards, untouched here."""
    q = qdict["q"]
    skey = "m" if "m" in qdict else ("s" if "s" in qdict else None)
    if skey is None:  # per-channel folded int8: nothing row-grouped to refine
        return qdict
    s = qdict[skey]
    rows = s.shape[-2]
    k = q.shape[-2] * (2 if bits == 4 else 1)
    g = k // rows
    if tp <= 1 or rows % tp == 0:
        return qdict
    r = tp // math.gcd(rows, tp)
    if g % r or (bits == 4 and (g // r) % 2):
        raise ValueError(
            f"cannot refine scale groups for tp={tp}: K={k}, G={g}, "
            f"need split factor {r} (int4 requires even sub-groups)"
        )
    out = dict(qdict)
    out[skey] = jnp.repeat(jnp.asarray(s), r, axis=-2)
    return out


def _unpack_tile(raw, bits: int, interpret: bool):
    """Packed tile [TK/2, TM] int8 -> [TK, TM] f32 int4 values (row-pair
    interleave). On hardware: free bitcast + hardware nibble unpack."""
    if not interpret:
        return pltpu.bitcast(raw, jnp.int4).astype(jnp.float32)
    b = raw.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(b, 28), 28)
    hi = jax.lax.shift_right_arithmetic(jax.lax.shift_left(b, 24), 28)
    kh, tm = raw.shape
    return jnp.stack([lo, hi], axis=1).reshape(kh * 2, tm).astype(jnp.float32)


def _qmm_kernel(
    x_ref, wq_ref, s_ref, o_ref, acc_ref, *, bits, groups_per_tile, group_size, out_dtype,
    interpret, post_scale=False,
):
    k = pl.program_id(2)
    num_k = pl.num_programs(2)
    tm = wq_ref.shape[-1]

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if post_scale:
        # Dequant-light path: convert the weight tile ONCE (int4/int8 ->
        # bf16, no per-element scale multiply) and run one MXU matmul per
        # quantization group, scaling the [TN, TM] partial into the f32
        # accumulator instead. VPU cost drops from ~3 ops per weight
        # element (f32 convert, scale mul, bf16 convert) to ~1; the scale
        # lands on TN*TM*gpt partial elements (TN/group_size ~ 1x at
        # decode batch 128, and the mul fuses into the accumulate). Same
        # MXU tile count: contraction splits at group_size = 128 lanes.
        if bits == 8:
            w = wq_ref[...].astype(jnp.bfloat16)
        elif interpret:
            w = _unpack_tile(wq_ref[...], bits, interpret).astype(jnp.bfloat16)
        else:
            w = pltpu.bitcast(wq_ref[...], jnp.int4).astype(jnp.bfloat16)
        x = x_ref[...].astype(jnp.bfloat16)
        scales = s_ref[...]
        for g in range(groups_per_tile):
            rows = slice(g * group_size, (g + 1) * group_size)
            part = jax.lax.dot(
                x[:, rows], w[rows, :], preferred_element_type=jnp.float32
            )
            acc_ref[...] += part * scales[g, :][None, :]
    else:
        if bits == 8:
            w = wq_ref[...].astype(jnp.float32)  # [gpt*gsize, TM]
        else:
            w = _unpack_tile(wq_ref[...], bits, interpret)
        w = w.reshape(groups_per_tile, group_size, tm)
        # scale rows for this k-tile's groups arrive pre-blocked [gpt, TM]
        # (blocking them via the grid keeps Mosaic slices statically aligned;
        # an in-kernel pl.ds at k*gpt fails to compile when gpt % 8 != 0)
        scales = s_ref[...]
        w = (w * scales[:, None, :]).reshape(groups_per_tile * group_size, tm).astype(jnp.bfloat16)
        acc_ref[...] += jax.lax.dot(
            x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
        )

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def quant_matmul_pallas(
    x: jnp.ndarray,  # [N, K]
    wq: jnp.ndarray,  # [K, M] int8 or [K/2, M] nibble-packed int4
    scales: jnp.ndarray,  # [K/G, M] f32
    *,
    bits: int,
    interpret: bool = False,
    tile_m: int = 1024,  # measured best at 8B shapes (fewer grid steps)
    tile_k: int = 2048,
    out_dtype=None,  # default: x.dtype (f32 for the lm head: logits precision)
    post_scale: bool | None = None,  # None: read BYOX_QMM_POST_SCALE here
) -> jnp.ndarray:
    # the env flag is resolved OUTSIDE the jitted impl so the jit cache keys
    # on its value (an in-jit read bakes the first trace's value per shape,
    # silently reusing the wrong variant in A/B sweeps — ADVICE r3)
    if post_scale is None:
        post_scale = os.environ.get("BYOX_QMM_POST_SCALE", "0") == "1"
    return _quant_matmul_pallas(
        x, wq, scales, bits=bits, interpret=interpret, tile_m=tile_m,
        tile_k=tile_k, out_dtype=out_dtype, post_scale=post_scale,
    )


@functools.partial(
    jax.jit,
    static_argnames=("bits", "interpret", "tile_m", "tile_k", "out_dtype", "post_scale"),
)
def _quant_matmul_pallas(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    scales: jnp.ndarray,
    *,
    bits: int,
    interpret: bool = False,
    tile_m: int = 1024,
    tile_k: int = 2048,
    out_dtype=None,
    post_scale: bool = False,
) -> jnp.ndarray:
    n, k = x.shape
    m = wq.shape[-1]
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    groups = scales.shape[0]
    gsize = k // groups
    # k-tiles span several quantization groups: fewer grid steps (grid-step
    # overhead dominated the original one-group-per-tile layout at 8B scale)
    tk = min(tile_k, k)
    while k % tk or tk % gsize:
        tk //= 2
    gpt = tk // gsize
    if not interpret and gpt % 8:
        # Mosaic requires the scales block's sublane dim (= groups per tile)
        # to be a multiple of 8; widen the k-tile when K allows, else the
        # caller must take the dense path (tiny K only).
        if k % (8 * gsize) == 0:
            tk = 8 * gsize
            while tk * 2 <= max(tile_k, tk) and k % (tk * 2) == 0 and tk < tile_k:
                tk *= 2
            gpt = tk // gsize
        else:
            raise ValueError(f"K={k} with group {gsize} not tileable for the TPU qmm kernel")
    # joint VMEM budget: x/w/scale/out blocks are double-buffered in scoped
    # VMEM (~16 MB) and the f32 accumulator is resident. Tile the row dim
    # for prefill (thousands of tokens); shrink tk first (only grid overhead
    # grows), then tm, then tn (each extra row tile refetches all weights).
    pack_ = 1 if bits == 8 else 2
    xb = x.dtype.itemsize
    tn = n
    while tn > 2048 and tn % 2 == 0:
        tn //= 2
    tm = min(tile_m, m)
    while m % tm:
        tm //= 2

    def vmem_bytes(tn, tk, tm):
        return 2 * (
            tn * tk * xb  # x block
            + (tk // pack_) * tm  # quantized weight block
            + (tk // gsize) * tm * 4  # scale block
            + tn * tm * out_dtype.itemsize  # out block
        ) + tn * tm * 4  # accumulator scratch

    # Mosaic's true scoped-stack usage runs ~4 MB above this model (extra
    # staging copies beyond plain double-buffering), so leave headroom under
    # the 16 MB scoped-vmem limit
    budget = 9 * 1024 * 1024
    while vmem_bytes(tn, tk, tm) > budget:
        if tk >= 2 * 8 * gsize and k % (tk // 2) == 0:
            tk //= 2
        elif tm > 128 and m % (tm // 2) == 0:
            tm //= 2
        elif tn > 8 and tn % 2 == 0:
            tn //= 2
        else:
            break
    gpt = tk // gsize
    assert m % tm == 0 and k % tk == 0 and n % tn == 0
    num_n, num_m, num_k = n // tn, m // tm, k // tk
    pack = 1 if bits == 8 else 2

    return pl.pallas_call(
        functools.partial(
            _qmm_kernel, bits=bits, groups_per_tile=gpt, group_size=gsize,
            out_dtype=out_dtype, interpret=interpret, post_scale=post_scale,
        ),
        grid=(num_n, num_m, num_k),
        in_specs=[
            pl.BlockSpec((tn, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // pack, tm), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, tm), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), out_dtype),
        scratch_shapes=[pltpu.VMEM((tn, tm), jnp.float32)],
        interpret=interpret,
    )(x, wq, scales)


def dequantize(wq: jnp.ndarray, scales: jnp.ndarray, bits: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """XLA fallback / testing: materialize the dequantized weight [K, M]."""
    groups, m = scales.shape[-2], scales.shape[-1]
    if bits == 8:
        k = wq.shape[-2]
        q = wq.astype(jnp.float32)
    else:
        b = wq.astype(jnp.int32)
        lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(b, 28), 28)
        hi = jax.lax.shift_right_arithmetic(jax.lax.shift_left(b, 24), 28)
        kh = wq.shape[-2]
        k = kh * 2
        q = jnp.stack([lo, hi], axis=-2).reshape(*wq.shape[:-2], k, m).astype(jnp.float32)
    q = q.reshape(*wq.shape[:-2], groups, k // groups, m)
    scaled = q * scales[..., :, None, :]
    return scaled.reshape(*wq.shape[:-2], k, m).astype(dtype)


def quant_matmul(
    x: jnp.ndarray, w: dict, bits: int, backend: str = "auto", out_dtype=None,
    act_bits: int | None = None,
) -> jnp.ndarray:
    """Dispatch: Pallas fused dequant-matmul on TPU, XLA dequant fallback
    elsewhere. x [..., K]; returns [..., M] (in out_dtype when given).
    act_bits=8 with bits=4 selects the W4A8 int8-MXU kernel; folded packs
    ({"q", "m", "S"} / {"q", "S"}) take the folded int32-accumulation
    kernels (see the folded-scales block comment)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    on_tpu = jax.default_backend() in ("tpu", "axon")
    a8 = act_bits == 8 and bits in (4, 8)  # W4A8 / W8A8: int8-MXU path
    folded = "S" in w
    scales = folded_scales(w, bits) if folded else w["s"]
    if backend != "dense" and (backend == "pallas" or on_tpu):
        try:
            if a8 and folded:
                out = quant_matmul_folded_pallas(
                    x2, w["q"], w.get("m"), w["S"], interpret=not on_tpu,
                    out_dtype=out_dtype, bits=bits,
                )
            elif a8:
                out = quant_matmul_w4a8_pallas(
                    x2, w["q"], w["s"], interpret=not on_tpu, out_dtype=out_dtype,
                    bits=bits,
                )
            else:
                out = quant_matmul_pallas(
                    x2, w["q"], scales, bits=bits, interpret=not on_tpu, out_dtype=out_dtype
                )
        except ValueError:  # K too small to tile on hardware
            out = (x2 @ dequantize(w["q"], scales, bits, x.dtype)).astype(out_dtype or x.dtype)
    else:
        if a8:
            # exact emulation of the kernel: quantized activations times the
            # dequantized weights in f32
            x8, sx = quantize_activations(x2)
            out = (x8.astype(jnp.float32) * sx) @ dequantize(w["q"], scales, bits, jnp.float32)
        elif out_dtype is not None and jnp.dtype(out_dtype) == jnp.float32:
            out = x2.astype(jnp.float32) @ dequantize(w["q"], scales, bits, jnp.float32)
        else:
            out = x2 @ dequantize(w["q"], scales, bits, x.dtype)
    return out.reshape(*lead, -1).astype(out_dtype or x.dtype)


# --- W4A8: int8 activations on the int8 MXU path ---------------------------
#
# The bf16 qmm above is MXU-bound at decode batch sizes (the int4 weights are
# dequantized to bf16, so the matmul runs at the bf16 rate). Quantizing
# activations per-token to int8 moves the matmul to the int8 MXU (~2x rate):
# for each k-tile the kernel unpacks int4 -> int8 and accumulates PER
# QUANTIZATION GROUP (the int8 product needs one weight scale per
# contraction): acc_f32 += int32_dot(x8_g, w8_g) * w_scale[g, col]. The
# per-token activation scale factors out of every group and is applied once
# at the end: out = acc * sx[row].


def quantize_activations(x: jnp.ndarray):
    """[N, K] float -> (x8 [N, K] int8, sx [N, 1] f32) per-row symmetric."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return x8, sx


def _unpack_tile_i8(raw, interpret: bool):
    """Packed int4 tile [TK/2, TM] -> [TK, TM] int8 values."""
    if not interpret:
        return pltpu.bitcast(raw, jnp.int4).astype(jnp.int8)
    b = raw.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(b, 28), 28)
    hi = jax.lax.shift_right_arithmetic(jax.lax.shift_left(b, 24), 28)
    kh, tm = raw.shape
    return jnp.stack([lo, hi], axis=1).reshape(kh * 2, tm).astype(jnp.int8)


def _qmm_w8a8_kernel(
    x_ref,  # [TN, TK] int8
    sx_ref,  # [TN, 1] f32
    wq_ref,  # [TK, TM] int8
    s_ref,  # [gpt, TM] f32 weight scales
    o_ref,  # [TN, TM]
    acc_ref,  # [TN, TM] f32
    *,
    groups_per_tile,
    group_size,
    out_dtype,
):
    """W8A8: int8 weights on the int8 MXU (the LM-head fast path — the head
    is int8-quantized and streams fully every decode step; the bf16-MXU
    dequant path left ~2x MXU rate on the table, ABLATE_r04)."""
    k = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = wq_ref[...]
    scales = s_ref[...]
    acc = acc_ref[...]
    for g in range(groups_per_tile):
        xg = x_ref[:, g * group_size : (g + 1) * group_size]
        wg = w8[g * group_size : (g + 1) * group_size, :]
        s32 = jax.lax.dot(xg, wg, preferred_element_type=jnp.int32)
        acc = acc + s32.astype(jnp.float32) * scales[g : g + 1, :]
    acc_ref[...] = acc

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * sx_ref[...]).astype(out_dtype)


def _qmm_w4a8_kernel(
    x_ref,  # [TN, TK] int8
    sx_ref,  # [TN, 1] f32
    wq_ref,  # [TK/2, TM] packed int4
    s_ref,  # [gpt, TM] f32 weight scales
    o_ref,  # [TN, TM]
    acc_ref,  # [TN, TM] f32
    *,
    groups_per_tile,
    group_size,
    out_dtype,
    interpret,
):
    k = pl.program_id(2)
    num_k = pl.num_programs(2)
    tm = wq_ref.shape[-1]

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = _unpack_tile_i8(wq_ref[...], interpret)  # [TK, TM] int8
    scales = s_ref[...]  # [gpt, TM] f32
    acc = acc_ref[...]
    for g in range(groups_per_tile):
        xg = x_ref[:, g * group_size : (g + 1) * group_size]  # [TN, gs] int8
        wg = w8[g * group_size : (g + 1) * group_size, :]  # [gs, TM] int8
        s32 = jax.lax.dot(xg, wg, preferred_element_type=jnp.int32)
        acc = acc + s32.astype(jnp.float32) * scales[g : g + 1, :]
    acc_ref[...] = acc

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * sx_ref[...]).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "tile_m", "tile_k", "out_dtype", "bits")
)
def quant_matmul_w4a8_pallas(
    x: jnp.ndarray,  # [N, K] float (quantized per-row inside)
    wq: jnp.ndarray,  # [K/2, M] nibble-packed int4 (bits=4) | [K, M] int8 (bits=8)
    scales: jnp.ndarray,  # [K/G, M] f32
    *,
    interpret: bool = False,
    tile_m: int = 1024,
    tile_k: int = 2048,
    out_dtype=None,
    bits: int = 4,  # weight bits: 4 (nibble unpack) or 8 (W8A8, no unpack)
) -> jnp.ndarray:
    n, k = x.shape
    m = wq.shape[-1]
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    groups = scales.shape[0]
    gsize = k // groups
    x8, sx = quantize_activations(x)

    tk = min(tile_k, k)
    while k % tk or tk % gsize:
        tk //= 2
    gpt = tk // gsize
    if not interpret and gpt % 8:
        if k % (8 * gsize) == 0:
            tk = 8 * gsize
            while tk * 2 <= max(tile_k, tk) and k % (tk * 2) == 0 and tk < tile_k:
                tk *= 2
            gpt = tk // gsize
        else:
            raise ValueError(f"K={k} with group {gsize} not tileable for the TPU w4a8 kernel")
    pack = 2 if bits == 4 else 1
    tn = n
    while tn > 2048 and tn % 2 == 0:
        tn //= 2
    tm = min(tile_m, m)
    while m % tm:
        tm //= 2

    def vmem_bytes(tn, tk, tm):
        return 2 * (
            tn * tk  # x8 block
            + (tk // pack) * tm  # (packed) weights
            + (tk // gsize) * tm * 4  # scales
            + tn * tm * out_dtype.itemsize  # out
            + tn * 4  # sx
        ) + tn * tm * 4  # accumulator

    budget = 9 * 1024 * 1024
    while vmem_bytes(tn, tk, tm) > budget:
        if tk >= 2 * 8 * gsize and k % (tk // 2) == 0:
            tk //= 2
        elif tm > 128 and m % (tm // 2) == 0:
            tm //= 2
        elif tn > 8 and tn % 2 == 0:
            tn //= 2
        else:
            break
    gpt = tk // gsize
    assert m % tm == 0 and k % tk == 0 and n % tn == 0
    num_n, num_m, num_k = n // tn, m // tm, k // tk

    if bits == 8:
        kern = functools.partial(
            _qmm_w8a8_kernel, groups_per_tile=gpt, group_size=gsize,
            out_dtype=out_dtype,
        )
    else:
        kern = functools.partial(
            _qmm_w4a8_kernel, groups_per_tile=gpt, group_size=gsize,
            out_dtype=out_dtype, interpret=interpret,
        )
    return pl.pallas_call(
        kern,
        grid=(num_n, num_m, num_k),
        in_specs=[
            pl.BlockSpec((tn, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // pack, tm), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, tm), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), out_dtype),
        scratch_shapes=[pltpu.VMEM((tn, tm), jnp.float32)],
        interpret=interpret,
    )(x8, sx, wq, scales)


# --- folded-scale kernels: one int8 dot per k-tile, int32 accumulation ------


def _qmm_folded4_kernel(
    x_ref,  # [TN, TK] int8
    sx_ref,  # [TN, 1] f32
    wq_ref,  # [TK/2, TM] packed int4
    m_ref,  # [gpt, TM] f32 integer multipliers
    S_ref,  # [1, TM] f32 per-column super-scale
    o_ref,  # [TN, TM]
    acc_ref,  # [TN, TM] int32
    *,
    groups_per_tile,
    group_size,
    out_dtype,
    interpret,
    fold_mode,  # "onedot" | "grouped"
):
    k = pl.program_id(2)
    num_k = pl.num_programs(2)
    tm = wq_ref.shape[-1]

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if fold_mode == "onedot":
        # Fold the multipliers into the weights, ONE int8 dot per k-tile.
        # Mosaic has no native int8 vector multiply (arith.muli on i8 fails
        # to legalize), so the multiply runs in i32 and repacks to i8 for
        # the MXU: unpack -> mul -> pack, ~3 VPU passes over [TK, TM], vs
        # 3 f32 passes over gpt*[TN, TM] (= the same element count at
        # TN = group_size) for the per-group epilogue — the win is the MXU
        # running one deep dot instead of gpt shallow ones.
        if interpret:
            w32 = _unpack_tile(wq_ref[...], 4, interpret).astype(jnp.int32)
        else:
            w32 = pltpu.bitcast(wq_ref[...], jnp.int4).astype(jnp.int32)
        mi = m_ref[...].astype(jnp.int32)  # [gpt, TM], values 1..15
        w8 = (
            (w32.reshape(groups_per_tile, group_size, tm) * mi[:, None, :])
            .reshape(groups_per_tile * group_size, tm)
            .astype(jnp.int8)  # +-105: exact
        )
        acc_ref[...] += jax.lax.dot(
            x_ref[...], w8, preferred_element_type=jnp.int32
        )
    else:
        # Per-group int8 dots with INTEGER partial scaling: the [TN, TM]
        # partial scales by the (integer) multiplier in i32 — 2 native VPU
        # passes per group instead of the 3 f32 passes (convert, mul, add)
        # of the unfolded kernel; the f32 epilogue runs once at the end.
        w8 = _unpack_tile_i8(wq_ref[...], interpret)  # [TK, TM] int8
        mi = m_ref[...].astype(jnp.int32)  # [gpt, TM]
        acc = acc_ref[...]
        for g in range(groups_per_tile):
            xg = x_ref[:, g * group_size : (g + 1) * group_size]
            wg = w8[g * group_size : (g + 1) * group_size, :]
            s32 = jax.lax.dot(xg, wg, preferred_element_type=jnp.int32)
            acc = acc + s32 * mi[g : g + 1, :]
        acc_ref[...] = acc

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * S_ref[...] * sx_ref[...]
        ).astype(out_dtype)


def _qmm_folded8_kernel(
    x_ref,  # [TN, TK] int8
    sx_ref,  # [TN, 1] f32
    wq_ref,  # [TK, TM] int8
    S_ref,  # [1, TM] f32 per-channel scale
    o_ref,  # [TN, TM]
    acc_ref,  # [TN, TM] int32
    *,
    out_dtype,
):
    """Per-channel W8A8 (the LM head): no groups at all — int8 dots
    accumulate exactly in int32 across every k-tile, one epilogue."""
    k = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[...], wq_ref[...], preferred_element_type=jnp.int32
    )

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * S_ref[...] * sx_ref[...]
        ).astype(out_dtype)


def quant_matmul_folded_pallas(
    x, wq, mult, S, *, interpret=False, tile_m=1024, tile_k=None,
    out_dtype=None, bits=4, fold_mode=None,
):
    # k-tile depth by row count (measured, v5e): at decode rows (n=128)
    # tk=4096 wins — 31.8 vs 34.1 us at 4096x8192, 82.0 vs 94.6 at
    # 4096x24576, 47.2 vs 49.7 at 12288x4096 (deeper k-tiles cut
    # accumulator revisits) — while at prefill rows (n=2048) the same
    # setting loses (508.8 vs 484.9 us: the VMEM budget forces a worse
    # shrink path once the x-tile dominates), so prefill keeps tk=2048.
    if tile_k is None:
        tile_k = 4096 if x.shape[0] <= 512 else 2048
    # env resolved OUTSIDE the jit so A/B sweeps rekey (ADVICE r3 pattern).
    # "grouped" measured best on v5e at BOTH serving row counts: decode
    # (TN=128) 34.2 vs 39.5 us onedot at the 4096x8192 body shape, prefill
    # (TN=2048) 484.9 vs 509.2 us — the per-group i32 partial scaling stays
    # off the critical path at either shape, while onedot's i32
    # unpack/mul/repack sandwich (Mosaic has no native int8 vector multiply)
    # costs ~3 VPU passes over [TK, TM] regardless of TN.
    if fold_mode is None:
        fold_mode = os.environ.get("BYOX_FOLD_MODE", "grouped")
    return _quant_matmul_folded_pallas(
        x, wq, mult, S, interpret=interpret, tile_m=tile_m, tile_k=tile_k,
        out_dtype=out_dtype, bits=bits, fold_mode=fold_mode,
    )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "tile_m", "tile_k", "out_dtype", "bits", "fold_mode"),
)
def _quant_matmul_folded_pallas(
    x: jnp.ndarray,  # [N, K] float (quantized per-row inside)
    wq: jnp.ndarray,  # [K/2, M] packed int4 (bits=4) | [K, M] int8 (bits=8)
    mult: jnp.ndarray | None,  # [K/G, M] f32 multipliers (bits=4) | None
    S: jnp.ndarray,  # [1, M] f32 super/per-channel scale
    *,
    interpret: bool = False,
    tile_m: int = 1024,
    tile_k: int = 2048,
    out_dtype=None,
    bits: int = 4,
    fold_mode: str = "onedot",
) -> jnp.ndarray:
    n, k = x.shape
    m = wq.shape[-1]
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    # int32 accumulation across the whole K is exact while |x|*|w|*K < 2^31
    assert k * 127 * (105 if bits == 4 else 127) < 2**31, k
    x8, sx = quantize_activations(x)

    tk = min(tile_k, k)
    if bits == 4:
        groups = mult.shape[0]
        gsize = k // groups
        while k % tk or tk % gsize:
            tk //= 2
        gpt = tk // gsize
        if not interpret and gpt % 8:
            if k % (8 * gsize) == 0:
                tk = 8 * gsize
                while tk * 2 <= max(tile_k, tk) and k % (tk * 2) == 0 and tk < tile_k:
                    tk *= 2
                gpt = tk // gsize
            else:
                raise ValueError(
                    f"K={k} with group {gsize} not tileable for the folded qmm kernel"
                )
    else:
        gsize, gpt = k, 1
        while k % tk or (not interpret and tk % 256):
            tk //= 2
        if tk < 256 and not interpret:
            raise ValueError(f"K={k} not tileable for the folded w8a8 kernel")
    pack = 2 if bits == 4 else 1
    tn = n
    while tn > 2048 and tn % 2 == 0:
        tn //= 2
    tm = min(tile_m, m)
    while m % tm:
        tm //= 2

    def vmem_bytes(tn, tk, tm):
        return 2 * (
            tn * tk  # x8 block
            + (tk // pack) * tm  # (packed) weights
            + (0 if bits == 8 else (tk // gsize) * tm * 4)  # multipliers
            + tm * 4  # S
            + tn * tm * out_dtype.itemsize  # out
            + tn * 4  # sx
        ) + tn * tm * 4  # int32 accumulator

    budget = 9 * 1024 * 1024
    while vmem_bytes(tn, tk, tm) > budget:
        if bits == 4 and tk >= 2 * 8 * gsize and k % (tk // 2) == 0:
            tk //= 2
        elif bits == 8 and tk >= 512 and k % (tk // 2) == 0:
            tk //= 2
        elif tm > 128 and m % (tm // 2) == 0:
            tm //= 2
        elif tn > 8 and tn % 2 == 0:
            tn //= 2
        else:
            break
    gpt = tk // gsize if bits == 4 else 1
    assert m % tm == 0 and k % tk == 0 and n % tn == 0
    num_n, num_m, num_k = n // tn, m // tm, k // tk

    x_spec = pl.BlockSpec((tn, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM)
    sx_spec = pl.BlockSpec((tn, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((tk // pack, tm), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM)
    S_spec = pl.BlockSpec((1, tm), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tn, tm), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM)

    if bits == 8:
        return pl.pallas_call(
            functools.partial(_qmm_folded8_kernel, out_dtype=out_dtype),
            grid=(num_n, num_m, num_k),
            in_specs=[x_spec, sx_spec, w_spec, S_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n, m), out_dtype),
            scratch_shapes=[pltpu.VMEM((tn, tm), jnp.int32)],
            interpret=interpret,
        )(x8, sx, wq, S)
    m_spec = pl.BlockSpec((gpt, tm), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _qmm_folded4_kernel, groups_per_tile=gpt, group_size=gsize,
            out_dtype=out_dtype, interpret=interpret, fold_mode=fold_mode,
        ),
        grid=(num_n, num_m, num_k),
        in_specs=[x_spec, sx_spec, w_spec, m_spec, S_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, m), out_dtype),
        scratch_shapes=[pltpu.VMEM((tn, tm), jnp.int32)],
        interpret=interpret,
    )(x8, sx, wq, mult, S)
