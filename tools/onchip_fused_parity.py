"""On-chip numeric parity of the fused-store decode kernel vs the scatter
path (float32 and int8+scales), asserting the pools end BIT-IDENTICAL — the
direct check that the tile-window RMW store writes exactly the right bytes
at the right rows on real hardware (run from the repo root on TPU).

Attention outputs compare at 5e-3: on-chip f32 matmuls are bf16 passes, so
two correct implementations differ at ~1e-3. Geometry covers window edges
(block-boundary slots, full blocks, minimal pool) under the engine contract
pool_ctx >= 1 (prefill always leaves >= 1 pool row before the first decode
store; pool_ctx == 0 with a live tail renders as a padding row by design).
"""

import numpy as np
import jax.numpy as jnp
from byox_vllm_tpu.ops.attention import decode_attention_store
from byox_vllm_tpu.ops.kv_cache import SCALE_LANES, write_kv, write_kv_quant

for quant in (False, True):
    rng = np.random.default_rng(11)
    b, nh, nkv, hd = 8, 8, 4, 128
    bs = 32
    lens = [20, 5, 37, 0, 63, 64, 2, 33]  # pool_ctx >= 1 for real rows (engine contract)
    S = 64 * bs
    if quant:
        lay = (jnp.zeros((S, nkv*hd), jnp.int8), jnp.zeros((S, nkv*hd), jnp.int8),
               jnp.zeros((S, SCALE_LANES), jnp.bfloat16))
        write = write_kv_quant
    else:
        lay = (jnp.zeros((S, nkv*hd), jnp.float32), jnp.zeros((S, nkv*hd), jnp.float32))
        write = write_kv
    tables = np.full((b, 4), -1, np.int32); nxt = 0
    slots = np.full(b, -1, np.int32)
    for i, c in enumerate(lens):
        for j in range(-(-c // bs)):
            tables[i, j] = nxt
            lo, hi = j*bs, min(c, (j+1)*bs); n = hi - lo
            if hi == c:
                n -= 1; slots[i] = nxt*bs + (c-1-lo)
            if n > 0:
                sl = jnp.asarray(range(nxt*bs, nxt*bs+n), jnp.int32)
                lay = write(*lay,
                    jnp.asarray(rng.normal(size=(n, nkv, hd)), jnp.float32),
                    jnp.asarray(rng.normal(size=(n, nkv, hd)), jnp.float32), sl)
            nxt += 1
    tables = jnp.asarray(tables); ctx = jnp.asarray(lens, jnp.int32); slots_j = jnp.asarray(slots)
    q = jnp.asarray(rng.normal(size=(b, nh, hd)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(b, nkv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(b, nkv, hd)), jnp.float32)
    o_ref, lay_ref = decode_attention_store(q, lay, tables, ctx, k_new, v_new, slots_j, bs, hd**-0.5, backend="dense")
    o_f, lay_f = decode_attention_store(q, lay, tables, ctx, k_new, v_new, slots_j, bs, hd**-0.5, backend="pallas")
    tol = 2e-2 if quant else 5e-3  # on-chip f32 matmuls are bf16 passes
    for i, c in enumerate(lens):
        if c: np.testing.assert_allclose(np.asarray(o_f[i]), np.asarray(o_ref[i]), rtol=tol, atol=tol)
    for a, r in zip(lay_f, lay_ref):
        assert np.array_equal(np.asarray(a), np.asarray(r)), f"pool mismatch quant={quant}"
    print(f"ON-CHIP fused-store parity OK quant={quant}", flush=True)
