"""Multi-device sharding tests on the 8-device virtual CPU mesh: the full
step (forward + sampling) compiles and runs under (data, model) shardings,
and TP results match single-device results."""

import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_tp_matches_single_device():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from byox_vllm_tpu.models.qwen3 import forward, init_params
    from byox_vllm_tpu.parallel.mesh import make_mesh
    from byox_vllm_tpu.parallel.shardings import batch_specs, kv_cache_spec, shard_params
    import __graft_entry__ as ge

    spec = ge._tiny_spec(num_kv_heads=8)
    block_size = 16
    params = init_params(spec, jnp.float32)
    b, tq, w = 2, 16, 4
    arrays = ge._batch_arrays(b, tq, w, block_size)[:5]
    from byox_vllm_tpu.models.qwen3 import make_kv_cache

    kv = make_kv_cache(spec, 32 * block_size, jnp.float32)

    def run(params_, kv_, arrays_):
        logits, new_kv = forward(params_, kv_, *arrays_, spec, block_size)
        return logits

    ref = np.asarray(run(params, kv, arrays))

    mesh = make_mesh(tensor_parallel_size=4, data_parallel_size=2)
    sharded_params = shard_params(params, mesh)
    kv_sharded = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, kv_cache_spec())), kv)
    bspecs = batch_specs()
    names = ["token_ids", "q_lens", "context_lens", "slot_mapping", "block_tables"]
    sharded_arrays = tuple(
        jax.device_put(a, NamedSharding(mesh, bspecs[n])) for a, n in zip(arrays, names)
    )
    out = np.asarray(jax.jit(run)(sharded_params, kv_sharded, sharded_arrays))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
