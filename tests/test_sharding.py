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


def test_tp_engine_quantized_matches_single_device():
    """TP=4 x DP=2 mesh with int8 weights + int8 LM head: the engine's greedy
    output must match the single-device run (GSPMD shards the quantized
    {q, s} pytrees column-consistently or this diverges)."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 512, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 8, "num_key_value_heads": 4, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": False, "attention_bias": False,
           "max_position_embeddings": 4096}
    common = dict(
        hf_config=cfg, dtype="float32", max_model_len=64,
        max_num_batched_tokens=256, num_kvcache_blocks=32,
        kvcache_block_size=16, quantization="int8", seed=3,
    )
    prompts = [[1, 2, 3, 4], [5, 6, 7, 8, 9, 10]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    single = LLM(**common).generate(prompts, sp, use_tqdm=False)
    tp = LLM(tensor_parallel_size=4, data_parallel_size=2, **common).generate(
        prompts, sp, use_tqdm=False
    )
    for a, b in zip(single, tp):
        assert a["token_ids"] == b["token_ids"]


def test_tp_engine_int8_kv_matches_single_device():
    """TP=2 with int8 KV cache: the scale pool shards its lane dim (global
    [S, 128*tp]) and each shard quantizes/dequantizes its own head layout."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 256, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 8, "num_key_value_heads": 4, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": True, "attention_bias": False,
           "max_position_embeddings": 4096}
    common = dict(
        hf_config=cfg, dtype="float32", max_model_len=64,
        max_num_batched_tokens=256, num_kvcache_blocks=32,
        kvcache_block_size=16, kv_cache_dtype="int8", seed=7,
    )
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    single = LLM(**common).generate(prompts, sp, use_tqdm=False)
    tp = LLM(tensor_parallel_size=2, data_parallel_size=2, **common).generate(
        prompts, sp, use_tqdm=False
    )
    for a, b in zip(single, tp):
        assert a["token_ids"] == b["token_ids"]


def test_tp_engine_bf16_untied_head():
    """TP=4 bf16 with an untied head: vocab-parallel head + distributed
    greedy must match single-device exactly (tie-break toward lower index)."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 512, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 8, "num_key_value_heads": 4, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": False, "attention_bias": False,
           "max_position_embeddings": 4096}
    common = dict(
        hf_config=cfg, dtype="float32", max_model_len=64,
        max_num_batched_tokens=256, num_kvcache_blocks=32,
        kvcache_block_size=16, seed=11,
    )
    prompts = [[3, 1, 4, 1, 5], [2, 7, 2, 7]]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    single = LLM(**common).generate(prompts, sp, use_tqdm=False)
    tp = LLM(tensor_parallel_size=4, **common).generate(prompts, sp, use_tqdm=False)
    for a, b in zip(single, tp):
        assert a["token_ids"] == b["token_ids"]


def test_dp_lanes_match_single_device():
    """Pure DP (tp=1, dp=4): requests are pinned to lanes with their own KV
    pool replica; staggered finishes change lane composition mid-run; greedy
    output must match the single-device run row for row."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 256, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": True, "attention_bias": False,
           "max_position_embeddings": 4096}
    common = dict(
        hf_config=cfg, dtype="float32", max_model_len=64,
        max_num_batched_tokens=256, num_kvcache_blocks=32,
        kvcache_block_size=16, seed=5,
    )
    # 6 prompts across 4 lanes; different max_tokens so lanes' running sets
    # diverge and per-lane row groups shrink at different times
    prompts = [[i + 1, i + 2, i + 3, i + 4] for i in range(6)]
    sps = [
        SamplingParams(temperature=0.0, max_tokens=4 + 3 * (i % 3), ignore_eos=True)
        for i in range(6)
    ]
    single = LLM(**common).generate(prompts, sps, use_tqdm=False)
    dp = LLM(data_parallel_size=4, **common).generate(prompts, sps, use_tqdm=False)
    for a, b in zip(single, dp):
        assert a["token_ids"] == b["token_ids"]


def test_dp_lane_pinning_and_capacity():
    """Each lane owns a full block pool (DP multiplies KV capacity) and a
    sequence never migrates lanes."""
    from byox_vllm_tpu.config import Config
    from byox_vllm_tpu.engine.scheduler import DataParallelScheduler
    from byox_vllm_tpu.engine.sequence import Sequence

    cfg = Config(
        hf_config={"model_type": "qwen3", "max_position_embeddings": 4096},
        max_model_len=64, max_num_batched_tokens=256,
        num_kvcache_blocks=8, kvcache_block_size=16, data_parallel_size=2,
    )
    sched = DataParallelScheduler(cfg, decode_lookahead=1)
    seqs = [Sequence(list(range(1, 20)), 16) for _ in range(4)]
    for s in seqs:
        sched.add(s)
    assert [s.dp_shard for s in seqs] == [0, 1, 0, 1]
    batch, is_prefill = sched.schedule()
    assert is_prefill
    # lane-ordered flat list: lane 0's seqs first
    assert [s.dp_shard for s in batch] == sorted(s.dp_shard for s in batch)
    # both lanes allocated from their OWN pool: block ids overlap across lanes
    lane0 = [s for s in batch if s.dp_shard == 0]
    lane1 = [s for s in batch if s.dp_shard == 1]
    assert lane0 and lane1
    assert lane0[0].block_table == lane1[0].block_table  # same ids, different replicas
    sched.postprocess(batch, [[1]] * len(batch), is_prefill=True)
    dec, is_prefill = sched.schedule()
    assert not is_prefill and len(dec) == 4


def test_dp_empty_lane_prefill():
    """A prefill step where one lane has no work: its run segment is all
    dst=-1 sentinels and its pool replica must stay untouched (the next
    request on that lane still generates correctly)."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 256, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": True, "attention_bias": False,
           "max_position_embeddings": 4096}
    common = dict(
        hf_config=cfg, dtype="float32", max_model_len=64,
        max_num_batched_tokens=256, num_kvcache_blocks=32,
        kvcache_block_size=16, seed=5,
    )
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    prompt = list(range(1, 20))  # > 1 block: exercises run-DUS stores
    single = LLM(**common).generate([prompt], sp, use_tqdm=False)
    dp_llm = LLM(data_parallel_size=2, **common)
    a = dp_llm.generate([prompt], sp, use_tqdm=False)  # lane 1 idle
    b = dp_llm.generate([list(range(30, 45)), list(range(50, 70))], sp, use_tqdm=False)
    assert a[0]["token_ids"] == single[0]["token_ids"]
    ref = LLM(**common)
    r = ref.generate([list(range(30, 45)), list(range(50, 70))], sp, use_tqdm=False)
    for x, y in zip(r, b):
        assert x["token_ids"] == y["token_ids"]


def test_dp_overadmission_is_capped():
    """More live requests than one lane's row stride: admission divides
    across lanes so no lane can spill rows onto another's data shard
    (advisor finding: silent cross-lane KV corruption)."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 256, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": True, "attention_bias": False,
           "max_position_embeddings": 4096}
    common = dict(
        hf_config=cfg, dtype="float32", max_model_len=64,
        max_num_batched_tokens=256, num_kvcache_blocks=64,
        kvcache_block_size=16, max_num_seqs=8, seed=5,
    )
    # 16 requests > max_num_seqs, staggered finishes -> lanes go unbalanced
    prompts = [[i + 1, i + 2, i + 3] for i in range(16)]
    sps = [
        SamplingParams(temperature=0.0, max_tokens=3 + (i % 5), ignore_eos=True)
        for i in range(16)
    ]
    single = LLM(**common).generate(prompts, sps, use_tqdm=False)
    dp = LLM(data_parallel_size=2, **common).generate(prompts, sps, use_tqdm=False)
    for a, b in zip(single, dp):
        assert a["token_ids"] == b["token_ids"]


def test_dp_draft_model_spec_lane_layout():
    """draft_model speculative decoding under dp=2: the drafter batches must
    use the lane-grouped row layout or its KV lands in the wrong replica
    (outputs would stay correct but acceptance collapses — assert both)."""
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as path:
        Qwen3ForCausalLM(cfg).eval().save_pretrained(path, safe_serialization=True)
        common = dict(
            dtype="float32", max_model_len=128, max_num_batched_tokens=128,
            num_kvcache_blocks=64, kvcache_block_size=16,
        )
        prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [7, 8, 7, 8, 7, 8], [4, 5, 6, 4, 5]]
        sp = SamplingParams(temperature=0.0, max_tokens=16)
        plain = LLM(path, **common).generate(prompts, sp, use_tqdm=False)
        spec_llm = LLM(
            path, data_parallel_size=2,
            speculative_config={
                "method": "draft_model", "num_speculative_tokens": 3,
                "model": path,  # self-draft: acceptance must be 1.0
            },
            **common,
        )
        out = spec_llm.generate(prompts, sp, use_tqdm=False)
        for a, b in zip(plain, out):
            assert a["token_ids"] == b["token_ids"]
        m = spec_llm.spec_metrics.summary()
        assert m["num_drafts"] > 0
        assert m["draft_acceptance_rate"] == 1.0, m  # wrong-lane KV would tank this


def test_tp_dp_ngram_spec_matches_single_device():
    """Speculative decoding composes with TP x DP: ngram spec decode on a
    TP=2 x DP=2 mesh must emit exactly the single-device non-spec greedy
    stream (rejection sampling is output-invariant under greedy; the verify
    step runs through the shard_map path with vocab-gathered logits,
    models/qwen3.py::_finalize)."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 64, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 8, "num_key_value_heads": 4, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": True, "attention_bias": False,
           "max_position_embeddings": 4096}
    common = dict(
        hf_config=cfg, dtype="float32", max_model_len=64,
        max_num_batched_tokens=256, num_kvcache_blocks=64,
        kvcache_block_size=16, seed=5,
    )
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [7, 8, 7, 8, 7, 8], [4, 5, 6, 4, 5]]
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    plain = LLM(**common).generate(prompts, sp, use_tqdm=False)
    spec_llm = LLM(
        tensor_parallel_size=2, data_parallel_size=2,
        speculative_config={
            "method": "ngram", "num_speculative_tokens": 4,
            "prompt_lookup_max": 3, "prompt_lookup_min": 1,
        },
        **common,
    )
    out = spec_llm.generate(prompts, sp, use_tqdm=False)
    for a, b in zip(plain, out):
        assert a["token_ids"] == b["token_ids"]
    m = spec_llm.spec_metrics.summary()
    assert m["num_drafts"] > 0


def test_tp_eagle_spec_greedy_invariance():
    """EAGLE feature-level drafting under TP=2: the capture_hidden out_specs
    thread the target's post-norm hidden states out of the shard_map step
    (batch on 'data', model-replicated), and greedy outputs stay invariant
    regardless of drafter quality (random drafter here)."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 64, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 8, "num_key_value_heads": 4, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": True, "attention_bias": False,
           "max_position_embeddings": 4096}
    common = dict(
        hf_config=cfg, dtype="float32", max_model_len=64,
        max_num_batched_tokens=256, num_kvcache_blocks=64,
        kvcache_block_size=16, seed=5,
    )
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [7, 8, 7, 8, 7, 8]]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    plain = LLM(**common).generate(prompts, sp, use_tqdm=False)
    spec_llm = LLM(
        tensor_parallel_size=2,
        speculative_config={"method": "eagle", "num_speculative_tokens": 3},
        **common,
    )
    out = spec_llm.generate(prompts, sp, use_tqdm=False)
    for a, b in zip(plain, out):
        assert a["token_ids"] == b["token_ids"]
    assert spec_llm.spec_metrics.summary()["num_drafts"] > 0


def test_tp_engine_w4a8_folded_matches_single_device():
    """TP=4 with FOLDED w4a8 packs ({q, m, S}): the per-column super-scale
    S is over the GLOBAL K, so it must replicate across row shards (wo,
    w_down) while the multiplier rows shard/refine — greedy output must
    match the single-device run exactly."""
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    cfg = {"model_type": "qwen3", "vocab_size": 512, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 8, "num_key_value_heads": 4, "head_dim": 32,
           "rms_norm_eps": 1e-6, "rope_theta": 1e6,
           "tie_word_embeddings": False, "attention_bias": False,
           "max_position_embeddings": 4096}
    common = dict(
        hf_config=cfg, dtype="float32", max_model_len=64,
        max_num_batched_tokens=256, num_kvcache_blocks=32,
        kvcache_block_size=16, quantization="w4a8", seed=3,
    )
    prompts = [[1, 2, 3, 4], [5, 6, 7, 8, 9, 10]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    single = LLM(**common)
    # the engine must actually be running folded packs
    lw = single.model_runner.params["layers"]["wqkv"]
    leaf = lw[0] if isinstance(lw, list) else lw
    assert "S" in leaf and "m" in leaf, leaf.keys()
    s_out = single.generate(prompts, sp, use_tqdm=False)
    tp = LLM(tensor_parallel_size=4, **common).generate(prompts, sp, use_tqdm=False)
    for a, b in zip(s_out, tp):
        assert a["token_ids"] == b["token_ids"]
