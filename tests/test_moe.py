"""Qwen3-MoE family: routed top-k expert MLP (models/qwen3.py::_moe_mlp,
grouped ragged_dot dispatch) against HF transformers. Beyond reference scope
(nano-vLLM is dense-only)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

BS = 16


@pytest.fixture(scope="module")
def tiny_moe(tmp_path_factory):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=8, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    model = Qwen3MoeForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_qwen3moe")
    model.save_pretrained(path, safe_serialization=True)
    return model, cfg, str(path)


def test_moe_prefill_logits_match_hf(tiny_moe):
    model, cfg, path = tiny_moe
    import jax.numpy as jnp

    from byox_vllm_tpu.engine.batch_prep import prepare_prefill
    from byox_vllm_tpu.engine.block_manager import BlockManager
    from byox_vllm_tpu.engine.sequence import Sequence
    from byox_vllm_tpu.models import get_model
    from byox_vllm_tpu.models.qwen3 import forward, make_kv_cache

    fam = get_model("qwen3_moe")
    spec = fam.spec_from_hf(cfg)
    assert spec.num_experts == 8 and spec.num_experts_per_tok == 2
    params = fam.load_params(path, spec, jnp.float32)

    prompt = [3, 17, 99, 140, 7, 250, 31, 8, 77, 123]
    bm = BlockManager(16, BS)
    seq = Sequence(prompt, BS)
    bm.allocate(seq)
    batch = prepare_prefill([seq], BS)
    logits, _ = forward(
        params, make_kv_cache(spec, 256, jnp.float32),
        jnp.asarray(batch.token_ids), jnp.asarray(batch.q_lens),
        jnp.asarray(batch.context_lens), jnp.asarray(batch.slot_mapping),
        jnp.asarray(batch.block_tables), spec, BS,
    )
    with torch.no_grad():
        ref = model(torch.tensor([prompt], dtype=torch.long)).logits[0, -1].float().numpy()
    np.testing.assert_allclose(np.asarray(logits[0]), ref, rtol=3e-4, atol=3e-4)


def test_moe_engine_greedy_matches_hf(tiny_moe):
    model, _, path = tiny_moe
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    llm = LLM(
        path, dtype="float32", max_model_len=256, max_num_batched_tokens=256,
        num_kvcache_blocks=64, kvcache_block_size=BS,
    )
    prompts = [[3, 17, 99, 140, 7], list(range(60, 85))]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=8), use_tqdm=False)
    for prompt, out in zip(prompts, outs):
        with torch.no_grad():
            ref = model.generate(
                torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
                eos_token_id=None, pad_token_id=0,
            )[0, len(prompt):].tolist()
        assert out["token_ids"] == ref


def test_moe_dp_lanes_match_single(tiny_moe):
    """MoE under data parallelism (tp=1, dp=2): the replicated-expert specs
    compile under shard_map and lanes match the single-device run."""
    _, _, path = tiny_moe
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    common = dict(
        dtype="float32", max_model_len=64, max_num_batched_tokens=256,
        num_kvcache_blocks=32, kvcache_block_size=BS, seed=5,
    )
    prompts = [[i + 1, i + 5, i + 9, i + 2] for i in range(4)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    single = LLM(path, **common).generate(prompts, sp, use_tqdm=False)
    dp = LLM(path, data_parallel_size=2, **common).generate(prompts, sp, use_tqdm=False)
    for a, b in zip(single, dp):
        assert a["token_ids"] == b["token_ids"]


def test_moe_expert_parallel_matches_single(tiny_moe):
    """EP (experts sharded over 'model', tp=2): greedy output must equal the
    single-device run — non-local assignments mask to zero and the MLP psum
    merges shard contributions exactly."""
    _, _, path = tiny_moe
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    common = dict(
        dtype="float32", max_model_len=64, max_num_batched_tokens=256,
        num_kvcache_blocks=32, kvcache_block_size=BS, seed=7,
    )
    prompts = [[3, 1, 4, 1, 5], [2, 7, 2, 7, 9, 11]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    single = LLM(path, **common).generate(prompts, sp, use_tqdm=False)
    ep = LLM(path, tensor_parallel_size=2, **common).generate(prompts, sp, use_tqdm=False)
    for a, b in zip(single, ep):
        assert a["token_ids"] == b["token_ids"]
    ep2 = LLM(path, tensor_parallel_size=2, data_parallel_size=2, **common).generate(
        prompts, sp, use_tqdm=False
    )
    for a, b in zip(single, ep2):
        assert a["token_ids"] == b["token_ids"]
