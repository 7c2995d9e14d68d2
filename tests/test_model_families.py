"""HF-parity for the non-Qwen3 registered families (models/__init__.py):
Qwen2 (qkv BIAS, no q/k norm), Llama and Mistral (no bias, no q/k norm).
Each family gets a tiny random-weight HF model saved via save_pretrained,
loaded through the real loader (exercising the bqkv bias path,
utils/loader.py), and must match HF greedy generation token for token."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

BS = 16


def _make_hf(family, tmp_path_factory):
    torch.manual_seed(0)
    common = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    if family == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM

        cfg = Qwen2Config(**common)  # qkv bias is the architecture default
        model = Qwen2ForCausalLM(cfg).eval()
    elif family == "llama":
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(**common, attention_bias=False)
        model = LlamaForCausalLM(cfg).eval()
    elif family == "mistral":
        from transformers import MistralConfig, MistralForCausalLM

        cfg = MistralConfig(**common)
        model = MistralForCausalLM(cfg).eval()
    else:
        raise AssertionError(family)
    # transformers zero-initializes Linear biases: perturb them so a model
    # that silently DROPS the qkv bias cannot pass by luck
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith(".bias"):
                p.normal_(std=0.5)
    path = tmp_path_factory.mktemp(f"tiny_{family}")
    model.save_pretrained(path, safe_serialization=True)
    return model, str(path)


@pytest.mark.parametrize("family", ["qwen2", "llama", "mistral"])
def test_family_greedy_matches_hf(family, tmp_path_factory):
    model, path = _make_hf(family, tmp_path_factory)
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    llm = LLM(
        path,
        dtype="float32",
        max_model_len=256,
        max_num_batched_tokens=256,
        num_kvcache_blocks=64,
        kvcache_block_size=BS,
    )
    prompts = [[3, 17, 99, 140, 7], list(range(60, 85))]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=8), use_tqdm=False)
    for prompt, out in zip(prompts, outs):
        with torch.no_grad():
            ref = model.generate(
                torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
                eos_token_id=None, pad_token_id=0,
            )[0, len(prompt):].tolist()
        assert out["token_ids"] == ref, family


@pytest.mark.parametrize("family", ["qwen2"])
def test_family_prefill_logits_match_hf(family, tmp_path_factory):
    """Row-level logits parity for the bias family (the sharpest check that
    bqkv actually lands in the computation, not just in the pytree)."""
    model, path = _make_hf(family, tmp_path_factory)
    import jax.numpy as jnp

    from byox_vllm_tpu.engine.batch_prep import prepare_prefill
    from byox_vllm_tpu.engine.block_manager import BlockManager
    from byox_vllm_tpu.engine.sequence import Sequence
    from byox_vllm_tpu.models import get_model
    from byox_vllm_tpu.models.qwen3 import forward, make_kv_cache

    fam = get_model(family)
    spec = fam.spec_from_hf(model.config)
    assert spec.attention_bias and not spec.qk_norm
    params = fam.load_params(path, spec, jnp.float32)

    prompt = [3, 17, 99, 140, 7, 250, 31, 8, 77, 123]
    bm = BlockManager(16, BS)
    seq = Sequence(prompt, BS)
    bm.allocate(seq)
    batch = prepare_prefill([seq], BS)
    logits, _ = forward(
        params, make_kv_cache(spec, 512, jnp.float32),
        jnp.asarray(batch.token_ids), jnp.asarray(batch.q_lens),
        jnp.asarray(batch.context_lens), jnp.asarray(batch.slot_mapping),
        jnp.asarray(batch.block_tables), spec, BS,
    )
    with torch.no_grad():
        ref = model(torch.tensor([prompt], dtype=torch.long)).logits[0, -1].float().numpy()
    np.testing.assert_allclose(np.asarray(logits[0]), ref, rtol=2e-4, atol=2e-4)
