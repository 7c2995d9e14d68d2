"""EAGLE feature-level speculative decoding (models/eagle.py, engine/spec.py
EagleProposer).

Key oracle: with a 1-layer target and a drafter built from the target's OWN
trunk plus a fusion matrix that passes the token embedding straight through
(fc = [I; 0]), the drafter computes exactly the target's forward — greedy
drafts equal greedy target tokens, so acceptance must be exactly 1.0. On the
same non-repetitive prompts the ngram proposer drafts nothing, demonstrating
the feature-drafting gain the reference only aspired to (README.md:10-34).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

BS = 16


@pytest.fixture(scope="module")
def one_layer_target(tmp_path_factory):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    model = Qwen3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_qwen3_1l")
    model.save_pretrained(path, safe_serialization=True)
    return model, str(path)


def _make_llm(path, spec_cfg=None, **over):
    from byox_vllm_tpu.llm import LLM

    kw = dict(
        dtype="float32", max_model_len=128, max_num_batched_tokens=128,
        num_kvcache_blocks=64, kvcache_block_size=BS,
    )
    kw.update(over)
    if spec_cfg is not None:
        kw["speculative_config"] = spec_cfg
    return LLM(path, **kw)


def _target_replica_drafter(llm):
    """Drafter == target trunk; fc passes the embedding through untouched."""
    import jax.numpy as jnp

    p = llm.model_runner.params
    d = llm.model_runner.spec.hidden_size
    fc = jnp.asarray(np.concatenate([np.eye(d), np.zeros((d, d))], 0), jnp.float32)
    return {
        "embed": p["embed"],
        "lm_head": p.get("lm_head", p["embed"]),
        "fc": fc,
        "final_norm": p["final_norm"],
        "layers": p["layers"],
    }


def test_hidden_capture_matches_hf(one_layer_target):
    """The features handed to the drafter are the target's post-final-norm
    hidden states — compared against HF's hidden_states[-1]."""
    model, path = one_layer_target
    import jax.numpy as jnp

    from byox_vllm_tpu.engine.batch_prep import prepare_prefill
    from byox_vllm_tpu.engine.block_manager import BlockManager
    from byox_vllm_tpu.engine.sequence import Sequence
    from byox_vllm_tpu.models.qwen3 import Qwen3Spec, forward, make_kv_cache
    from byox_vllm_tpu.utils.loader import load_qwen3_params

    spec = Qwen3Spec.from_hf_config(model.config)
    params = load_qwen3_params(path, spec, jnp.float32)
    prompt = [3, 17, 99, 140, 7, 250, 31, 8]
    bm = BlockManager(16, BS)
    seq = Sequence(prompt, BS)
    bm.allocate(seq)
    batch = prepare_prefill([seq], BS)
    (logits, hidden), _ = forward(
        params, make_kv_cache(spec, 256, jnp.float32),
        jnp.asarray(batch.token_ids), jnp.asarray(batch.q_lens),
        jnp.asarray(batch.context_lens), jnp.asarray(batch.slot_mapping),
        jnp.asarray(batch.block_tables), spec, BS, capture_hidden=True,
    )
    with torch.no_grad():
        ref = model(torch.tensor([prompt]), output_hidden_states=True)
    ref_h = ref.hidden_states[-1][0].float().numpy()  # post-final-norm
    np.testing.assert_allclose(np.asarray(hidden)[0, : len(prompt)], ref_h, rtol=2e-4, atol=2e-4)


def test_eagle_target_replica_full_acceptance(one_layer_target):
    """Drafter == target => every draft accepted (rate 1.0), outputs equal
    plain greedy; ngram on the same non-repetitive prompts drafts nothing."""
    model, path = one_layer_target
    prompts = [list(range(10, 30)), list(range(40, 70, 2))]  # no repeats
    from byox_vllm_tpu.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=16)
    plain = _make_llm(path).generate(prompts, sp, use_tqdm=False)

    eagle = _make_llm(path, {"method": "eagle", "num_speculative_tokens": 3})
    eagle.proposer.params = _target_replica_drafter(eagle)
    out = eagle.generate(prompts, sp, use_tqdm=False)
    for a, b in zip(plain, out):
        assert a["token_ids"] == b["token_ids"]
    m = eagle.spec_metrics.summary()
    assert m["num_drafts"] > 0
    assert m["draft_acceptance_rate"] == 1.0
    assert m["mean_acceptance_length"] == 4.0  # k + 1 every window

    ngram = _make_llm(
        path,
        {"method": "ngram", "num_speculative_tokens": 3, "prompt_lookup_max": 3},
    )
    nout = ngram.generate(prompts, sp, use_tqdm=False)
    for a, b in zip(plain, nout):
        assert a["token_ids"] == b["token_ids"]
    nm = ngram.spec_metrics.summary()
    # non-repetitive content: prompt lookup finds nothing to draft
    assert nm["mean_acceptance_length"] < m["mean_acceptance_length"]


def test_eagle_random_drafter_is_output_safe(one_layer_target):
    """A garbage drafter must not change outputs — rejection sampling owns
    correctness; the drafter only modulates speed."""
    _, path = one_layer_target
    from byox_vllm_tpu.sampling_params import SamplingParams

    prompts = [list(range(5, 25)), [7, 3, 250, 9, 11, 40]]
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    plain = _make_llm(path).generate(prompts, sp, use_tqdm=False)
    eagle = _make_llm(path, {"method": "eagle", "num_speculative_tokens": 4})
    out = eagle.generate(prompts, sp, use_tqdm=False)
    for a, b in zip(plain, out):
        assert a["token_ids"] == b["token_ids"]


def test_eagle_survives_preemption(one_layer_target):
    """Tiny pool forces preemption mid-generation: the drafter re-ingests
    from scratch (missing features fall back to zeros) and outputs still
    match plain greedy."""
    _, path = one_layer_target
    from byox_vllm_tpu.sampling_params import SamplingParams

    prompts = [list(range(10, 40)), list(range(50, 80)), list(range(1, 30))]
    sp = SamplingParams(temperature=0.0, max_tokens=10)
    plain = _make_llm(path).generate(prompts, sp, use_tqdm=False)
    tight = _make_llm(
        path, {"method": "eagle", "num_speculative_tokens": 2},
        num_kvcache_blocks=9, max_num_batched_tokens=64,
    )
    tight.proposer.params = _target_replica_drafter(tight)
    out = tight.generate(prompts, sp, use_tqdm=False)
    for a, b in zip(plain, out):
        assert a["token_ids"] == b["token_ids"]


def test_eagle_with_chunked_prefill(one_layer_target):
    """Chunked prefill feeds the drafter features chunk by chunk; the
    target-replica drafter must still reach full acceptance."""
    _, path = one_layer_target
    from byox_vllm_tpu.sampling_params import SamplingParams

    prompts = [list(range(10, 58))]  # 48 tokens > 32-token budget -> 2 chunks
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    plain = _make_llm(path).generate(prompts, sp, use_tqdm=False)
    eagle = _make_llm(
        path, {"method": "eagle", "num_speculative_tokens": 3},
        max_num_batched_tokens=32,
    )
    eagle.proposer.params = _target_replica_drafter(eagle)
    out = eagle.generate(prompts, sp, use_tqdm=False)
    assert plain[0]["token_ids"] == out[0]["token_ids"]
    m = eagle.spec_metrics.summary()
    assert m["draft_acceptance_rate"] == 1.0, m


def test_eagle_pack_roundtrip(one_layer_target, tmp_path):
    """save_eagle_pack -> SpeculativeConfig(model=pack): the reloaded
    target-replica drafter still reaches acceptance 1.0."""
    _, path = one_layer_target
    from byox_vllm_tpu.sampling_params import SamplingParams
    from byox_vllm_tpu.tools.eagle_pack import save_eagle_pack

    builder = _make_llm(path, {"method": "eagle", "num_speculative_tokens": 3})
    pack = str(tmp_path / "eagle.safetensors")
    save_eagle_pack(_target_replica_drafter(builder), pack)
    del builder

    prompts = [list(range(10, 30))]
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    plain = _make_llm(path).generate(prompts, sp, use_tqdm=False)
    eagle = _make_llm(
        path, {"method": "eagle", "num_speculative_tokens": 3, "model": pack}
    )
    out = eagle.generate(prompts, sp, use_tqdm=False)
    assert plain[0]["token_ids"] == out[0]["token_ids"]
    assert eagle.spec_metrics.summary()["draft_acceptance_rate"] == 1.0


def test_convert_hf_eagle_layout(tmp_path):
    """convert_hf_eagle maps an official-layout EAGLE head (torch fc.weight
    [D, 2D] with [hidden; embed] input order, Llama-style layers) into our
    pack, swapping the fc input halves to [embed; hidden]."""
    import numpy as np
    from safetensors.numpy import save_file

    from byox_vllm_tpu.tools.eagle_pack import convert_hf_eagle

    d, inter, nh, nkv, hd = 8, 16, 2, 1, 4
    rng = np.random.default_rng(0)
    t = lambda *s: rng.normal(size=s).astype(np.float32)
    fc_torch = t(d, 2 * d)  # torch [out, in], in = [hidden ; embed]
    raw = {
        "fc.weight": fc_torch,
        "layers.0.input_layernorm.weight": t(d),
        "layers.0.self_attn.q_proj.weight": t(nh * hd, d),
        "layers.0.self_attn.k_proj.weight": t(nkv * hd, d),
        "layers.0.self_attn.v_proj.weight": t(nkv * hd, d),
        "layers.0.self_attn.o_proj.weight": t(d, nh * hd),
        "layers.0.post_attention_layernorm.weight": t(d),
        "layers.0.mlp.gate_proj.weight": t(inter, d),
        "layers.0.mlp.up_proj.weight": t(inter, d),
        "layers.0.mlp.down_proj.weight": t(d, inter),
    }
    hf_dir = tmp_path / "hf_eagle"
    hf_dir.mkdir()
    save_file(raw, str(hf_dir / "model.safetensors"))
    out = str(tmp_path / "pack.safetensors")
    convert_hf_eagle(str(hf_dir), out, dtype=np.float32)

    from safetensors import safe_open

    with safe_open(out, framework="numpy") as f:
        fc = f.get_tensor("fc")
        wqkv = f.get_tensor("layers.wqkv")
    assert fc.shape == (2 * d, d)
    # our input order is [embed; hidden]: the embed rows are torch fc's
    # SECOND input half (columns d: of fc.weight -> rows of fc.weight.T)
    np.testing.assert_allclose(fc[:d], fc_torch.T[d:], rtol=1e-6)
    np.testing.assert_allclose(fc[d:], fc_torch.T[:d], rtol=1e-6)
    assert wqkv.shape == (1, d, (nh + 2 * nkv) * hd)


def test_convert_hf_eagle_end_to_end(one_layer_target, tmp_path):
    """Official-layout EAGLE checkpoint -> convert_hf_eagle -> pack -> engine
    (VERDICT r2 item 9): the converted drafter loads, drafts run, acceptance
    metrics record, and greedy outputs stay invariant (rejection sampling is
    exact regardless of drafter quality). Values are random — a synthetic
    stand-in for a trained head; only the LAYOUT is official."""
    model, path = one_layer_target
    from safetensors.numpy import save_file

    from byox_vllm_tpu.sampling_params import SamplingParams
    from byox_vllm_tpu.tools.eagle_pack import convert_hf_eagle

    cfg = model.config
    d = cfg.hidden_size
    nh, nkv, hd, inter = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        cfg.intermediate_size,
    )
    rng = np.random.default_rng(3)
    t = lambda *s: (0.05 * rng.normal(size=s)).astype(np.float32)
    raw = {
        "fc.weight": t(d, 2 * d),
        "layers.0.input_layernorm.weight": np.ones(d, np.float32),
        "layers.0.self_attn.q_proj.weight": t(nh * hd, d),
        "layers.0.self_attn.k_proj.weight": t(nkv * hd, d),
        "layers.0.self_attn.v_proj.weight": t(nkv * hd, d),
        "layers.0.self_attn.o_proj.weight": t(d, nh * hd),
        "layers.0.post_attention_layernorm.weight": np.ones(d, np.float32),
        "layers.0.mlp.gate_proj.weight": t(inter, d),
        "layers.0.mlp.up_proj.weight": t(inter, d),
        "layers.0.mlp.down_proj.weight": t(d, inter),
        "norm.weight": np.ones(d, np.float32),
    }
    hf_dir = tmp_path / "hf_eagle"
    hf_dir.mkdir()
    save_file(raw, str(hf_dir / "model.safetensors"))
    pack = str(tmp_path / "eagle.safetensors")
    convert_hf_eagle(str(hf_dir), pack, dtype=np.float32)

    prompts = [list(range(10, 30)), list(range(40, 55))]
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    plain = _make_llm(path).generate(prompts, sp, use_tqdm=False)
    eagle = _make_llm(
        path, {"method": "eagle", "num_speculative_tokens": 3, "model": pack}
    )
    out = eagle.generate(prompts, sp, use_tqdm=False)
    for a, b in zip(plain, out):
        assert a["token_ids"] == b["token_ids"]
    m = eagle.spec_metrics.summary()
    assert m["num_drafts"] > 0 and m["num_draft_tokens"] > 0
