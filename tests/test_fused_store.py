"""Engine-level fused decode store (config.fused_decode_store) on the
interpret-mode Pallas path.

The kernel-level oracles live in tests/test_paged_attention_kernel.py
(output parity + bit-identical pools) and tools/onchip_fused_parity.py (real
hardware). Here the whole engine drives the fused path: multi-step decode
windows, block-boundary crossings, and padding rows must all produce the
same greedy PREFIX as the scatter path (exact full-sequence equality is not
the contract: the fused path's current token attends via the kernel's tail
term — a different bf16 summation order — so argmax may flip on near-ties
with random weights; see tools/tpu_validation.py FUSED_PARITY).
"""

import jax.numpy as jnp  # noqa: F401  (ensures jax configured by conftest)

from byox_vllm_tpu.llm import LLM
from byox_vllm_tpu.sampling_params import SamplingParams

TINY = {
    "model_type": "qwen3",
    "vocab_size": 512,
    "hidden_size": 256,
    "intermediate_size": 512,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 128,  # the Pallas kernels require hd == 128
    "rms_norm_eps": 1e-6,
    "rope_theta": 1e6,
    "tie_word_embeddings": True,
    "attention_bias": False,
    "max_position_embeddings": 4096,
}


def _run(fused: bool, kv_dtype: str):
    common = dict(
        hf_config=dict(TINY),
        max_model_len=128,
        max_num_batched_tokens=512,
        max_num_seqs=8,
        num_kvcache_blocks=48,
        kvcache_block_size=16,
        num_decode_steps=4,
        attention_backend="pallas",  # interpret-mode kernels on CPU
        kv_cache_dtype=kv_dtype,
        seed=7,
    )
    llm = LLM(fused_decode_store=fused, **common)
    prompts = [[(i * 13 + j) % 500 for j in range(9 + 3 * i)] for i in range(4)]
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    out = llm.generate(prompts, sp, use_tqdm=False)
    return [o["token_ids"] for o in out]


def test_fused_store_engine_prefix_parity():
    base = _run(fused=False, kv_dtype="auto")
    fused = _run(fused=True, kv_dtype="auto")
    for a, b in zip(base, fused):
        assert a[:8] == b[:8], (a, b)


def test_fused_store_engine_int8_kv():
    base = _run(fused=False, kv_dtype="int8")
    fused = _run(fused=True, kv_dtype="int8")
    for a, b in zip(base, fused):
        assert a[:8] == b[:8], (a, b)
