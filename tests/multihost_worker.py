"""Worker process for the 2-process multi-host lockstep test (spawned by
tests/test_multihost.py). Each process owns 2 virtual CPU devices and joins a
jax.distributed coordination service; the mesh is (data=2, model=2) so the
DATA axis spans the two processes — each host physically holds only its own
lane's KV replica, proving the deterministic-lockstep serving design
(parallel/distributed.py): identical request stream in, identical outputs
out, no control-plane messages between hosts."""

import json
import os
import sys

if __name__ == "__main__":  # imported by the test only for build_and_generate
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

TINY = {
    "model_type": "qwen3", "vocab_size": 256, "hidden_size": 128,
    "intermediate_size": 256, "num_hidden_layers": 2,
    "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 32,
    "rms_norm_eps": 1e-6, "rope_theta": 1e6, "tie_word_embeddings": True,
    "attention_bias": False, "max_position_embeddings": 4096,
}

PROMPTS = [[1, 2, 3, 4], [5, 6, 7], [8, 9, 10, 11, 12], [2, 4, 6]]


def build_and_generate():
    from byox_vllm_tpu.llm import LLM
    from byox_vllm_tpu.sampling_params import SamplingParams

    llm = LLM(
        hf_config=dict(TINY), dtype="float32", max_model_len=64,
        max_num_batched_tokens=256, num_kvcache_blocks=32, kvcache_block_size=16,
        tensor_parallel_size=2, data_parallel_size=2, seed=5,
    )
    sps = [
        SamplingParams(temperature=0.0, max_tokens=4 + 2 * (i % 2), ignore_eos=True)
        for i in range(len(PROMPTS))
    ]
    out = llm.generate(PROMPTS, sps, use_tqdm=False)
    return [o["token_ids"] for o in out]


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    from byox_vllm_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 4 and jax.local_device_count() == 2
    tokens = build_and_generate()
    print("RESULT " + json.dumps(tokens), flush=True)


if __name__ == "__main__":
    main()
