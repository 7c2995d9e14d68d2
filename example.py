"""Single-prompt demo (the reference's example.py equivalent).

With a downloaded Qwen3 checkpoint directory, pass its path; without one
(this environment has zero egress) the demo runs the real Qwen3-0.6B geometry
with random weights and token-id prompts, exercising the identical engine
path.
"""

import logging
import os
import sys

from byox_vllm_tpu import LLM, SamplingParams, set_global_log_level
from byox_vllm_tpu.utils.logging import logger


def main():
    set_global_log_level(logging.INFO)
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.expanduser("~/huggingface/Qwen3-0.6B/")

    sampling_params = SamplingParams(temperature=0.6, max_tokens=32)
    if os.path.isdir(path):
        llm = LLM(path, max_model_len=4096)
        prompts = ["List the first ten prime numbers:"]
    else:
        logger.warning("no checkpoint at %s; running random-weight Qwen3-0.6B geometry", path)
        from bench import QWEN3_0_6B

        llm = LLM(hf_config=dict(QWEN3_0_6B), max_model_len=256, max_num_batched_tokens=2048)
        prompts = [[3, 17, 99, 140, 7, 250, 31, 8]]
        sampling_params.ignore_eos = True

    outputs = llm.generate(prompts, sampling_params, use_tqdm=False)
    for prompt, output in zip(prompts, outputs):
        logger.info("Prompt: %r", prompt)
        logger.info("Completion: %r", output["text"] or output["token_ids"])


if __name__ == "__main__":
    main()
