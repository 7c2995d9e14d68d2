"""byox_vllm_tpu: a TPU-native LLM inference engine (JAX / XLA / Pallas).

Public surface mirrors the reference nano-vLLM (nanovllm/__init__.py:1-4):
``LLM``, ``SamplingParams``, plus logging helpers.
"""

from byox_vllm_tpu.sampling_params import SamplingParams
from byox_vllm_tpu.utils.logging import init_logger, logger, set_global_log_level


def __getattr__(name):
    # Lazy import: LLM pulls in jax; keep control-plane imports light.
    if name == "LLM":
        from byox_vllm_tpu.llm import LLM

        return LLM
    raise AttributeError(name)


__all__ = ["LLM", "SamplingParams", "logger", "init_logger", "set_global_log_level"]
