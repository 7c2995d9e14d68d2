"""Public facade (reference: nanovllm/llm.py:4-5 — LLM is the engine)."""

from byox_vllm_tpu.engine.llm_engine import LLMEngine


class LLM(LLMEngine):
    pass
