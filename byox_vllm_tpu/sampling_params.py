"""Per-request sampling parameters.

API parity with the reference (nanovllm/sampling_params.py:4-11): temperature,
max_tokens, ignore_eos. Differences, deliberate:

- ``temperature == 0.0`` means greedy decoding (the reference asserts it away;
  greedy is table stakes for a serving framework and free under argmax).
- optional ``top_k`` / ``top_p`` / ``seed`` extend the reference's surface.
"""

from dataclasses import dataclass


@dataclass
class SamplingParams:
    temperature: float = 1.0
    max_tokens: int = 64
    ignore_eos: bool = False
    top_k: int = 0  # 0 disables top-k filtering
    top_p: float = 1.0  # 1.0 disables nucleus filtering
    seed: int | None = None

    def __post_init__(self):
        assert self.temperature >= 0.0, "temperature must be non-negative"
        assert self.max_tokens >= 1, "max_tokens must be positive"
        assert self.top_k >= 0
        assert 0.0 < self.top_p <= 1.0
