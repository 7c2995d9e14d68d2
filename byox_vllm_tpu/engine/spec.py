"""Speculative decoding: ngram (prompt-lookup) proposer and acceptance
metrics.

The reference declares this scope but never wires it (SpeculativeConfig at
nanovllm/config.py:30-49 is accepted and dropped, llm_engine.py:18; the
target behavior + metrics surface is demonstrated against real vLLM in
vllm_ngram.py:64-104). Here it is implemented: the proposer searches the
sequence (prompt + generated) for the most recent earlier occurrence of its
trailing n-gram (n from prompt_lookup_max down to prompt_lookup_min) and
proposes the tokens that followed it; the verify step scores all draft
positions in one model call and rejection-samples on device
(ops/spec_sampler.py).
"""

from dataclasses import dataclass, field

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from byox_vllm_tpu.utils.native import load_native

_native = load_native()


class NgramProposer:
    def __init__(self, num_speculative_tokens: int, prompt_lookup_min: int, prompt_lookup_max: int):
        self.k = num_speculative_tokens
        self.min_n = prompt_lookup_min
        self.max_n = prompt_lookup_max

    def propose(self, token_ids: list[int]) -> list[int]:
        """Up to k draft tokens continuing ``token_ids``; [] if no n-gram of
        length in [min_n, max_n] recurs (most recent occurrence wins; native
        C++ scan when available, numpy window match otherwise)."""
        if _native is not None:
            return _native.ngram_propose(token_ids, self.min_n, self.max_n, self.k)
        size = len(token_ids)
        arr = np.asarray(token_ids)
        for n in range(min(self.max_n, size - 1), self.min_n - 1, -1):
            tail = arr[-n:]
            # candidate windows end strictly before the trailing n-gram
            windows = sliding_window_view(arr[: size - 1], n)
            matches = np.nonzero((windows == tail).all(axis=1))[0]
            if len(matches):
                start = int(matches[-1])
                return token_ids[start + n : start + n + self.k]
        return []


@dataclass
class SpecMetrics:
    """Acceptance accounting, mirroring the vLLM counters the reference's
    vllm_ngram.py reads (vllm:spec_decode_num_drafts / num_draft_tokens /
    num_accepted_tokens / accepted_per_pos)."""

    num_drafts: int = 0
    num_draft_tokens: int = 0
    num_accepted_tokens: int = 0
    accepted_per_pos: list = field(default_factory=list)

    def record(self, num_draft: int, num_accepted: int) -> None:
        if num_draft == 0:
            return
        self.num_drafts += 1
        self.num_draft_tokens += num_draft
        self.num_accepted_tokens += num_accepted
        while len(self.accepted_per_pos) < num_draft:
            self.accepted_per_pos.append(0)
        for i in range(num_accepted):
            self.accepted_per_pos[i] += 1

    @property
    def draft_acceptance_rate(self) -> float:
        return self.num_accepted_tokens / self.num_draft_tokens if self.num_draft_tokens else 0.0

    @property
    def mean_acceptance_length(self) -> float:
        # +1: the bonus/resampled token emitted alongside every draft window
        return 1.0 + self.num_accepted_tokens / self.num_drafts if self.num_drafts else 1.0

    def summary(self) -> dict:
        return {
            "num_drafts": self.num_drafts,
            "num_draft_tokens": self.num_draft_tokens,
            "num_accepted_tokens": self.num_accepted_tokens,
            "draft_acceptance_rate": round(self.draft_acceptance_rate, 4),
            "mean_acceptance_length": round(self.mean_acceptance_length, 4),
            "acceptance_rate_per_pos": [
                round(c / self.num_drafts, 4) for c in self.accepted_per_pos
            ]
            if self.num_drafts
            else [],
        }
