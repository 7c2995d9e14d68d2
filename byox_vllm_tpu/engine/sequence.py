"""Request state tracking.

Behavioral parity with the reference ``Sequence`` (nanovllm/engine/sequence.py:
8-77): token list, prompt/cached token counts, block table, block arithmetic.
Extended with per-request PRNG seeds and speculative-decoding bookkeeping.
"""

from copy import copy
from enum import Enum, auto
from itertools import count

from byox_vllm_tpu.sampling_params import SamplingParams


class SequenceStatus(Enum):
    WAITING = auto()
    RUNNING = auto()
    FINISHED = auto()


class Sequence:
    counter = count()

    def __init__(self, token_ids: list[int], block_size: int, sampling_params: SamplingParams | None = None):
        if sampling_params is None:
            sampling_params = SamplingParams()
        self.seq_id = next(Sequence.counter)
        self.status = SequenceStatus.WAITING
        self.token_ids = copy(token_ids)
        self.last_token = token_ids[-1]
        self.num_tokens = len(self.token_ids)
        self.num_prompt_tokens = len(token_ids)
        self.num_cached_tokens = 0
        # prefill progress: tokens whose KV is computed & in the pool. Equals
        # num_cached_tokens after allocation; advances per chunk when chunked
        # prefill splits a long prompt across steps.
        self.num_computed_tokens = 0
        # tokens of this seq scheduled for the CURRENT prefill step
        self.scheduled_chunk = 0
        self.block_table: list[int] = []
        self.temperature = sampling_params.temperature
        self.max_tokens = sampling_params.max_tokens
        self.ignore_eos = sampling_params.ignore_eos
        self.top_k = sampling_params.top_k
        self.top_p = sampling_params.top_p
        self.seed = sampling_params.seed
        self.block_size = block_size
        # Speculative decoding: number of draft tokens scheduled for
        # verification this step (0 on the normal 1-token decode path).
        self.num_draft_tokens = 0
        # Async pipelined decode: tokens dispatched to the device but not yet
        # fetched/confirmed. The scheduler reserves blocks for them and the
        # batch prep offsets positions by them; the engine clears the count
        # when the window's tokens are committed.
        self.in_flight = 0
        # request-level timing (engine metrics: TTFT, latency)
        self.arrival_time: float | None = None
        self.first_token_time: float | None = None
        self.finish_time: float | None = None

    def __len__(self):
        return self.num_tokens

    def __getitem__(self, key):
        return self.token_ids[key]

    def __repr__(self):
        return f"seq-{self.seq_id}"

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    @property
    def num_completion_tokens(self) -> int:
        return self.num_tokens - self.num_prompt_tokens

    @property
    def prompt_token_ids(self) -> list[int]:
        return self.token_ids[: self.num_prompt_tokens]

    @property
    def completion_token_ids(self) -> list[int]:
        return self.token_ids[self.num_prompt_tokens :]

    @property
    def num_pending_prefill_tokens(self) -> int:
        # full length, not prompt length: a preempted sequence re-prefills
        # its generated tokens too (recompute-style preemption)
        return self.num_tokens - self.num_computed_tokens

    @property
    def num_cached_blocks(self) -> int:
        return self.num_cached_tokens // self.block_size

    @property
    def num_blocks(self) -> int:
        return (self.num_tokens + self.block_size - 1) // self.block_size

    @property
    def last_block_num_tokens(self) -> int:
        return self.num_tokens - (self.num_blocks - 1) * self.block_size

    def block(self, i: int) -> list[int]:
        assert 0 <= i < self.num_blocks
        return self.token_ids[i * self.block_size : (i + 1) * self.block_size]

    def append_token(self, token_id: int) -> None:
        self.token_ids.append(token_id)
        self.last_token = token_id
        self.num_tokens += 1

    def pop_tokens(self, n: int) -> None:
        """Roll back the last ``n`` tokens (speculative-decode rejection)."""
        assert 0 <= n <= self.num_completion_tokens
        if n == 0:
            return
        del self.token_ids[-n:]
        self.num_tokens -= n
        self.last_token = self.token_ids[-1]
