"""Request state tracking.

Behavioral parity with the reference ``Sequence`` (nanovllm/engine/
sequence.py:8-77) — same externally observable surface (token list, prompt/
cached counts, block table, block arithmetic) — but structured differently:
the prompt is immutable and completions accumulate in their own list (the
full token stream is the concatenation), sampling knobs delegate to the
stored ``SamplingParams`` instead of being copied field-by-field, and block
geometry is derived on demand. Extended with per-request PRNG seeds,
speculative-decoding bookkeeping, async in-flight accounting, and request
timing for TTFT/latency metrics.
"""

import enum
import itertools
from dataclasses import dataclass, field

from byox_vllm_tpu.sampling_params import SamplingParams

_fresh_seq_id = itertools.count().__next__


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    FINISHED = enum.auto()


@dataclass(eq=False, repr=False)
class Sequence:
    prompt: list[int]
    block_size: int = 64
    sampling_params: SamplingParams | None = None

    # identity / lifecycle
    seq_id: int = field(default_factory=_fresh_seq_id, init=False)
    status: SequenceStatus = field(default=SequenceStatus.WAITING, init=False)

    # generated tokens (the full stream is prompt + completion)
    completion: list[int] = field(default_factory=list, init=False)

    # KV bookkeeping — how much of the stream is (a) prefix-cache reused,
    # (b) computed into the pool, (c) scheduled for the current prefill chunk
    num_cached_tokens: int = field(default=0, init=False)
    num_computed_tokens: int = field(default=0, init=False)
    scheduled_chunk: int = field(default=0, init=False)
    block_table: list[int] = field(default_factory=list, init=False)

    # data-parallel lane this request is pinned to (its KV lives only in
    # that shard's pool replica, so it must never migrate)
    dp_shard: int = field(default=0, init=False)

    # prefix-cache metrics: whether this request's prompt was already counted
    # (a preempted sequence re-prefills; without the flag its prompt tokens
    # would be counted once per prefill PASS, skewing prefix_cached_token_frac
    # under memory pressure — ADVICE r4)
    prompt_counted: bool = field(default=False, init=False)

    # speculative decoding: draft tokens scheduled for verification this step
    num_draft_tokens: int = field(default=0, init=False)
    # async pipelined decode: tokens dispatched to the device but not yet
    # fetched/confirmed (the scheduler reserves blocks for them; batch prep
    # offsets positions by them)
    in_flight: int = field(default=0, init=False)
    # async pipelined prefill: this seq's prompt KV writes are dispatched but
    # not yet fetched — it must not be preempted (its blocks are being
    # written on device) until the engine commits the prefill
    prefill_in_flight: bool = field(default=False, init=False)

    # request timing (engine metrics: TTFT, end-to-end latency)
    arrival_time: float | None = field(default=None, init=False)
    first_token_time: float | None = field(default=None, init=False)
    finish_time: float | None = field(default=None, init=False)

    def __post_init__(self):
        assert self.prompt, "empty prompt"
        self.prompt = list(self.prompt)
        if self.sampling_params is None:
            self.sampling_params = SamplingParams()
        # flat prompt+completion view, maintained incrementally: hot paths
        # (block hashing, batch prep, ngram scans) read it every step and a
        # concat-per-access property would make allocate() quadratic
        self._stream = list(self.prompt)

    # -- token stream -------------------------------------------------------

    @property
    def token_ids(self) -> list[int]:
        return self._stream

    @property
    def num_tokens(self) -> int:
        return len(self._stream)

    def __len__(self) -> int:
        return len(self._stream)

    def __getitem__(self, key):
        return self._stream[key]

    @property
    def last_token(self) -> int:
        return self._stream[-1]

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt)

    @property
    def num_completion_tokens(self) -> int:
        return len(self.completion)

    @property
    def prompt_token_ids(self) -> list[int]:
        return list(self.prompt)

    @property
    def completion_token_ids(self) -> list[int]:
        return list(self.completion)

    def append_token(self, token_id: int) -> None:
        self.completion.append(token_id)
        self._stream.append(token_id)

    def pop_tokens(self, n: int) -> None:
        """Roll back the last ``n`` generated tokens (spec-decode rejection)."""
        assert 0 <= n <= len(self.completion)
        if n:
            del self.completion[-n:]
            del self._stream[-n:]

    # -- sampling knobs (delegated) ------------------------------------------

    @property
    def temperature(self) -> float:
        return self.sampling_params.temperature

    @property
    def max_tokens(self) -> int:
        return self.sampling_params.max_tokens

    @property
    def ignore_eos(self) -> bool:
        return self.sampling_params.ignore_eos

    @property
    def top_k(self) -> int:
        return self.sampling_params.top_k

    @property
    def top_p(self) -> float:
        return self.sampling_params.top_p

    @property
    def seed(self):
        return self.sampling_params.seed

    # -- lifecycle ------------------------------------------------------------

    @property
    def is_finished(self) -> bool:
        return self.status is SequenceStatus.FINISHED

    @property
    def num_pending_prefill_tokens(self) -> int:
        # full length, not prompt length: a preempted sequence re-prefills
        # its generated tokens too (recompute-style preemption)
        return self.num_tokens - self.num_computed_tokens

    # -- block geometry (derived) ---------------------------------------------

    @property
    def num_blocks(self) -> int:
        return -(-self.num_tokens // self.block_size)

    @property
    def num_cached_blocks(self) -> int:
        return self.num_cached_tokens // self.block_size

    @property
    def last_block_num_tokens(self) -> int:
        rem = self.num_tokens % self.block_size
        return rem if rem else self.block_size

    def block(self, i: int) -> list[int]:
        """Token ids covered by the i-th KV page."""
        assert 0 <= i < self.num_blocks
        lo = i * self.block_size
        return self.token_ids[lo : lo + self.block_size]

    def __repr__(self):
        return f"Sequence(id={self.seq_id}, n={self.num_tokens}, {self.status.name.lower()})"
