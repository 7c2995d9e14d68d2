"""Continuous-batching scheduler.

Policy parity with the reference (nanovllm/engine/scheduler.py:9-98):

- prefill-priority, unmixed batches: decode runs only when no prefill could be
  scheduled this step
- prefill admission is FCFS under ``max_num_seqs`` and
  ``max_num_batched_tokens`` budgets; the token budget counts only uncached
  tokens; on budget overflow the waiting queue is rotated so one huge request
  cannot starve the rest
- decode: when a sequence cannot grow its KV, the *newest* running sequence is
  preempted (recompute-style: all blocks freed, back to the waiting-queue
  head); the victim may be the sequence itself if nothing newer exists
- ``postprocess`` appends sampled tokens and finishes sequences on EOS
  (unless ignore_eos) or on hitting max_tokens.

TPU extension — multi-step decode lookahead: one device call can run
``decode_lookahead`` decode iterations on-chip (sampling feeds the next step
without a host round trip), so each scheduled decode reserves KV capacity for
that many tokens up front and ``postprocess`` consumes a token *list* per
sequence, truncating at EOS / max_tokens / max_model_len. Lookahead 1
reproduces the reference's step-for-step behavior.

This layer is pure Python and holds no device state.
"""

from collections import deque

from byox_vllm_tpu.config import Config
from byox_vllm_tpu.engine.block_manager import BlockManager
from byox_vllm_tpu.engine.sequence import Sequence, SequenceStatus
from byox_vllm_tpu.utils.logging import logger


def _bucket(n: int, lo: int, hi: int) -> int:
    """Power-of-two padding bucket from lo, capped at hi — mirrors the
    runner's shape buckets (engine/model_runner.py::_pow2_buckets)."""
    b = lo
    while b < n and b < hi:
        b *= 2
    return min(max(b, 1), max(hi, 1))


class Scheduler:
    def __init__(self, config: Config, decode_lookahead: int = 1, free_window: int | None = None):
        # sliding-window models (ALL layers windowed): KV blocks wholly below
        # the attention floor are released as generation advances, bounding
        # KV per sequence at ~window tokens regardless of length
        self.free_window = free_window
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.max_model_len = config.max_model_len
        self.eos = config.eos
        self.decode_lookahead = decode_lookahead
        self.enable_chunked_prefill = config.enable_chunked_prefill
        self.block_size = config.kvcache_block_size
        assert config.num_kvcache_blocks > 0, "num_kvcache_blocks must be set before building the scheduler"
        self.block_manager = BlockManager(config.num_kvcache_blocks, config.kvcache_block_size)
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()
        # lookahead actually reserved for the decode batch returned by the
        # last schedule() call (may be smaller than decode_lookahead near
        # the max_model_len ceiling)
        self.last_lookahead = 1

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def add(self, seq: Sequence) -> None:
        self.waiting.append(seq)

    def _pick_lookahead(self) -> int:
        """Largest power-of-two lookahead (<= configured) every running seq
        can take without crossing max_model_len — bounded set of shapes for
        the compiled multi-step program."""
        if not self.running:
            return 1
        headroom = min(self.max_model_len - len(s) - s.in_flight + 1 for s in self.running)
        k = self.decode_lookahead
        while k > 1 and k > headroom:
            k //= 2
        return max(1, k)

    def schedule(self) -> tuple[list[Sequence], bool]:
        scheduled = self._schedule_prefill()
        if scheduled:
            self.last_lookahead = 1
            return scheduled, True
        lookahead = self._pick_lookahead()
        scheduled = self._schedule_decode(lookahead)
        self.last_lookahead = lookahead
        return scheduled, False

    def _schedule_prefill(self) -> list[Sequence]:
        scheduled: list[Sequence] = []
        num_seqs = 0
        num_batched_tokens = 0
        max_chunk = 0
        while self.waiting and num_seqs < self.max_num_seqs:
            seq = self.waiting[0]
            budget = self.max_num_batched_tokens - num_batched_tokens
            if scheduled and self.max_num_batched_tokens >= 1024:
                # padded-shape admission: the runner pads the batch to
                # (seq-bucket x chunk-bucket) rows, so raw-token budgeting
                # alone can admit a batch that pads to 2x the budget in MXU
                # rows (e.g. 17 x ~114-token prompts pad to 32 x 128 = 4096).
                # Admit another sequence only if the PADDED batch still fits.
                # Gated to serving-scale budgets: below the bucket floor the
                # check is meaningless (and reference-parity tests use tiny
                # budgets to pin admission policy).
                cand = max(max_chunk, min(seq.num_pending_prefill_tokens, budget))
                padded = _bucket(num_seqs + 1, 8, self.max_num_seqs) * _bucket(
                    cand, 16, self.max_model_len
                )
                if padded > self.max_num_batched_tokens:
                    break
            if not seq.block_table:  # fresh admission (not a mid-prompt chunk)
                if not self.enable_chunked_prefill and len(seq) > budget:
                    # rotate so the oversized head can't starve the queue
                    self.waiting.rotate(-1)
                    break
                if not self.block_manager.can_allocate(seq):
                    break
                if budget <= 0:
                    break
                self.block_manager.allocate(seq)
            remaining = seq.num_pending_prefill_tokens
            chunk = min(remaining, budget)
            if chunk < remaining:
                # mid-prompt chunk: keep it block-aligned so the KV store
                # stays on the fast run-DUS path and the next chunk starts
                # at a block boundary
                chunk = chunk // self.block_size * self.block_size
                if chunk == 0:
                    break
            num_seqs += 1
            num_batched_tokens += chunk
            max_chunk = max(max_chunk, chunk)
            seq.scheduled_chunk = chunk
            scheduled.append(seq)
            if chunk == remaining:
                # prompt complete after this step: ready to decode
                seq.status = SequenceStatus.RUNNING
                self.waiting.popleft()
                self.running.append(seq)
            else:
                break  # chunked head consumed the budget; stays at the front
        if scheduled:
            logger.debug("scheduled %d seqs for prefill (%d tokens)", len(scheduled), num_batched_tokens)
        return scheduled

    def _schedule_decode(self, lookahead: int) -> list[Sequence]:
        scheduled: list[Sequence] = []
        num_seqs = 0
        stalled = False
        while self.running and num_seqs < self.max_num_seqs:
            seq = self.running.popleft()
            while not self.block_manager.can_append(seq, seq.in_flight + lookahead):
                # newest-first preemption — but a seq with a window still in
                # flight on the device cannot be preempted (its blocks are
                # being written); the engine must flush the pipeline first
                victim = None
                for i in range(len(self.running) - 1, -1, -1):
                    cand = self.running[i]
                    if cand.in_flight == 0 and not cand.prefill_in_flight:
                        victim = self.running[i]
                        del self.running[i]
                        break
                if victim is not None:
                    self._preempt(victim)
                elif seq.in_flight == 0 and not seq.prefill_in_flight:
                    self._preempt(seq)
                    break
                else:
                    self.running.appendleft(seq)  # keep; needs pipeline flush
                    stalled = True
                    break
            else:
                num_seqs += 1
                self.block_manager.may_append(seq, seq.in_flight + lookahead)
                scheduled.append(seq)
            if stalled:
                break
        if scheduled:
            # restore original order at the front of the running queue
            self.running.extendleft(reversed(scheduled))
        return scheduled

    def postprocess(
        self,
        seqs: list[Sequence],
        token_ids: list,
        is_prefill: bool = False,
        defer_dealloc: set | None = None,
    ) -> int:
        """Append sampled tokens. Each entry may be one token id (reference
        semantics) or a lookahead list; lists are truncated at the first
        finish condition and surplus tokens are discarded. Prefill first
        advances each sequence's computed-token progress; a mid-prompt chunk
        discards its (meaningless) sampled token. Returns the number of
        tokens actually appended.

        ``defer_dealloc``: seqs whose blocks must stay allocated even if they
        finish — a later window already dispatched to the device writes into
        them; the engine calls ``release_deferred`` once that window is
        fetched."""
        appended = 0
        for seq, tokens in zip(seqs, token_ids):
            if is_prefill:
                seq.num_computed_tokens += seq.scheduled_chunk
                seq.scheduled_chunk = 0
                if seq.num_computed_tokens < seq.num_tokens:
                    continue  # mid-prompt chunk: nothing sampled yet
            if not isinstance(tokens, (list, tuple)):
                tokens = [tokens]
            for token_id in tokens:
                seq.append_token(token_id)
                appended += 1
                if self._check_finished(seq, token_id, defer_dealloc):
                    break
            if self.free_window is not None and not seq.is_finished:
                self.block_manager.release_below_window(seq, self.free_window)
        return appended

    def release_deferred(self, seq: Sequence) -> None:
        """Free the blocks of a sequence that finished while a decode window
        was still in flight (see postprocess defer_dealloc)."""
        if seq.block_table:
            self.block_manager.deallocate(seq)

    def _check_finished(
        self, seq: Sequence, token_id: int, defer_dealloc: set | None = None
    ) -> bool:
        hit_eos = not seq.ignore_eos and token_id == self.eos
        done = (
            hit_eos
            or seq.num_completion_tokens >= seq.max_tokens
            or len(seq) >= self.max_model_len
        )
        if done:
            seq.status = SequenceStatus.FINISHED
            if defer_dealloc is None or seq not in defer_dealloc:
                self.block_manager.deallocate(seq)
            self.running.remove(seq)
        return done

    def _preempt(self, seq: Sequence) -> None:
        logger.debug("preempting %s", seq)
        seq.status = SequenceStatus.WAITING
        self.block_manager.deallocate(seq)
        self.waiting.appendleft(seq)


class DataParallelScheduler:
    """Data-parallel lane scheduler.

    Each 'data' mesh shard runs its own prefill-priority Scheduler over its
    OWN KV pool replica (under shard_map each data shard scatters only its
    rows into its replica, so the replicas deliberately diverge — one pool's
    worth of distinct KV per lane, which is exactly why DP multiplies KV
    capacity). A request is pinned to a lane at admission (round-robin, so
    the assignment is a pure function of arrival order — every host in a
    multi-host deployment derives the identical assignment with no
    control-plane traffic, replacing the reference's pickled-seqs broadcast,
    nanovllm/engine/model_runner.py:42-100).

    Lockstep contract (one SPMD program executes all lanes):
      - if ANY lane can prefill, this step is a prefill step; lanes with no
        prefill work contribute zero rows (their pool replicas are untouched
        — padding rows have slot -1 / context 0)
      - otherwise all lanes decode with a COMMON lookahead (the min over
        lanes) so every lane runs the same compiled program shape.

    The flat scheduled list is lane-ordered (lane 0's rows, then lane 1's,
    ...); the runner pads each lane group to a common per-lane row count so
    shard_map's contiguous row split lands each lane on its shard.
    """

    def __init__(self, config: Config, decode_lookahead: int = 1, free_window: int | None = None):
        from dataclasses import replace

        self.dp = config.data_parallel_size
        # Admission caps divide across lanes: the runner's row layout gives
        # each lane a stride of ceil(max_num_seqs/dp) rows, so a lane must
        # never schedule more than that (an over-admitting lane would spill
        # rows into the next lane's data shard — silent KV corruption); the
        # token budget splits likewise so the global padded-batch invariant
        # (rows x tokens <= budget) holds across the concatenated lanes.
        lane_budget = -(-config.max_num_batched_tokens // self.dp)
        # floors: a lane budget below one KV block would round every
        # mid-prompt chunk to zero tokens (livelock), and without chunked
        # prefill a lane must still admit a max_model_len prompt whole
        lane_budget = max(lane_budget, config.kvcache_block_size)
        if not config.enable_chunked_prefill:
            lane_budget = max(lane_budget, config.max_model_len)
        lane_config = replace(
            config,
            max_num_seqs=-(-config.max_num_seqs // self.dp),
            max_num_batched_tokens=lane_budget,
        )
        self.lanes = [
            Scheduler(lane_config, decode_lookahead, free_window=free_window)
            for _ in range(self.dp)
        ]
        self.last_lookahead = 1
        self._next_lane = 0

    # engine surface ------------------------------------------------------

    @property
    def waiting(self) -> list[Sequence]:
        return [s for lane in self.lanes for s in lane.waiting]

    @property
    def running(self) -> list[Sequence]:
        return [s for lane in self.lanes for s in lane.running]

    @property
    def block_manager(self):  # convenience for tests/tools (lane 0)
        return self.lanes[0].block_manager

    def is_finished(self) -> bool:
        return all(lane.is_finished() for lane in self.lanes)

    def add(self, seq: Sequence) -> None:
        seq.dp_shard = self._next_lane
        self.lanes[self._next_lane].add(seq)
        self._next_lane = (self._next_lane + 1) % self.dp

    def schedule(self) -> tuple[list[Sequence], bool]:
        prefill = [lane._schedule_prefill() for lane in self.lanes]
        if any(prefill):
            self.last_lookahead = 1
            return [s for group in prefill for s in group], True
        active = [lane for lane in self.lanes if lane.running]
        if not active:
            self.last_lookahead = 1
            return [], False
        lookahead = min(lane._pick_lookahead() for lane in active)
        groups = [lane._schedule_decode(lookahead) for lane in self.lanes]
        self.last_lookahead = lookahead
        return [s for group in groups for s in group], False

    def postprocess(
        self,
        seqs: list[Sequence],
        token_ids: list,
        is_prefill: bool = False,
        defer_dealloc: set | None = None,
    ) -> int:
        appended = 0
        for lane_id, lane in enumerate(self.lanes):
            pairs = [(s, t) for s, t in zip(seqs, token_ids) if s.dp_shard == lane_id]
            if pairs:
                appended += lane.postprocess(
                    [s for s, _ in pairs], [t for _, t in pairs], is_prefill, defer_dealloc
                )
        return appended

    def release_deferred(self, seq: Sequence) -> None:
        self.lanes[seq.dp_shard].release_deferred(seq)


def make_scheduler(config: Config, decode_lookahead: int = 1, free_window: int | None = None):
    if config.data_parallel_size > 1:
        return DataParallelScheduler(config, decode_lookahead, free_window=free_window)
    return Scheduler(config, decode_lookahead, free_window=free_window)
