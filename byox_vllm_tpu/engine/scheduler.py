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

This layer is pure Python and holds no device state.
"""

from collections import deque

from byox_vllm_tpu.config import Config
from byox_vllm_tpu.engine.block_manager import BlockManager
from byox_vllm_tpu.engine.sequence import Sequence, SequenceStatus
from byox_vllm_tpu.utils.logging import logger


class Scheduler:
    def __init__(self, config: Config):
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.eos = config.eos
        assert config.num_kvcache_blocks > 0, "num_kvcache_blocks must be set before building the scheduler"
        self.block_manager = BlockManager(config.num_kvcache_blocks, config.kvcache_block_size)
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def add(self, seq: Sequence) -> None:
        self.waiting.append(seq)

    def schedule(self) -> tuple[list[Sequence], bool]:
        scheduled: list[Sequence] = []
        num_seqs = 0
        num_batched_tokens = 0

        # prefill pass
        while self.waiting and num_seqs < self.max_num_seqs:
            seq = self.waiting[0]
            if num_batched_tokens + len(seq) > self.max_num_batched_tokens:
                # rotate so the oversized head can't starve the queue
                self.waiting.rotate(-1)
                break
            if not self.block_manager.can_allocate(seq):
                break
            num_seqs += 1
            self.block_manager.allocate(seq)
            num_batched_tokens += len(seq) - seq.num_cached_tokens
            seq.status = SequenceStatus.RUNNING
            self.waiting.popleft()
            self.running.append(seq)
            scheduled.append(seq)
        if scheduled:
            logger.debug("scheduled %d seqs for prefill (%d tokens)", len(scheduled), num_batched_tokens)
            return scheduled, True

        # decode pass
        while self.running and num_seqs < self.max_num_seqs:
            seq = self.running.popleft()
            while not self.block_manager.can_append(seq):
                if self.running:
                    self._preempt(self.running.pop())  # newest first
                else:
                    self._preempt(seq)
                    break
            else:
                num_seqs += 1
                self.block_manager.may_append(seq)
                scheduled.append(seq)
        if scheduled:
            # restore original order at the front of the running queue
            self.running.extendleft(reversed(scheduled))
        return scheduled, False

    def postprocess(self, seqs: list[Sequence], token_ids: list[int]) -> None:
        for seq, token_id in zip(seqs, token_ids):
            seq.append_token(token_id)
            if (not seq.ignore_eos and token_id == self.eos) or seq.num_completion_tokens == seq.max_tokens:
                seq.status = SequenceStatus.FINISHED
                self.block_manager.deallocate(seq)
                self.running.remove(seq)

    def _preempt(self, seq: Sequence) -> None:
        logger.debug("preempting %s", seq)
        seq.status = SequenceStatus.WAITING
        self.block_manager.deallocate(seq)
        self.waiting.appendleft(seq)
