"""Scheduler policy tests — scenario parity with the reference's
tests/test_scheduler.py (admission budgets, rotation fairness, newest-first
preemption incl. self-preemption), without requiring a model on disk
(Config accepts an inline hf_config dict)."""

from byox_vllm_tpu.config import Config
from byox_vllm_tpu.engine.scheduler import Scheduler
from byox_vllm_tpu.engine.sequence import Sequence, SequenceStatus
from byox_vllm_tpu.sampling_params import SamplingParams

TINY_HF = {"max_position_embeddings": 4096}


def make_scheduler(num_blocks=16, block_size=4, max_num_seqs=8, max_tokens_budget=64, chunked=False):
    cfg = Config(
        hf_config=dict(TINY_HF),
        max_num_seqs=max_num_seqs,
        max_num_batched_tokens=max_tokens_budget,
        max_model_len=min(64, max_tokens_budget),
        num_kvcache_blocks=num_blocks,
        enable_chunked_prefill=chunked,
    )
    # tiny block size for testability (Config's default floor is 16)
    cfg.kvcache_block_size = block_size
    return Scheduler(cfg)


def seq_of(n, block_size=4, start=0, **sp):
    return Sequence(list(range(start, start + n)), block_size, SamplingParams(**sp) if sp else None)


def test_prefill_fcfs_and_budget_rotation():
    # rotation fairness is the non-chunked (reference-parity) policy
    sched = make_scheduler(max_tokens_budget=64, num_blocks=64, chunked=False)
    big = seq_of(60)
    small1 = seq_of(8, start=100)
    small2 = seq_of(8, start=200)
    for s in (big, small1, small2):
        sched.add(s)

    # step 1: big fits (60 <= 64) and is scheduled alone; small1 would overflow
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [big]
    # step 2: smalls batch together (small1 was rotated behind small2)
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [small2, small1]


def test_oversized_head_rotates_not_starves():
    sched = make_scheduler(max_tokens_budget=16, num_blocks=64, block_size=4, chunked=False)
    big = seq_of(60)  # can never fit the 16-token budget... rotated away
    small = seq_of(8, start=100)
    sched.add(big)
    sched.add(small)
    seqs, is_prefill = sched.schedule()
    # big rotated to the back; nothing scheduled this call (break after rotate)
    assert seqs == [] and list(sched.waiting) == [small, big]
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [small]


def test_decode_only_when_no_prefill():
    sched = make_scheduler()
    a = seq_of(6)
    sched.add(a)
    seqs, is_prefill = sched.schedule()
    assert is_prefill
    sched.postprocess(seqs, [42])
    b = seq_of(6, start=50)
    sched.add(b)
    # prefill of b takes priority over decode of a
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [b]
    sched.postprocess(seqs, [43])
    seqs, is_prefill = sched.schedule()
    assert not is_prefill and seqs == [a, b]


def test_finish_on_eos_and_max_tokens():
    sched = make_scheduler()
    sched.eos = 99
    a = seq_of(4, max_tokens=2)
    b = seq_of(4, start=50, max_tokens=8)
    c = seq_of(4, start=80, max_tokens=8, ignore_eos=True)
    for s in (a, b, c):
        sched.add(s)
    seqs, _ = sched.schedule()
    sched.postprocess(seqs, [1, 99, 99])  # b hits EOS; c ignores EOS
    assert b.is_finished and not a.is_finished and not c.is_finished
    seqs, _ = sched.schedule()
    assert seqs == [a, c]
    sched.postprocess(seqs, [2, 3])
    assert a.is_finished  # hit max_tokens=2
    assert a.completion_token_ids == [1, 2]


def test_preemption_newest_victim_first():
    # pool of 4 blocks, block_size 4: two seqs of 8 tokens fill it exactly
    sched = make_scheduler(num_blocks=4, block_size=4, max_tokens_budget=64)
    a = seq_of(8, ignore_eos=True, max_tokens=50)
    b = seq_of(8, start=100, ignore_eos=True, max_tokens=50)
    sched.add(a)
    seqs, _ = sched.schedule()
    assert seqs == [a]
    sched.add(b)
    seqs, _ = sched.schedule()
    assert seqs == [b]
    # decode: a appended token 9 -> needs a new block; none free -> preempt b
    sched.postprocess([a], [1])
    sched.postprocess([b], [2])
    seqs, is_prefill = sched.schedule()
    assert not is_prefill
    assert seqs == [a]
    assert b.status == SequenceStatus.WAITING
    assert list(sched.waiting) == [b]
    assert a.block_table and len(a.block_table) == 3


def test_self_preemption_when_alone():
    sched = make_scheduler(num_blocks=2, block_size=4, max_tokens_budget=64)
    a = seq_of(8, ignore_eos=True, max_tokens=50)
    sched.add(a)
    seqs, _ = sched.schedule()
    assert seqs == [a]
    sched.postprocess([a], [1])  # 9 tokens -> needs 3rd block, pool has 2
    seqs, is_prefill = sched.schedule()
    assert seqs == [] and not is_prefill
    assert a.status == SequenceStatus.WAITING and a.block_table == []
    # next schedule() would re-prefill a, but it can never fit: 9 tokens needs
    # 3 blocks > 2 total. Verify it stays waiting rather than crashing.
    seqs, is_prefill = sched.schedule()
    assert seqs == []


def _finish_prefill(sched, seqs):
    """Simulate the engine's prefill postprocess with dummy sampled tokens."""
    sched.postprocess(seqs, [0] * len(seqs), is_prefill=True)


def test_chunked_prefill_splits_long_prompt():
    sched = make_scheduler(max_tokens_budget=16, num_blocks=64, block_size=4, chunked=True)
    big = seq_of(30)  # 30 tokens > 16 budget
    small = seq_of(8, start=100)
    sched.add(big)
    sched.add(small)

    # step 1: 16-token chunk of big (block-aligned), nothing else fits
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [big]
    assert big.scheduled_chunk == 16
    _finish_prefill(sched, seqs)
    assert big.num_computed_tokens == 16
    assert big.num_completion_tokens == 0  # mid-prompt chunk sampled nothing

    # step 2: final 14 tokens of big + nothing (budget 16 - 14 = 2 < small)
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [big]
    assert big.scheduled_chunk == 14
    _finish_prefill(sched, seqs)
    assert big.num_completion_tokens == 1  # final chunk sampled a token

    # step 3: small prefills; big is now decoding
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [small]


def test_chunked_prefill_batches_followers():
    sched = make_scheduler(max_tokens_budget=16, num_blocks=64, block_size=4, chunked=True)
    a = seq_of(6)
    b = seq_of(25, start=100)
    sched.add(a)
    sched.add(b)
    # a fits fully (6), b gets an 8-token aligned chunk from the remaining 10
    seqs, is_prefill = sched.schedule()
    assert is_prefill and seqs == [a, b]
    assert a.scheduled_chunk == 6 and b.scheduled_chunk == 8
    _finish_prefill(sched, seqs)
    assert a.num_completion_tokens == 1 and b.num_completion_tokens == 0
