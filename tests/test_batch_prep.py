"""Batch-prep tests — scenario parity with the reference's
tests/test_prepare_funcs.py (exact tensors for prefill/decode, single/multi
seq, with/without cached prefix), but device-free numpy and our padded
[B, Tq] layout instead of the packed-varlen + Context-global layout."""

import numpy as np

from byox_vllm_tpu.engine.batch_prep import pad_batch, prepare_decode, prepare_prefill
from byox_vllm_tpu.engine.block_manager import BlockManager
from byox_vllm_tpu.engine.sequence import Sequence

BS = 4


def test_prefill_single_seq_no_cache():
    bm = BlockManager(8, BS)
    seq = Sequence([10, 11, 12, 13, 14, 15], BS)
    bm.allocate(seq)
    batch = prepare_prefill([seq], BS)
    assert batch.is_prefill
    np.testing.assert_array_equal(batch.token_ids, [[10, 11, 12, 13, 14, 15]])
    np.testing.assert_array_equal(batch.q_lens, [6])
    np.testing.assert_array_equal(batch.context_lens, [6])
    # blocks 0 and 1 -> slots 0..5
    np.testing.assert_array_equal(batch.slot_mapping, [[0, 1, 2, 3, 4, 5]])
    np.testing.assert_array_equal(batch.block_tables, [[0, 1]])


def test_prefill_multi_seq_ragged():
    bm = BlockManager(8, BS)
    a = Sequence([1, 2, 3, 4, 5], BS)  # 5 tokens -> blocks 0,1
    b = Sequence([7, 8], BS)  # 2 tokens -> block 2
    bm.allocate(a)
    bm.allocate(b)
    batch = prepare_prefill([a, b], BS)
    np.testing.assert_array_equal(batch.token_ids, [[1, 2, 3, 4, 5], [7, 8, 0, 0, 0]])
    np.testing.assert_array_equal(batch.q_lens, [5, 2])
    np.testing.assert_array_equal(batch.slot_mapping, [[0, 1, 2, 3, 4], [8, 9, -1, -1, -1]])
    np.testing.assert_array_equal(batch.block_tables, [[0, 1], [2, -1]])


def test_prefill_with_cached_prefix():
    bm = BlockManager(8, BS)
    a = Sequence(list(range(8)), BS)
    bm.allocate(a)
    # same first block -> 4 cached tokens
    b = Sequence(list(range(4)) + [100, 101], BS)
    bm.allocate(b)
    assert b.num_cached_tokens == 4
    batch = prepare_prefill([b], BS)
    # only the uncached chunk becomes query tokens
    np.testing.assert_array_equal(batch.token_ids, [[100, 101]])
    np.testing.assert_array_equal(batch.q_lens, [2])
    np.testing.assert_array_equal(batch.context_lens, [6])
    # b's second block is block 2 -> slots 8,9
    np.testing.assert_array_equal(batch.slot_mapping, [[8, 9]])
    np.testing.assert_array_equal(batch.block_tables, [[0, 2]])


def test_decode_slots_and_tables():
    bm = BlockManager(8, BS)
    a = Sequence([1, 2, 3, 4, 5], BS)  # blocks 0,1; last token in block 1 slot 4
    b = Sequence([7, 8], BS)  # block 2; last token slot 9
    bm.allocate(a)
    bm.allocate(b)
    batch = prepare_decode([a, b], BS)
    assert not batch.is_prefill
    np.testing.assert_array_equal(batch.token_ids, [[5], [8]])
    np.testing.assert_array_equal(batch.q_lens, [1, 1])
    np.testing.assert_array_equal(batch.context_lens, [5, 2])
    np.testing.assert_array_equal(batch.slot_mapping, [[4], [9]])
    np.testing.assert_array_equal(batch.block_tables, [[0, 1], [2, -1]])


def test_pad_batch_to_buckets():
    bm = BlockManager(8, BS)
    a = Sequence([1, 2, 3], BS)
    bm.allocate(a)
    batch = prepare_prefill([a], BS)
    padded = pad_batch(batch, num_seqs=4, num_tokens=8, table_width=4)
    assert padded.token_ids.shape == (4, 8)
    np.testing.assert_array_equal(padded.q_lens, [3, 0, 0, 0])
    np.testing.assert_array_equal(padded.context_lens, [3, 0, 0, 0])
    assert (padded.slot_mapping[1:] == -1).all()
    assert (padded.slot_mapping[0, 3:] == -1).all()
    assert (padded.block_tables[0, 1:] == -1).all()
    np.testing.assert_array_equal(padded.temperatures, [1.0, 1.0, 1.0, 1.0])
