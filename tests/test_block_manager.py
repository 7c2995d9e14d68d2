"""BlockManager invariants — scenario parity with the reference's
tests/test_cache.py (prefix-cache lifecycle, resurrection, eviction order,
stale-hash semantics), rewritten for this implementation."""

from byox_vllm_tpu.engine.block_manager import BlockManager, compute_block_hash
from byox_vllm_tpu.engine.sequence import Sequence


def make_seq(tokens, block_size=4):
    return Sequence(list(tokens), block_size)


def test_prefix_cache_lifecycle():
    bm = BlockManager(10, 16)

    # seq A: 2.5 blocks -> all miss
    a = make_seq(list(range(40)), block_size=16)
    assert bm.can_allocate(a)
    bm.allocate(a)
    assert a.block_table == [0, 1, 2]
    assert a.num_cached_tokens == 0
    h0 = compute_block_hash(list(range(16)), -1)
    h1 = compute_block_hash(list(range(16, 32)), h0)
    assert bm.blocks[0].hash == h0
    assert bm.blocks[1].hash == h1
    assert bm.blocks[2].hash == -1  # partial block: never hashed
    assert bm.hash_to_block_id[h0] == 0 and bm.hash_to_block_id[h1] == 1

    # seq B: same prefix, while A is running -> hits bump ref counts
    b = make_seq(list(range(40)), block_size=16)
    bm.allocate(b)
    assert b.block_table == [0, 1, 3]  # full blocks shared, partial block fresh
    assert b.num_cached_tokens == 32
    assert bm.blocks[0].ref_count == 2 and bm.blocks[1].ref_count == 2

    bm.deallocate(a)
    bm.deallocate(b)
    assert b.block_table == [] and b.num_cached_tokens == 0
    assert bm.num_free_blocks == 10

    # seq C: same prefix after free -> resurrection from the free list
    c = make_seq(list(range(40)), block_size=16)
    bm.allocate(c)
    assert c.block_table[:2] == [0, 1]
    assert c.num_cached_tokens == 32
    assert 0 in bm.used_block_ids and 1 in bm.used_block_ids
    bm.deallocate(c)


def test_miss_latches_for_rest_of_sequence():
    bm = BlockManager(10, 4)
    a = make_seq([1, 2, 3, 4, 5, 6, 7, 8], block_size=4)
    bm.allocate(a)
    # same first block, different second block, identical third block content
    b = make_seq([1, 2, 3, 4, 9, 9, 9, 9, 5, 6, 7, 8], block_size=4)
    bm.allocate(b)
    assert b.num_cached_tokens == 4  # only the first block hit
    # chained hash means b's block 3 cannot alias a's block 2 even though
    # its token ids appear elsewhere
    assert b.block_table[0] == a.block_table[0]
    assert b.block_table[1] != a.block_table[1]


def test_eviction_is_fifo_approx_lru():
    bm = BlockManager(4, 4)
    a = make_seq(list(range(8)))  # blocks 0,1
    bm.allocate(a)
    b = make_seq(list(range(100, 108)))  # blocks 2,3
    bm.allocate(b)
    bm.deallocate(a)  # frees 1 then 0 -> free list [1, 0]
    bm.deallocate(b)  # -> free list [1, 0, 3, 2]
    assert list(bm.free_block_ids) == [1, 0, 3, 2]
    # a fresh 4-block seq consumes in FIFO order
    c = make_seq(list(range(200, 216)))
    bm.allocate(c)
    assert c.block_table == [1, 0, 3, 2]


def test_stale_hash_mapping_kept_on_free():
    """Freed blocks keep their hash and the map keeps (possibly stale)
    entries; token-id comparison on lookup guards correctness."""
    bm = BlockManager(1, 4)
    a = make_seq([1, 2, 3, 4])
    bm.allocate(a)
    h = compute_block_hash([1, 2, 3, 4], -1)
    assert bm.hash_to_block_id[h] == 0
    bm.deallocate(a)
    assert bm.blocks[0].hash == h  # kept
    assert h in bm.hash_to_block_id  # stale entry kept by design

    # freed-block hit still works: same tokens resurrect block 0. A fully
    # cached prompt keeps one token uncached (its logits must be computed).
    a2 = make_seq([1, 2, 3, 4])
    bm.allocate(a2)
    assert a2.block_table == [0] and a2.num_cached_tokens == 3
    bm.deallocate(a2)

    # overwrite block 0 with different content; the stale entry for h now
    # points at a block whose token_ids differ -> treated as a miss
    b = make_seq([9, 9, 9, 9])
    bm.allocate(b)
    assert b.block_table == [0]
    bm.deallocate(b)
    c = make_seq([1, 2, 3, 4])
    bm.allocate(c)
    assert c.num_cached_tokens == 0  # hash found but token ids mismatch
    assert c.block_table == [0]


def test_may_append_block_boundaries():
    bm = BlockManager(8, 4)
    seq = make_seq([1, 2, 3])
    bm.allocate(seq)
    assert seq.block_table == [0]

    # 3 -> 4 tokens: last block fills; may_append seals it with a hash
    seq.append_token(4)
    assert bm.can_append(seq)
    bm.may_append(seq)
    assert bm.blocks[0].hash == compute_block_hash([1, 2, 3, 4], -1)
    assert seq.block_table == [0]

    # 4 -> 5 tokens: new block needed
    seq.append_token(5)
    assert bm.can_append(seq)
    bm.may_append(seq)
    assert seq.block_table == [0, 1]
    assert bm.blocks[1].hash == -1

    # 5 -> 6: middle of a block, nothing happens
    seq.append_token(6)
    bm.may_append(seq)
    assert seq.block_table == [0, 1]


def test_can_append_requires_free_block_at_boundary():
    bm = BlockManager(1, 4)
    seq = make_seq([1, 2, 3, 4])
    bm.allocate(seq)  # full block is hashed at allocation time
    seq.append_token(5)  # decode step appended a token -> needs a new block
    assert not bm.can_append(seq)  # none free
