"""Paged-KV block manager with hash-based prefix caching.

Behavioral parity with the reference (nanovllm/engine/block_manager.py:10-130):

- fixed pool of blocks, FIFO free list => approximate-LRU eviction
- chained per-block hashes over full blocks only (hash(parent_hash || tokens))
- cache hits bump ref counts; freed blocks keep their hash + token ids so a
  later request can resurrect them from the free list
- the hash -> block_id map deliberately keeps stale entries (token-id equality
  re-check guards against both staleness and hash collisions)
- ``may_append`` handles the decode-step block-boundary cases keyed on
  ``len(seq) % block_size``: 1 => the new token opened a fresh block;
  0 => the last block just filled and gets sealed with its hash.

This is pure-Python CPU control plane; device KV pages live in HBM and are
indexed by these block ids (see engine/model_runner.py).
"""

from collections import deque
from hashlib import blake2b

from byox_vllm_tpu.engine.sequence import Sequence
from byox_vllm_tpu.utils.logging import logger
from byox_vllm_tpu.utils.native import load_native

try:
    import xxhash

    def _hash_bytes(data: bytes) -> int:
        return xxhash.xxh64(data).intdigest()

except ImportError:  # pragma: no cover - xxhash is present in the image

    def _hash_bytes(data: bytes) -> int:
        return int.from_bytes(blake2b(data, digest_size=8).digest(), "little")


_native = load_native()


class Block:
    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.hash = -1
        self.token_ids: list[int] = []

    def __repr__(self):
        return f"block-{self.block_id}"

    def update(self, h: int, token_ids: list[int]) -> None:
        self.hash = h
        self.token_ids = token_ids

    def reset(self) -> None:
        self.ref_count = 1
        self.hash = -1
        self.token_ids = []


def compute_block_hash(token_ids: list[int], prefix: int = -1) -> int:
    """Chained block hash: covers the parent block's hash plus this block's
    token ids, so equal hashes imply equal full prefixes. Native C++ xxh64
    when available (csrc/native.cc, bit-identical byte stream)."""
    if _native is not None:
        return _native.hash_block(token_ids, 0 if prefix == -1 else prefix, prefix != -1)
    parts = bytearray()
    if prefix != -1:
        parts += prefix.to_bytes(8, "little", signed=False)
    for t in token_ids:
        parts += int(t).to_bytes(8, "little", signed=True)
    return _hash_bytes(bytes(parts))


class BlockManager:
    def __init__(self, num_blocks: int, block_size: int):
        assert num_blocks > 0 and block_size > 0
        self.block_size = block_size
        self.blocks = [Block(i) for i in range(num_blocks)]
        self.hash_to_block_id: dict[int, int] = {}
        self.free_block_ids: deque[int] = deque(range(num_blocks))
        self.used_block_ids: set[int] = set()

    # -- queries ----------------------------------------------------------

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_block_ids)

    def can_allocate(self, seq: Sequence) -> bool:
        return len(self.free_block_ids) >= seq.num_blocks

    def can_append(self, seq: Sequence, num_tokens: int = 1) -> bool:
        """True if the upcoming ``may_append(num_tokens)`` cannot run out of
        blocks. A decode call with ``num_tokens`` lookahead writes KV for
        positions len-1 .. len+num_tokens-2, so the table must cover
        len+num_tokens-1 tokens. num_tokens=1 reduces to the reference rule:
        a new block is needed exactly when the last appended token opened one
        (len % block_size == 1)."""
        needed_blocks = -(-(len(seq) + num_tokens - 1) // self.block_size)
        return len(self.free_block_ids) >= max(0, needed_blocks - len(seq.block_table))

    # -- allocation -------------------------------------------------------

    def _chained_hashes(self, seq: Sequence) -> list[int]:
        """Per-block chained hash for every FULL block of the sequence; -1 for
        the partial tail. Equal hashes imply equal whole prefixes."""
        hashes, parent = [], -1
        for i in range(seq.num_blocks):
            ids = seq.block(i)
            parent = compute_block_hash(ids, parent) if len(ids) == self.block_size else -1
            hashes.append(parent)
        return hashes

    def _reusable_prefix(self, seq: Sequence, hashes: list[int]) -> list[int]:
        """Block ids of the longest cached prefix run: consecutive full blocks
        from position 0 whose hash resolves to a pool block still holding
        identical token ids (the equality re-check guards against both hash
        collisions and deliberately-stale map entries)."""
        run: list[int] = []
        for i, h in enumerate(hashes):
            if h == -1:
                break
            bid = self.hash_to_block_id.get(h)
            if bid is None or self.blocks[bid].token_ids != seq.block(i):
                break
            run.append(bid)
        return run

    def allocate(self, seq: Sequence) -> None:
        """Give a (re)starting sequence its block table in two phases: claim
        the longest prefix-cache run, then draw fresh blocks for the rest.
        (A chained hash cannot match past the first miss, so the cached part
        is always a prefix run.)"""
        assert not seq.block_table, "sequence already holds blocks"
        hashes = self._chained_hashes(seq)
        reused = self._reusable_prefix(seq, hashes)

        for i, bid in enumerate(reused):
            if bid in self.used_block_ids:
                blk = self.blocks[bid]
                blk.ref_count += 1
            else:
                # hit on a freed block: resurrect it from the free list
                blk = self._take_block(bid)
            blk.update(hashes[i], seq.block(i))
            self.hash_to_block_id[hashes[i]] = bid
            seq.block_table.append(bid)

        for i in range(len(reused), seq.num_blocks):
            blk = self._take_block(self.free_block_ids[0])
            if hashes[i] != -1:
                blk.update(hashes[i], seq.block(i))
                self.hash_to_block_id[hashes[i]] = blk.block_id
            seq.block_table.append(blk.block_id)

        seq.num_cached_tokens = len(reused) * self.block_size
        if seq.num_cached_tokens == len(seq):
            # Fully-cached prompt: recompute the last token anyway — sampling
            # the next token needs its logits. (The reference would submit an
            # empty query chunk here, model_runner.py:169-178 — a latent bug.)
            seq.num_cached_tokens = len(seq) - 1
        seq.num_computed_tokens = seq.num_cached_tokens
        logger.debug("allocated %s blocks for %s (%d cached)", seq.num_blocks, seq, seq.num_cached_tokens)

    def deallocate(self, seq: Sequence) -> None:
        for block_id in reversed(seq.block_table):
            if block_id < 0:
                continue  # released early (sliding window)
            block = self.blocks[block_id]
            block.ref_count -= 1
            if block.ref_count == 0:
                self._release_block(block)
        seq.num_cached_tokens = 0
        seq.num_computed_tokens = 0
        seq.block_table.clear()

    def release_below_window(self, seq: Sequence, window: int) -> None:
        """Sliding-window models: blocks wholly below the attention floor can
        never be read again (every future query's band starts at
        len - window, which only moves forward; preemption recompute also
        attends the band only). Release them back to the pool and mark the
        table entries -1 — attention treats negative entries as padding, and
        the v3 kernel never even DMAs below-floor pages. Freed blocks keep
        their hash + tokens, so a later request sharing the prefix can still
        resurrect them (standard free-list semantics above)."""
        freeable = (len(seq) - window) // self.block_size
        table = seq.block_table
        for i in range(min(freeable, len(table))):
            bid = table[i]
            if bid < 0:
                continue
            table[i] = -1
            block = self.blocks[bid]
            block.ref_count -= 1
            if block.ref_count == 0:
                self._release_block(block)

    def may_append(self, seq: Sequence, num_tokens: int = 1) -> None:
        """Called once per scheduled decode call, before the model runs:
        (1) seal (hash) any blocks that filled since the last call — with
        multi-token decode lookahead several may have filled at once;
        (2) grow the block table to cover the ``num_tokens`` upcoming KV
        writes. num_tokens=1 matches the reference's one-boundary-at-a-time
        behavior (block_manager.py:83-107) exactly."""
        block_table = seq.block_table
        num_full = len(seq) // self.block_size
        for i in range(num_full):
            if block_table[i] < 0:
                continue  # released early (sliding window)
            block = self.blocks[block_table[i]]
            if block.hash != -1:
                continue
            token_ids = seq.block(i)
            prefix = self.blocks[block_table[i - 1]].hash if i > 0 else -1
            h = compute_block_hash(token_ids, prefix)
            block.update(h, token_ids)
            self.hash_to_block_id[h] = block.block_id
        needed_blocks = -(-(len(seq) + num_tokens - 1) // self.block_size)
        while len(block_table) < needed_blocks:
            block_id = self.free_block_ids[0]
            self._take_block(block_id)
            block_table.append(block_id)

    # -- internals --------------------------------------------------------

    def _take_block(self, block_id: int) -> Block:
        block = self.blocks[block_id]
        assert block.ref_count == 0
        block.reset()
        self.free_block_ids.remove(block_id)
        self.used_block_ids.add(block_id)
        return block

    def _release_block(self, block: Block) -> None:
        assert block.ref_count == 0
        self.used_block_ids.remove(block.block_id)
        self.free_block_ids.append(block.block_id)
        # NOTE: hash/token_ids and the hash_to_block_id entry are deliberately
        # kept so the block can be resurrected on a later prefix hit
        # (reference: block_manager.py:128-130).
