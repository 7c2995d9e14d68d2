"""Host-side batch preparation (pure numpy, no device code).

Replaces the reference's ``_prepare_prefill`` / ``_prepare_decode`` + the
``Context`` thread-global (nanovllm/engine/model_runner.py:160-235,
nanovllm/utils/context.py): attention metadata becomes an explicit
``StepBatch`` pytree handed to the jitted step function — globals do not work
under ``jax.jit``.

Layout: a unified padded ``[B, Tq]`` layout for both prefill (Tq = longest
uncached prompt chunk) and decode (Tq = 1), so one jitted model step serves
both phases. Per-token KV-pool slots are precomputed here
(slot = block_id * block_size + offset); -1 marks padding and is dropped by
the device-side scatter.
"""

from dataclasses import dataclass

import numpy as np

from byox_vllm_tpu.engine.sequence import Sequence


@dataclass
class StepBatch:
    token_ids: np.ndarray  # [B, Tq] int32, 0-padded
    q_lens: np.ndarray  # [B] int32; number of real (new) tokens per row
    context_lens: np.ndarray  # [B] int32; total tokens incl. cached prefix
    slot_mapping: np.ndarray  # [B, Tq] int32; -1 = padding
    block_tables: np.ndarray  # [B, W] int32; -1 = padding
    temperatures: np.ndarray  # [B] float32
    is_prefill: bool
    top_k: np.ndarray | None = None  # [B] int32; 0 = off
    top_p: np.ndarray | None = None  # [B] float32; 1.0 = off
    seeds: np.ndarray | None = None  # [B] int32; -1 = engine key stream
    steps: np.ndarray | None = None  # [B] int32 per-seq sample counter

    @property
    def needs_filters(self) -> bool:
        return self.top_k is not None

    @property
    def num_seqs(self) -> int:
        return len(self.q_lens)

    @property
    def total_new_tokens(self) -> int:
        return int(self.q_lens.sum())


def _sampling_filters(seqs: list[Sequence]):
    """(top_k, top_p) arrays if any sequence uses them, else (None, None) —
    keeping the common path on the cheaper no-filter compiled program."""
    if any(s.top_k > 0 or s.top_p < 1.0 for s in seqs):
        return (
            np.array([s.top_k for s in seqs], dtype=np.int32),
            np.array([s.top_p for s in seqs], dtype=np.float32),
        )
    return None, None


def _sampling_seeds(seqs: list[Sequence]):
    """(seeds, steps) arrays if any sequence is seeded, else (None, None)."""
    if any(s.seed is not None for s in seqs):
        return (
            np.array([-1 if s.seed is None else s.seed for s in seqs], dtype=np.int32),
            np.array([s.num_completion_tokens + s.in_flight for s in seqs], dtype=np.int32),
        )
    return None, None


def _block_tables(seqs: list[Sequence]) -> np.ndarray:
    width = max(1, max(len(s.block_table) for s in seqs))
    table = np.full((len(seqs), width), -1, dtype=np.int32)
    for i, seq in enumerate(seqs):
        if seq.block_table:
            table[i, : len(seq.block_table)] = seq.block_table
    return table


def prepare_prefill(seqs: list[Sequence], block_size: int) -> StepBatch:
    """Prefill batch over each sequence's scheduled chunk: positions
    [num_computed, num_computed + chunk). An unchunked prompt's chunk is its
    whole uncached remainder; with chunked prefill a long prompt spans
    several steps and only the final chunk's logits are sampled."""
    n = len(seqs)
    q_lens = np.array(
        [s.scheduled_chunk or s.num_pending_prefill_tokens for s in seqs], dtype=np.int32
    )
    starts = np.array([s.num_computed_tokens for s in seqs], dtype=np.int32)
    context_lens = starts + q_lens
    tq = int(q_lens.max())
    token_ids = np.zeros((n, tq), dtype=np.int32)
    slot_mapping = np.full((n, tq), -1, dtype=np.int32)
    for i, seq in enumerate(seqs):
        start, q_len = int(starts[i]), int(q_lens[i])
        chunk = seq.token_ids[start : start + q_len]
        token_ids[i, : len(chunk)] = chunk
        if seq.block_table:
            positions = np.arange(start, start + q_len)
            block_ids = np.asarray(seq.block_table, dtype=np.int64)[positions // block_size]
            slot_mapping[i, : len(chunk)] = block_ids * block_size + positions % block_size
    return StepBatch(
        token_ids=token_ids,
        q_lens=q_lens,
        context_lens=context_lens,
        slot_mapping=slot_mapping,
        block_tables=_block_tables(seqs),
        temperatures=np.array([s.temperature for s in seqs], dtype=np.float32),
        is_prefill=True,
        top_k=_sampling_filters(seqs)[0],
        top_p=_sampling_filters(seqs)[1],
        seeds=_sampling_seeds(seqs)[0],
        steps=_sampling_seeds(seqs)[1],
    )


def prepare_decode(seqs: list[Sequence], block_size: int, lookahead: int = 1) -> StepBatch:
    """Decode batch. With lookahead K > 1 the slot mapping covers the K
    upcoming KV writes (positions len-1 .. len+K-2) so one device call can run
    K sampling iterations on-chip; the block manager reserved the capacity in
    ``may_append``."""
    n = len(seqs)
    token_ids = np.array([s.last_token for s in seqs], dtype=np.int32).reshape(n, 1)
    slots = np.empty((n, lookahead), dtype=np.int32)
    for i, s in enumerate(seqs):
        # in_flight > 0: a previous window's K tokens are still on the device
        # (async pipelining) — this window starts after them; its first input
        # token comes from the device-side carry, not host token_ids
        positions = len(s) + s.in_flight - 1 + np.arange(lookahead)
        block_ids = np.asarray(s.block_table, dtype=np.int64)[positions // block_size]
        slots[i] = block_ids * block_size + positions % block_size
    return StepBatch(
        token_ids=token_ids,
        q_lens=np.ones(n, dtype=np.int32),
        context_lens=np.array([len(s) + s.in_flight for s in seqs], dtype=np.int32),
        slot_mapping=slots,
        block_tables=_block_tables(seqs),
        temperatures=np.array([s.temperature for s in seqs], dtype=np.float32),
        is_prefill=False,
        top_k=_sampling_filters(seqs)[0],
        top_p=_sampling_filters(seqs)[1],
        seeds=_sampling_seeds(seqs)[0],
        steps=_sampling_seeds(seqs)[1],
    )


def lane_rows(group_sizes: list[int], stride: int) -> np.ndarray:
    """Destination row of each source row when lane group L occupies rows
    [L*stride, L*stride + group_sizes[L]) of the padded batch (data-parallel
    layout: shard_map splits the batch into contiguous per-lane chunks)."""
    return np.concatenate(
        [lane * stride + np.arange(n, dtype=np.int64) for lane, n in enumerate(group_sizes)]
    ) if group_sizes else np.zeros(0, np.int64)


def pad_batch(
    batch: StepBatch,
    num_seqs: int,
    num_tokens: int,
    table_width: int,
    rows: np.ndarray | None = None,
) -> StepBatch:
    """Pad a StepBatch up to bucketed [num_seqs, num_tokens] / table width so
    the jitted step function compiles once per bucket (the XLA analogue of the
    reference's CUDA-graph batch-size buckets, model_runner.py:256-297).
    Padding rows have q_len 0, context_len 0, slots/blocks -1.

    ``rows`` (optional, from ``lane_rows``) scatters source row i to padded
    row rows[i] instead of the identity layout — the data-parallel grouped
    placement."""
    b, tq = batch.token_ids.shape
    w = batch.block_tables.shape[1]
    assert num_seqs >= b and num_tokens >= tq and table_width >= w
    dst = np.arange(b) if rows is None else rows
    assert len(dst) == b and (b == 0 or dst.max() < num_seqs)

    def pad2(arr, rows_, cols, fill):
        out = np.full((rows_, cols), fill, dtype=arr.dtype)
        out[dst, : arr.shape[1]] = arr
        return out

    def pad1(arr, rows_, fill):
        out = np.full(rows_, fill, dtype=arr.dtype)
        out[dst] = arr
        return out

    return StepBatch(
        token_ids=pad2(batch.token_ids, num_seqs, num_tokens, 0),
        q_lens=pad1(batch.q_lens, num_seqs, 0),
        context_lens=pad1(batch.context_lens, num_seqs, 0),
        # decode lookahead: slot mapping may be wider than the token window
        slot_mapping=pad2(batch.slot_mapping, num_seqs, max(num_tokens, batch.slot_mapping.shape[1]), -1),
        block_tables=pad2(batch.block_tables, num_seqs, table_width, -1),
        temperatures=pad1(batch.temperatures, num_seqs, 1.0),
        is_prefill=batch.is_prefill,
        top_k=None if batch.top_k is None else pad1(batch.top_k, num_seqs, 0),
        top_p=None if batch.top_p is None else pad1(batch.top_p, num_seqs, np.float32(1.0)),
        seeds=None if batch.seeds is None else pad1(batch.seeds, num_seqs, -1),
        steps=None if batch.steps is None else pad1(batch.steps, num_seqs, 0),
    )


def prepare_spec_verify(
    seqs: list[Sequence], drafts: list[list[int]], block_size: int, num_spec_tokens: int
) -> tuple[StepBatch, np.ndarray, np.ndarray]:
    """Verification batch for speculative decoding: row b packs the last real
    token followed by its draft tokens (query positions len-1 .. len-1+d).
    Returns (StepBatch with Tq = num_spec_tokens + 1, draft matrix [B, K],
    num_drafts [B])."""
    n = len(seqs)
    tq = num_spec_tokens + 1
    token_ids = np.zeros((n, tq), dtype=np.int32)
    slot_mapping = np.full((n, tq), -1, dtype=np.int32)
    q_lens = np.empty(n, dtype=np.int32)
    context_lens = np.empty(n, dtype=np.int32)
    draft_matrix = np.zeros((n, num_spec_tokens), dtype=np.int32)
    num_drafts = np.zeros(n, dtype=np.int32)
    for i, (seq, d) in enumerate(zip(seqs, drafts)):
        nd = len(d)
        token_ids[i, 0] = seq.last_token
        token_ids[i, 1 : 1 + nd] = d
        draft_matrix[i, :nd] = d
        num_drafts[i] = nd
        q_lens[i] = 1 + nd
        context_lens[i] = len(seq) + nd
        positions = len(seq) - 1 + np.arange(1 + nd)
        block_ids = np.asarray(seq.block_table, dtype=np.int64)[positions // block_size]
        slot_mapping[i, : 1 + nd] = block_ids * block_size + positions % block_size
    batch = StepBatch(
        token_ids=token_ids,
        q_lens=q_lens,
        context_lens=context_lens,
        slot_mapping=slot_mapping,
        block_tables=_block_tables(seqs),
        temperatures=np.array([s.temperature for s in seqs], dtype=np.float32),
        is_prefill=False,
        top_k=_sampling_filters(seqs)[0],
        top_p=_sampling_filters(seqs)[1],
        seeds=_sampling_seeds(seqs)[0],
        steps=_sampling_seeds(seqs)[1],
    )
    return batch, draft_matrix, num_drafts
