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
        """k draft tokens continuing ``token_ids``; [] if no n-gram of length
        in [min_n, max_n] recurs (most recent occurrence wins; native C++
        scan when available, numpy window match otherwise).

        Drafts are CYCLE-EXTENDED to the full k: the match ending q tokens
        before the sequence end implies period q, so position end+i predicts
        token_ids[end - q + (i % q)]. Without the wrap, the most recent match
        on a period-p loop sits ~p tokens from the end and the continuation
        slice truncates to ~p-n tokens — SPEC_r04 measured 1.11-token drafts
        at 0.90 acceptance, wasting the whole verify window (VERDICT r4 #3a).
        For a far-back match (q >= k) the wrap never triggers and this equals
        the plain continuation slice."""
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
                q = size - n - start  # inferred period (>= 1)
                return [token_ids[size - q + (i % q)] for i in range(self.k)]
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


class EagleProposer:
    """EAGLE feature-level drafting (models/eagle.py): the drafter consumes
    the TARGET's post-final-norm hidden states, so the engine's target runner
    is built with ``capture_hidden`` and this proposer harvests features from
    every prefill and verify step.

    State per live sequence: ``_done[sid]`` — drafter KV ingested through
    slot done-1 — and ``_feats[sid]`` — target features by position (f_p for
    the prefix ending at token p). Ingest of slot p pairs e(x_p) with
    f_{p-1}; positions whose features were never computed (prefix-cache hits,
    pre-preemption history) fall back to zeros — the rejection sampler keeps
    outputs exact regardless, only acceptance suffers.
    """

    wants_hidden = True

    def __init__(self, spec_config, target_config, target_runner):
        import jax
        import jax.numpy as jnp

        from byox_vllm_tpu.models.eagle import draft_spec, eagle_step, init_eagle_params
        from byox_vllm_tpu.models.qwen3 import make_kv_cache

        self.k = spec_config.num_speculative_tokens
        self.target = target_runner
        dtype = jnp.dtype(target_config.dtype)
        if spec_config.draft_params is not None:  # injected (tests)
            self.params = spec_config.draft_params
        elif spec_config.model:  # trained drafter pack (tools/eagle_pack.py)
            import os

            from byox_vllm_tpu.tools.eagle_pack import load_eagle_pack

            pack = spec_config.model
            if os.path.isdir(pack):
                pack = os.path.join(pack, "eagle.safetensors")
            self.params = load_eagle_pack(pack, target_runner.params, dtype)
        else:
            self.params = init_eagle_params(
                target_runner.params, target_runner.spec,
                spec_config.draft_num_layers, dtype, seed=target_config.seed,
            )
        if target_runner.tp > 1 or target_runner.dp > 1 or target_runner.pp > 1:
            # the drafter runs UNSHARDED (it is tiny; one device call per
            # draft step), but init/pack loading references the target's
            # embed/lm_head, which live sharded on the mesh — materialize
            # local unsharded copies so the drafter's jit sees one placement
            self.params = jax.tree.map(
                lambda x: jnp.asarray(np.asarray(jax.device_get(x))), self.params
            )
        # drafter geometry follows the loaded/injected trunk, not the config
        trunk = self.params["layers"]
        first = next(iter(trunk.values()))
        n_draft = len(first) if isinstance(first, list) else first.shape[0]
        from dataclasses import replace as _replace

        self.spec = _replace(
            draft_spec(target_runner.spec, n_draft),
            qk_norm="q_norm" in trunk,
            attention_bias="bqkv" in trunk,
        )
        self.kv = make_kv_cache(self.spec, target_runner.num_slots, dtype)
        from functools import partial

        self._step = jax.jit(
            partial(
                eagle_step, spec=self.spec, block_size=target_runner.block_size,
                attention_backend=target_config.attention_backend,
            ),
            donate_argnums=(1,),
        )
        self._jnp = jnp
        self._done: dict[int, int] = {}
        self._feats: dict[int, dict[int, np.ndarray]] = {}
        self._hidden_dim = target_runner.spec.hidden_size

    # -- feature harvesting -------------------------------------------------

    def _record(self, seq_id: int, start_pos: int, rows: np.ndarray) -> None:
        store = self._feats.setdefault(seq_id, {})
        for j in range(rows.shape[0]):
            store[start_pos + j] = rows[j]

    def observe_prefill(self, seqs, hidden_pack) -> None:
        hidden, rows = hidden_pack
        h = np.asarray(hidden, dtype=np.float32)
        for i, s in enumerate(seqs):
            chunk = s.scheduled_chunk or s.num_pending_prefill_tokens
            start = s.num_computed_tokens
            self._record(s.seq_id, start, h[rows[i], :chunk])

    def observe_verify(self, seqs, emitted_lists, hidden_pack) -> None:
        hidden, rows = hidden_pack
        h = np.asarray(hidden, dtype=np.float32)
        for i, s in enumerate(seqs):
            e = len(emitted_lists[i])  # accepted + 1 final sample
            self._record(s.seq_id, len(s) - 1, h[rows[i], :e])

    def forget(self, seq_id: int) -> None:
        self._done.pop(seq_id, None)
        self._feats.pop(seq_id, None)

    def _feat(self, seq_id: int, pos: int) -> np.ndarray:
        if pos < 0:
            return np.zeros(self._hidden_dim, np.float32)
        f = self._feats.get(seq_id, {}).get(pos)
        return f if f is not None else np.zeros(self._hidden_dim, np.float32)

    # -- drafting -------------------------------------------------------------

    def propose_all(self, seqs, max_draft: int) -> list[list[int]]:
        from byox_vllm_tpu.engine.model_runner import _next_bucket

        jnp = self._jnp
        r = self.target
        k = self.k if max_draft is None else min(self.k, max_draft)
        if k < 1:  # lookahead collapsed (e.g. max_model_len ceiling): no drafts
            return [[] for _ in seqs]
        n = len(seqs)
        bs = r.block_size
        dones = []
        for s in seqs:
            d = self._done.get(s.seq_id, 0)
            if d > len(s) or d < 1:
                d = 0  # preempted/unknown: re-ingest everything
            dones.append(d)

        # --- ingest slots d..len-1 + first draft ---------------------------
        q_lens = np.array([len(s) - d for s, d in zip(seqs, dones)], dtype=np.int32)
        tq = int(q_lens.max())
        npad = _next_bucket(n, r.seq_buckets)
        tqpad = _next_bucket(tq, r.token_buckets)
        wpad = _next_bucket(max(1, max(len(s.block_table) for s in seqs)), r.table_buckets)
        token_ids = np.zeros((npad, tqpad), dtype=np.int32)
        feats = np.zeros((npad, tqpad, self._hidden_dim), dtype=np.float32)
        slot_mapping = np.full((npad, tqpad), -1, dtype=np.int32)
        tables = np.full((npad, wpad), -1, np.int32)
        ctx = np.zeros(npad, dtype=np.int32)
        qpad = np.zeros(npad, dtype=np.int32)
        for i, (s, d) in enumerate(zip(seqs, dones)):
            toks = s.token_ids
            span = len(s) - d
            token_ids[i, :span] = toks[d:]
            for j in range(span):
                feats[i, j] = self._feat(s.seq_id, d + j - 1)
            pos = np.arange(d, len(s))
            blocks = np.asarray(s.block_table, dtype=np.int64)
            slot_mapping[i, :span] = blocks[pos // bs] * bs + pos % bs
            tables[i, : len(s.block_table)] = s.block_table
            ctx[i] = len(s)
            qpad[i] = span
        tok, feat, self.kv = self._step(
            self.params, self.kv,
            jnp.asarray(token_ids), jnp.asarray(feats), jnp.asarray(qpad),
            jnp.asarray(ctx), jnp.asarray(slot_mapping), jnp.asarray(tables),
        )
        for s in seqs:
            self._done[s.seq_id] = len(s)
            # features below done-1 can never be read again: bound the store
            # to the active window (an 8B hidden vector is 16 KB — unpruned,
            # a long generation would pin GBs of host RAM)
            store = self._feats.get(s.seq_id)
            if store:
                floor = len(s) - 1
                for pos in [p for p in store if p < floor]:
                    del store[pos]
        drafts = [np.asarray(tok)[:n].copy()]

        # --- K-1 autoregressive draft steps --------------------------------
        for j in range(1, k):
            slots = np.full((npad, 1), -1, dtype=np.int32)
            for i, s in enumerate(seqs):
                p = len(s) - 1 + j
                blocks = np.asarray(s.block_table, dtype=np.int64)
                if p // bs < len(blocks):
                    slots[i, 0] = blocks[p // bs] * bs + p % bs
            step_ctx = np.where(np.arange(npad) < n, ctx + j, 0).astype(np.int32)
            ql = np.where(np.arange(npad) < n, 1, 0).astype(np.int32)
            tok, feat, self.kv = self._step(
                self.params, self.kv,
                tok[:, None], feat[:, None, :], jnp.asarray(ql),
                jnp.asarray(step_ctx), jnp.asarray(slots), jnp.asarray(tables),
            )
            drafts.append(np.asarray(tok)[:n].copy())
        out = np.stack(drafts, axis=1)  # [n, k]
        return [row.tolist() for row in out]


class DraftModelProposer:
    """Draft-MODEL speculative decoding — the Eagle/Medusa-class mechanism
    generalized to any supported checkpoint (the reference's README names
    ngram/Medusa/Eagle as the intended scope, README.md:10-34): a small
    drafter model proposes K tokens greedily; the target scores all K
    positions in ONE verify call and rejection-samples (ops/spec_sampler.py),
    so per emitted token the big model runs ~1/(1+accepted) forwards.

    The drafter owns its own parameters and KV pools but SHARES the target's
    block tables: pool slots are position-indexed, so the scheduler's block
    allocations are valid for both models verbatim (the drafter pool is
    allocated with the same num_kvcache_blocks x block_size geometry).
    Draft-position rows written into the drafter pool are scratch — the next
    ingest overwrites those positions with the real (accepted) tokens' K/V.
    """

    def __init__(self, spec_config, target_config):
        import jax.numpy as jnp

        from byox_vllm_tpu.config import config_from_kwargs
        from byox_vllm_tpu.engine.model_runner import ModelRunner

        self.k = spec_config.num_speculative_tokens
        draft_cfg = config_from_kwargs(
            spec_config.model or "",
            hf_config=spec_config.draft_hf_config,
            dtype=target_config.dtype,
            quantization=spec_config.draft_quantization,
            kv_cache_dtype=target_config.kv_cache_dtype,
            kvcache_block_size=target_config.kvcache_block_size,
            num_kvcache_blocks=target_config.num_kvcache_blocks,
            max_model_len=target_config.max_model_len,
            max_num_seqs=target_config.max_num_seqs,
            max_num_batched_tokens=target_config.max_num_batched_tokens,
            tensor_parallel_size=target_config.tensor_parallel_size,
            data_parallel_size=target_config.data_parallel_size,
            attention_backend=target_config.attention_backend,
            seed=target_config.seed,
        )
        self.runner = ModelRunner(draft_cfg)
        self._jnp = jnp
        # tokens of each live sequence the drafter holds K/V for
        self._done: dict[int, int] = {}

    def observe_prefill(self, seqs) -> None:
        """Mirror a target prefill step on the drafter (same chunks, same
        block tables) so its KV stays in lockstep with the prompt."""
        self.runner.run(seqs, is_prefill=True)  # sampled tokens discarded
        for s in seqs:
            chunk = s.scheduled_chunk or s.num_pending_prefill_tokens
            self._done[s.seq_id] = s.num_computed_tokens + chunk

    def forget(self, seq_id: int) -> None:
        self._done.pop(seq_id, None)

    def propose_all(self, seqs, max_draft: int) -> list[list[int]]:
        """K greedy draft tokens per sequence: one prefill-style call ingests
        each sequence's unseen suffix (the tokens the last verify emitted)
        and produces draft 1; a K-1 decode window produces the rest."""
        import numpy as np

        from byox_vllm_tpu.engine.batch_prep import StepBatch, pad_batch
        from byox_vllm_tpu.engine.model_runner import _next_bucket

        jnp = self._jnp
        r = self.runner
        k = self.k if max_draft is None else min(self.k, max_draft)
        if k < 1:  # lookahead collapsed (e.g. max_model_len ceiling): no drafts
            return [[] for _ in seqs]
        n = len(seqs)
        bs = r.block_size
        dones = []
        for s in seqs:
            d = self._done.get(s.seq_id, 0)
            if d > len(s) - 1 or d < 1:
                d = 0  # preempted/unknown: re-ingest everything
            dones.append(d)

        # --- ingest + first draft (prefill-style: q_lens = suffix length) --
        q_lens = np.array([len(s) - d for s, d in zip(seqs, dones)], dtype=np.int32)
        tq = int(q_lens.max())
        token_ids = np.zeros((n, tq), dtype=np.int32)
        slot_mapping = np.full((n, tq), -1, dtype=np.int32)
        tables = np.full((n, max(1, max(len(s.block_table) for s in seqs))), -1, np.int32)
        for i, (s, d) in enumerate(zip(seqs, dones)):
            suffix = s.token_ids[d:]
            token_ids[i, : len(suffix)] = suffix
            pos = np.arange(d, len(s))
            blocks = np.asarray(s.block_table, dtype=np.int64)
            slot_mapping[i, : len(suffix)] = blocks[pos // bs] * bs + pos % bs
            tables[i, : len(s.block_table)] = s.block_table
        batch = StepBatch(
            token_ids=token_ids,
            q_lens=q_lens,
            context_lens=np.array([len(s) for s in seqs], dtype=np.int32),
            slot_mapping=slot_mapping,
            block_tables=tables,
            temperatures=np.zeros(n, dtype=np.float32),  # greedy drafts
            is_prefill=True,
        )
        # the drafter runner shares the target's mesh config: under dp > 1
        # its shard_map callers split rows per lane, so the batch must use
        # the same lane-grouped layout as the target's (rows from _layout)
        num_rows, rows = r._layout(seqs, n)
        padded = pad_batch(
            batch,
            num_seqs=num_rows,
            num_tokens=_next_bucket(tq, r.token_buckets),
            table_width=_next_bucket(tables.shape[1], r.table_buckets),
            rows=rows,
        )
        dst = np.arange(n) if rows is None else rows
        import jax

        self_key = jax.random.PRNGKey(0)  # greedy drafts: key is unused
        first, r.kv_cache = r._step(
            r.params, r.kv_cache,
            jnp.asarray(padded.token_ids), jnp.asarray(padded.q_lens),
            jnp.asarray(padded.context_lens), jnp.asarray(padded.slot_mapping),
            jnp.asarray(padded.block_tables), jnp.asarray(padded.temperatures),
            self_key, None, None, None,
        )
        for s in seqs:
            self._done[s.seq_id] = len(s)
        if k == 1:
            drafts = r._host_fetch(first)[dst][:, None]
            return [row.tolist() for row in drafts]

        # --- K-1 decode window continuing from draft 1 ---------------------
        npad = padded.token_ids.shape[0]
        slots = np.full((npad, k - 1), -1, dtype=np.int32)
        ctx = np.zeros(npad, dtype=np.int32)
        for i, s in enumerate(seqs):
            pos = len(s) + np.arange(k - 1)
            blocks = np.asarray(s.block_table, dtype=np.int64)
            slots[dst[i]] = blocks[pos // bs] * bs + pos % bs
            ctx[dst[i]] = len(s) + 1  # draft 1 is the current token of step 0
        rest, r.kv_cache = r._decode(
            r.params, r.kv_cache,
            first,
            jnp.asarray(ctx), jnp.asarray(slots),
            jnp.asarray(padded.block_tables),
            jnp.asarray(np.zeros(npad, dtype=np.float32)),
            self_key, None, None,
        )
        first = r._host_fetch(first)[dst]
        rest = r._host_fetch(rest)[dst]
        return [[int(first[i])] + rest[i].tolist() for i in range(n)]
