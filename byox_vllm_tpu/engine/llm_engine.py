"""Engine orchestrator: request lifecycle + the serving busy-loop.

Parity with the reference LLMEngine (nanovllm/engine/llm_engine.py:17-104):
``generate`` adds all requests then drains with ``_step`` (schedule -> run ->
postprocess), reporting live prefill/decode tok/s, returning results ordered
by sequence id. Differences:

- no worker processes to spawn: the runner is a single SPMD program (the
  reference forks TP ranks at llm_engine.py:26-31)
- the KV pool size is decided by the runner before the scheduler is built
  (same ordering constraint as the reference, model_runner.py:133)
- prompts may be strings (tokenizer required) or raw token-id lists.
"""

import time

from byox_vllm_tpu.config import config_from_kwargs
from byox_vllm_tpu.engine.metrics import EngineMetrics
from byox_vllm_tpu.engine.model_runner import ModelRunner
from byox_vllm_tpu.engine.scheduler import make_scheduler
from byox_vllm_tpu.engine.sequence import Sequence
from byox_vllm_tpu.sampling_params import SamplingParams
from byox_vllm_tpu.utils.logging import logger


class LLMEngine:
    def __init__(self, model: str = "", **kwargs):
        config = kwargs.pop("config", None)
        if config is None:
            config = config_from_kwargs(model, **kwargs)
        self.config = config

        self.tokenizer = None
        if config.model:
            try:
                from transformers import AutoTokenizer

                self.tokenizer = AutoTokenizer.from_pretrained(config.model)
            except Exception as e:  # weights-only dirs (tests, benchmarks)
                logger.warning("no tokenizer loaded from %s (%s); token-id prompts only", config.model, e)
            if self.tokenizer is not None and self.tokenizer.eos_token_id is not None and config.eos < 0:
                config.eos = self.tokenizer.eos_token_id
        if config.eos < 0:
            config.eos = getattr(config.hf_config, "eos_token_id", -1) or -1

        self.model_runner = ModelRunner(config)  # fills config.num_kvcache_blocks

        # speculative decoding (the reference accepts this config and drops
        # it, llm_engine.py:18; here it is wired end to end)
        self.proposer = None
        self.spec_metrics = None
        lookahead = config.num_decode_steps
        sc = config.speculative_config
        if sc is not None and sc.method is not None:
            from byox_vllm_tpu.engine.spec import (
                DraftModelProposer,
                EagleProposer,
                NgramProposer,
                SpecMetrics,
            )

            if sc.method == "ngram":
                self.proposer = NgramProposer(
                    sc.num_speculative_tokens, sc.prompt_lookup_min, sc.prompt_lookup_max
                )
                # on-device multi-round drafting (model_runner.run_spec_ngram):
                # M rounds per host trip; 0 = host proposer every round
                rounds = 8 if config.spec_rounds is None else config.spec_rounds
                if config.enforce_eager:
                    rounds = 0
                self._spec_device_rounds = max(0, rounds)
            elif sc.method == "draft_model":
                self.proposer = DraftModelProposer(sc, config)
            elif sc.method == "eagle":
                self.proposer = EagleProposer(sc, config, self.model_runner)
            else:
                raise AssertionError(f"unsupported speculative method {sc.method!r}")
            self.spec_metrics = SpecMetrics()
            lookahead = sc.num_speculative_tokens + 1
            if getattr(self, "_spec_device_rounds", 0):
                # the scheduler reserves KV for the whole on-device window;
                # _pick_lookahead halves it (rounds stay integral: the window
                # is rounds * (k+1)) when max_model_len headroom runs short
                lookahead = self._spec_device_rounds * lookahead
        # KV blocks below the sliding-window floor are releasable only when
        # EVERY layer is windowed (Qwen2 keeps lower layers full-attention)
        mspec = self.model_runner.spec
        free_window = (
            mspec.sliding_window
            if getattr(mspec, "sliding_window", None) and mspec.first_window_layer == 0
            else None
        )
        self.scheduler = make_scheduler(config, decode_lookahead=lookahead, free_window=free_window)
        self._stats = {"prefill_tok_s": 0.0, "decode_tok_s": 0.0}
        self.metrics = EngineMetrics()
        # async pipelined decode state: the window currently in flight —
        # (PendingDecode, seqs list, zombie seqs awaiting deferred dealloc)
        self._pending = None
        # async prefill state: the prefill batch currently in flight —
        # (runner handle, seqs list, dispatch timestamp). Consecutive prefill
        # steps chain: batch n's host fetch overlaps batch n+1 executing on
        # device, so a burst of prefills pays ONE tunnel round trip of
        # exposed latency instead of one per batch.
        self._pending_prefill = None
        # interpreter-exit backstop, like the reference's atexit registration
        # (llm_engine.py:36): drop device state so a crashed caller doesn't
        # pin HBM until process teardown races the backend's own shutdown
        import atexit
        import weakref

        self._exited = False
        atexit.register(lambda ref=weakref.ref(self): ref() and ref().exit())

    # -- request lifecycle ------------------------------------------------

    def add_request(self, prompt: str | list[int], sampling_params: SamplingParams) -> Sequence:
        if isinstance(prompt, str):
            assert self.tokenizer is not None, "string prompts require a tokenizer (model dir)"
            token_ids = self.tokenizer.encode(prompt)
        else:
            token_ids = list(prompt)
        assert 0 < len(token_ids) <= self.config.max_model_len, (
            f"prompt length {len(token_ids)} outside (0, {self.config.max_model_len}]"
        )
        seq = Sequence(token_ids, self.config.kvcache_block_size, sampling_params)
        seq.arrival_time = time.perf_counter()
        self.scheduler.add(seq)
        return seq

    def step(self) -> tuple[list[tuple[int, list[int]]], int]:
        """One scheduling+model step. Returns (finished outputs, num tokens
        processed: +N prefill tokens or -B decode batch size, mirroring the
        reference's throughput accounting at llm_engine.py:95-100).

        With ``config.async_decode`` the decode path runs one window ahead of
        the host: window n+1 is dispatched from window n's on-device tokens
        BEFORE window n is fetched, so the host round trip hides under device
        compute. A step then commits the PREVIOUS window's tokens. The
        pipeline flushes before any prefill, on batch-composition changes,
        and for speculative decoding."""
        pipelining = self.config.async_decode and self.proposer is None
        if self._pending_prefill is not None:
            # a prefill batch is in flight: chain the next prefill behind it
            # (batch n's fetch overlaps batch n+1 on device). If the
            # scheduler wants to decode instead, drain the prefill pipeline
            # first — decode needs the committed first tokens, and a drawn
            # decode schedule is side-effect-safe to discard (may_append is
            # idempotent) while a drawn prefill is not.
            seqs_p, is_p = self.scheduler.schedule()
            if is_p and seqs_p:
                return self._pipeline_prefill_step(seqs_p)
            return self._commit_prefill()
        if self._pending is not None and self.scheduler.waiting:
            # a prefill is (likely) imminent. Overlap path: dispatch it
            # BEHIND the in-flight decode window (the device runs window then
            # prefill back to back) and fetch both with one sync — no drain
            # stall, no flush round trip. Falls back to a plain flush when
            # nothing is schedulable (e.g. no free blocks) or a proposer
            # needs prefill observation hooks.
            overlap_ok = self.config.overlap_prefill and (
                self.proposer is None or not hasattr(self.proposer, "observe_prefill")
            )
            if overlap_ok:
                seqs_p, is_p = self.scheduler.schedule()
                if is_p and seqs_p:
                    return self._overlap_prefill_step(seqs_p)
                # a decode schedule drawn here is side-effect-safe to discard
                # (may_append is idempotent); flush and reschedule fresh
            return self._commit_pending()
        seqs, is_prefill = self.scheduler.schedule()
        if is_prefill and seqs and self._prefill_pipeline_ok():
            # start (or continue) the async prefill pipeline; the decode
            # pipeline is necessarily idle here (a prefill schedule implies
            # a non-empty waiting queue, which the overlap branch above
            # intercepts while a decode window is in flight)
            return self._pipeline_prefill_step(seqs)
        if pipelining and not is_prefill:
            if not seqs:
                if self._pending is not None:
                    return self._commit_pending()
                return [], 0
            lookahead = self.scheduler.last_lookahead
            pend = self._pending
            if pend is None:
                self._pending = (
                    self.model_runner.dispatch_decode(seqs, lookahead),
                    list(seqs),
                    [],
                )
                self.metrics.decode_model_steps += lookahead
                for s in seqs:
                    s.in_flight += lookahead
                return [], 0
            prev, prev_seqs, zombies = pend
            if prev_seqs == seqs and prev.lookahead == lookahead:
                nxt = self.model_runner.dispatch_decode(seqs, lookahead, carry=prev.tokens)
                self.metrics.decode_model_steps += lookahead
                for s in seqs:
                    s.in_flight += lookahead
                self._pending = (nxt, list(seqs), [])
                return self._commit_window(prev, prev_seqs, zombies, defer=set(seqs))
            # composition changed (finishes last commit): discarding a decode
            # schedule is side-effect-safe (may_append is idempotent), so
            # flush and let the next step reschedule fresh
            return self._commit_pending()
        if self._pending is not None:
            # prefill scheduled or pipelining disabled mid-run: the decode
            # pipeline must drain first. A scheduled prefill cannot be
            # discarded, so flush happens before schedule() above; reaching
            # here means schedule() returned prefill with an empty waiting
            # queue snapshot — impossible — or pipelining toggled. Flush.
            return self._commit_pending()
        if not seqs:
            return [], 0
        prefill_tokens = sum(s.scheduled_chunk for s in seqs) if is_prefill else 0
        if is_prefill:
            # prefix-cache accounting must happen NOW: deallocate zeroes
            # num_cached_tokens, so post-run reads always see 0
            for s in seqs:
                # first chunk of this prefill (allocate() starts computed at
                # cached; later chunks advance computed past it). Each request
                # counts ONCE: a preempted seq re-prefills, and counting the
                # recompute pass again would skew prefix_cached_token_frac
                # under memory pressure (ADVICE r4).
                if s.num_computed_tokens == s.num_cached_tokens and not s.prompt_counted:
                    s.prompt_counted = True
                    self.metrics.prompt_tokens += s.num_tokens
                    self.metrics.cached_prompt_tokens += s.num_cached_tokens
        if not is_prefill and self.proposer is not None:
            k = self.proposer.k
            rounds = (
                self.scheduler.last_lookahead // (k + 1)
                if getattr(self, "_spec_device_rounds", 0)
                else 0
            )
            if rounds >= 1:
                # on-device multi-round path (ngram only): M draft+verify
                # rounds per dispatch, one host trip total
                token_ids, drafts_m, accepted_m = self.model_runner.run_spec_ngram(
                    seqs, k, rounds, self.proposer.min_n, self.proposer.max_n,
                    self.config.spec_ngram_window,
                )
                self.metrics.decode_model_steps += rounds
                for m in range(rounds):
                    for i in range(len(seqs)):
                        d = int(drafts_m[m, i])
                        self.spec_metrics.record(d, min(int(accepted_m[m, i]), d))
            else:
                max_draft = self.scheduler.last_lookahead - 1
                if hasattr(self.proposer, "propose_all"):  # draft-model proposer
                    drafts = [d[:max_draft] for d in self.proposer.propose_all(seqs, max_draft)]
                else:
                    drafts = [self.proposer.propose(s.token_ids)[:max_draft] for s in seqs]
                token_ids, accepted = self.model_runner.run_spec(
                    seqs, drafts, self.proposer.k
                )
                self.metrics.decode_model_steps += 1
                for d, a in zip(drafts, accepted):
                    self.spec_metrics.record(len(d), min(int(a), len(d)))
            if getattr(self.proposer, "wants_hidden", False):
                # eagle: harvest the verify step's target features
                self.proposer.observe_verify(seqs, token_ids, self.model_runner.last_hidden)
        else:
            token_ids = self.model_runner.run(seqs, is_prefill, self.scheduler.last_lookahead)
            if not is_prefill:
                self.metrics.decode_model_steps += self.scheduler.last_lookahead
            if is_prefill and self.proposer is not None and hasattr(self.proposer, "observe_prefill"):
                if getattr(self.proposer, "wants_hidden", False):
                    self.proposer.observe_prefill(seqs, self.model_runner.last_hidden)
                else:
                    # the drafter mirrors the prompt so its KV stays in lockstep
                    self.proposer.observe_prefill(seqs)
        appended = self.scheduler.postprocess(seqs, token_ids, is_prefill)
        now = time.perf_counter()
        for seq in seqs:
            if seq.first_token_time is None and seq.num_completion_tokens > 0:
                seq.first_token_time = now
            if seq.is_finished and seq.finish_time is None:
                seq.finish_time = now
                self.metrics.record_request(seq)
        if is_prefill:
            self.metrics.prefill_tokens += prefill_tokens
        else:
            self.metrics.decode_tokens += appended
        outputs = [
            (seq.seq_id, seq.completion_token_ids) for seq in seqs if seq.is_finished
        ]
        if self.proposer is not None and hasattr(self.proposer, "forget"):
            for seq_id, _ in outputs:
                self.proposer.forget(seq_id)
        num_tokens = prefill_tokens if is_prefill else -appended
        return outputs, num_tokens

    def is_finished(self) -> bool:
        return (
            self.scheduler.is_finished()
            and self._pending is None
            and self._pending_prefill is None
        )

    # -- async pipelined decode internals ----------------------------------

    def _prefill_pipeline_ok(self) -> bool:
        # proposers with prefill observation hooks need the sync path (they
        # read last_hidden / mirror the prompt right after the run)
        return self.config.overlap_prefill and (
            self.proposer is None or not hasattr(self.proposer, "observe_prefill")
        )

    def _dispatch_prefill_batch(self, seqs_p):
        """Prefix-cache accounting + async dispatch of one prefill batch.
        Returns True if the batch ends in a mid-prompt chunk (the scheduler
        re-schedules that head from progress only postprocess advances, so
        such a batch must commit synchronously)."""
        for s in seqs_p:
            # each request counts ONCE (ADVICE r4): deallocate zeroes
            # num_cached_tokens, so the accounting must happen pre-run
            if s.num_computed_tokens == s.num_cached_tokens and not s.prompt_counted:
                s.prompt_counted = True
                self.metrics.prompt_tokens += s.num_tokens
                self.metrics.cached_prompt_tokens += s.num_cached_tokens
        chunked = any(
            s.scheduled_chunk != s.num_pending_prefill_tokens for s in seqs_p
        )
        handle = self.model_runner.dispatch_prefill(seqs_p)
        for s in seqs_p:
            # non-preemptible until the fetch: the device is writing these
            # blocks (scheduler._schedule_decode's preemption guard)
            s.prefill_in_flight = True
        self._pending_prefill = (handle, seqs_p, time.perf_counter())
        return chunked

    def _pipeline_prefill_step(self, seqs_p) -> tuple[list, int]:
        """Dispatch a prefill batch and commit the PREVIOUS in-flight one:
        its host fetch overlaps this batch executing on device, so a run of
        prefill steps exposes one host round trip total instead of one per
        batch (at serving batch sizes the tunnel RTT was ~25% of offline
        prefill wall)."""
        prev = self._pending_prefill
        self._pending_prefill = None
        chunked = self._dispatch_prefill_batch(seqs_p)
        outputs, num_tokens = [], 0
        if prev is not None:
            outputs, num_tokens = self._commit_prefill(prev)
        if chunked:
            out2, n2 = self._commit_prefill()
            outputs, num_tokens = outputs + out2, num_tokens + n2
        return outputs, num_tokens

    def _commit_prefill(self, pend=None) -> tuple[list, int]:
        """Fetch an in-flight prefill batch (default: the pending one) and
        apply its tokens."""
        if pend is None:
            pend, self._pending_prefill = self._pending_prefill, None
        handle, seqs_p, _t0 = pend
        prefill_tokens = sum(s.scheduled_chunk for s in seqs_p)
        tokens_p = self.model_runner.fetch_prefill(handle)
        for s in seqs_p:
            s.prefill_in_flight = False
        self.scheduler.postprocess(seqs_p, tokens_p, is_prefill=True)
        now = time.perf_counter()
        for seq in seqs_p:
            if seq.first_token_time is None and seq.num_completion_tokens > 0:
                seq.first_token_time = now
            if seq.is_finished and seq.finish_time is None:
                seq.finish_time = now
                self.metrics.record_request(seq)
        self.metrics.prefill_tokens += prefill_tokens
        outputs = [(s.seq_id, s.completion_token_ids) for s in seqs_p if s.is_finished]
        return outputs, prefill_tokens

    def _overlap_prefill_step(self, seqs_p) -> tuple[list, int]:
        """Queue a prefill behind the in-flight decode window, then commit
        the window (its fetch overlaps the prefill executing on device). The
        prefill itself stays pending so a following prefill can chain behind
        it (_pipeline_prefill_step)."""
        chunked = self._dispatch_prefill_batch(seqs_p)
        outputs, num_tokens = self._commit_pending()
        if chunked:
            out2, _ = self._commit_prefill()
            outputs = outputs + out2
        return outputs, num_tokens

    def _commit_pending(self) -> tuple[list, int]:
        pend, seqs, zombies = self._pending
        self._pending = None
        return self._commit_window(pend, seqs, zombies, defer=None)

    def _commit_window(self, pend, seqs, zombies, defer) -> tuple[list, int]:
        """Fetch a dispatched window's tokens and apply them: postprocess the
        still-live seqs (finishers within ``defer`` keep their blocks until
        the next window is fetched), then free the blocks of zombies from the
        window before this one (their in-flight writes have now completed)."""
        from byox_vllm_tpu.engine.sequence import SequenceStatus

        token_lists = self.model_runner.fetch_decode(pend)
        for s in seqs:
            s.in_flight -= pend.lookahead
        live = [
            (s, t) for s, t in zip(seqs, token_lists) if s.status != SequenceStatus.FINISHED
        ]
        appended = self.scheduler.postprocess(
            [s for s, _ in live], [t for _, t in live], defer_dealloc=defer
        )
        newly_finished = [s for s, _ in live if s.status == SequenceStatus.FINISHED]
        if defer is not None and self._pending is not None:
            # finishers' blocks are written by the window just dispatched:
            # hold them until that window is fetched
            self._pending[2].extend(s for s in newly_finished if s in defer)
        for z in zombies:
            self.scheduler.release_deferred(z)
        now = time.perf_counter()
        for seq, _ in live:
            if seq.first_token_time is None and seq.num_completion_tokens > 0:
                seq.first_token_time = now
            if seq.is_finished and seq.finish_time is None:
                seq.finish_time = now
                self.metrics.record_request(seq)
        self.metrics.decode_tokens += appended
        outputs = [(s.seq_id, s.completion_token_ids) for s in newly_finished]
        return outputs, -appended

    # -- batch API --------------------------------------------------------

    def exit(self) -> None:
        """Release device state (KV pool, params). Idempotent; also runs at
        interpreter exit via atexit. The reference needs an atexit + RPC
        shutdown dance across worker processes (llm_engine.py:36,78-82);
        in SPMD dropping the references suffices — there are no worker
        processes to join and no collectives to unwedge."""
        if self._exited:
            return
        self._exited = True
        self._pending = None
        self._pending_prefill = None
        self.model_runner.kv_cache = None
        self.model_runner.params = None

    def generate(
        self,
        prompts: list[str] | list[list[int]],
        sampling_params: SamplingParams | list[SamplingParams] | None = None,
        use_tqdm: bool = True,
    ) -> list[dict]:
        if sampling_params is None:
            sampling_params = SamplingParams()
        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(prompts)
        assert len(sampling_params) == len(prompts)

        pbar = None
        if use_tqdm:
            from tqdm.auto import tqdm

            pbar = tqdm(total=len(prompts), desc="Generating", dynamic_ncols=True)

        for prompt, sp in zip(prompts, sampling_params):
            self.add_request(prompt, sp)

        import contextlib
        import os

        profile_dir = os.environ.get("BYOX_PROFILE_DIR")
        profiler = contextlib.nullcontext()
        if profile_dir:
            from byox_vllm_tpu.engine.metrics import profile_trace

            profiler = profile_trace(profile_dir)
        outputs: dict[int, list[int]] = {}
        with profiler:
            return self._drain(outputs, pbar)

    def _drain(self, outputs, pbar):
        import os

        step_log = bool(os.environ.get("BYOX_STEP_LOG"))
        while not self.is_finished():
            t0 = time.perf_counter()
            finished, num_tokens = self.step()
            dt = max(time.perf_counter() - t0, 1e-9)
            if step_log:
                import sys

                kind = "prefill" if num_tokens > 0 else "decode"
                print(f"step {kind}: {abs(num_tokens)} tokens in {dt * 1e3:.1f} ms", file=sys.stderr)
            if num_tokens > 0:
                self._stats["prefill_tok_s"] = num_tokens / dt
                self.metrics.prefill_wall_s += dt
            elif num_tokens < 0:
                self._stats["decode_tok_s"] = -num_tokens / dt
                self.metrics.decode_wall_s += dt
            elif self._pending_prefill is not None:
                # pipelined prefill dispatch step (tokens commit next step)
                self.metrics.prefill_wall_s += dt
            elif self._pending is not None:
                # pipelined decode dispatch step (tokens commit next step)
                self.metrics.decode_wall_s += dt
            for seq_id, completion in finished:
                outputs[seq_id] = completion
            if pbar is not None:
                if finished:
                    pbar.update(len(finished))
                pbar.set_postfix(
                    {
                        "prefill": f"{int(self._stats['prefill_tok_s'])}tok/s",
                        "decode": f"{int(self._stats['decode_tok_s'])}tok/s",
                    }
                )
        if pbar is not None:
            pbar.close()

        results = []
        for seq_id in sorted(outputs):
            token_ids = outputs[seq_id]
            text = self.tokenizer.decode(token_ids) if self.tokenizer is not None else ""
            results.append({"text": text, "token_ids": token_ids})
        return results
