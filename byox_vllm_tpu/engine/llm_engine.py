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
from byox_vllm_tpu.engine.scheduler import Scheduler
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
            assert sc.method == "ngram", f"unsupported speculative method {sc.method!r}"
            from byox_vllm_tpu.engine.spec import NgramProposer, SpecMetrics

            self.proposer = NgramProposer(
                sc.num_speculative_tokens, sc.prompt_lookup_min, sc.prompt_lookup_max
            )
            self.spec_metrics = SpecMetrics()
            lookahead = sc.num_speculative_tokens + 1
        self.scheduler = Scheduler(config, decode_lookahead=lookahead)
        self._stats = {"prefill_tok_s": 0.0, "decode_tok_s": 0.0}
        self.metrics = EngineMetrics()

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
        reference's throughput accounting at llm_engine.py:95-100)."""
        seqs, is_prefill = self.scheduler.schedule()
        if not seqs:
            return [], 0
        prefill_tokens = sum(s.scheduled_chunk for s in seqs) if is_prefill else 0
        if not is_prefill and self.proposer is not None:
            max_draft = self.scheduler.last_lookahead - 1
            drafts = [self.proposer.propose(s.token_ids)[:max_draft] for s in seqs]
            token_ids, accepted = self.model_runner.run_spec(
                seqs, drafts, self.proposer.k
            )
            for d, a in zip(drafts, accepted):
                self.spec_metrics.record(len(d), min(int(a), len(d)))
        else:
            token_ids = self.model_runner.run(seqs, is_prefill, self.scheduler.last_lookahead)
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
        num_tokens = prefill_tokens if is_prefill else -appended
        return outputs, num_tokens

    def is_finished(self) -> bool:
        return self.scheduler.is_finished()

    # -- batch API --------------------------------------------------------

    def exit(self) -> None:
        """Release device state (KV pool, params). The reference needs an
        atexit + RPC shutdown dance across worker processes
        (llm_engine.py:36,78-82); here dropping the references suffices."""
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
            elif num_tokens < 0:
                self._stats["decode_tok_s"] = -num_tokens / dt
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
