"""Engine observability: request-level and token-level counters.

The reference's only telemetry is a tqdm postfix (nanovllm/engine/
llm_engine.py:51-65); this adds the serving metrics the north star measures
(p50/p99 TTFT, per-request latency, token throughput) plus optional
jax.profiler trace capture for deep dives.
"""

import statistics
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class EngineMetrics:
    prefill_tokens: int = 0
    decode_tokens: int = 0
    num_finished: int = 0
    # prefix-cache accounting, captured at SCHEDULE time (a finished seq's
    # num_cached_tokens is zeroed by deallocate, so reading it post-run
    # always reports 0 — the r3 bench bug): prompt tokens admitted for
    # prefill and how many of them were served from the prefix cache
    prompt_tokens: int = 0
    cached_prompt_tokens: int = 0
    # roofline accounting: engine-loop wall time split by phase, and the
    # number of MODEL decode steps (a multi-step dispatch of lookahead K
    # counts K — each runs the full weight stream once)
    prefill_wall_s: float = 0.0
    decode_wall_s: float = 0.0
    decode_model_steps: int = 0
    ttft_s: list = field(default_factory=list)  # time to first token per request
    latency_s: list = field(default_factory=list)  # arrival -> finish per request

    def record_request(self, seq) -> None:
        self.num_finished += 1
        if seq.arrival_time is not None and seq.first_token_time is not None:
            self.ttft_s.append(seq.first_token_time - seq.arrival_time)
        if seq.arrival_time is not None and seq.finish_time is not None:
            self.latency_s.append(seq.finish_time - seq.arrival_time)

    @staticmethod
    def _pct(values, q):
        if not values:
            return None
        return round(statistics.quantiles(values, n=100)[q - 1], 4) if len(values) > 1 else round(values[0], 4)

    def summary(self) -> dict:
        return {
            "num_finished_requests": self.num_finished,
            "prefill_tokens": self.prefill_tokens,
            "decode_tokens": self.decode_tokens,
            "prompt_tokens": self.prompt_tokens,
            "cached_prompt_tokens": self.cached_prompt_tokens,
            "prefix_cached_token_frac": (
                round(self.cached_prompt_tokens / self.prompt_tokens, 4)
                if self.prompt_tokens
                else None
            ),
            "ttft_p50_s": self._pct(self.ttft_s, 50),
            "ttft_p99_s": self._pct(self.ttft_s, 99),
            "latency_p50_s": self._pct(self.latency_s, 50),
            "latency_p99_s": self._pct(self.latency_s, 99),
            "prefill_wall_s": round(self.prefill_wall_s, 4),
            "decode_wall_s": round(self.decode_wall_s, 4),
            "decode_model_steps": self.decode_model_steps,
            "decode_ms_per_step": (
                round(1e3 * self.decode_wall_s / self.decode_model_steps, 3)
                if self.decode_model_steps
                else None
            ),
            "prefill_tok_s": (
                round(self.prefill_tokens / self.prefill_wall_s, 1)
                if self.prefill_wall_s > 0
                else None
            ),
        }


@contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler device trace around a block (view with
    TensorBoard or parse the perfetto json)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
