"""Engine configuration.

Field parity with the reference ``Config`` (nanovllm/config.py:7-27), adapted
for TPU:

- ``gpu_memory_utilization`` is kept verbatim for drop-in compatibility; it
  budgets TPU HBM here.
- ``kvcache_block_size`` defaults to 64 (the reference's 256 is a flash-attn
  constraint; TPU paged attention wants pages that match (8,128)-tiling and
  finer prefix-cache granularity). Any multiple of 16 is accepted.
- ``hf_config`` may be passed directly (a transformers PretrainedConfig or a
  plain dict) so that unit tests and random-weight benchmarks need no model
  directory on disk — fixing the reference's test fixture weakness
  (tests/test_scheduler.py depends on a downloaded checkpoint).
- new TPU fields: ``dtype``, mesh shape knobs (``tensor_parallel_size`` kept,
  plus ``data_parallel_size``), ``decode_bucket_sizes``.
"""

import os
from dataclasses import dataclass, field
from typing import Any


@dataclass
class Config:
    model: str = ""
    max_num_batched_tokens: int = 16384
    max_num_seqs: int = 512
    max_model_len: int = 4096
    gpu_memory_utilization: float = 0.9
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # Pipeline parallelism: the layer stack shards across a 'stage' mesh
    # axis (models/pp.py) — memory scaling (models pp x larger than one
    # chip group); sequential hand-off, no microbatch overlap yet.
    pipeline_parallel_size: int = 1
    # GPipe-style microbatch count for pipeline parallelism (models/pp.py):
    # one step runs pp + M - 1 ticks with every stage busy in steady state;
    # bubble fraction = (pp-1)/(pp+M-1). None = pp. Must be a power of two
    # <= 8 so every padded batch bucket divides evenly.
    pp_microbatches: int | None = None
    # The reference's enforce_eager disables CUDA-graph capture
    # (nanovllm/engine/model_runner.py:37-38). XLA has no eager escape hatch,
    # so the TPU analogue is the maximally-simple execution path: dense
    # (non-Pallas) attention, one decode step per device call, no async
    # pipelining. Useful for debugging numerics; see __post_init__.
    enforce_eager: bool = False
    hf_config: Any = None
    eos: int = -1
    kvcache_block_size: int = 64
    num_kvcache_blocks: int = -1
    dtype: str = "bfloat16"
    kv_cache_dtype: str = "auto"  # "auto" (= dtype) | "int8"
    quantization: str | None = None  # None | "int8" | "int4" | "w4a8"
    # Quantization group size along the reduction dim (None = 128). Larger
    # groups cut the W4A8 kernel's per-group VPU scale work (on-chip
    # microbench at the 8B gate_up shape: g128 0.105 ms, g256 0.095,
    # g512 0.082) at a small quality cost — gate any change with
    # tools/quality_gate.py.
    quant_group: int | None = None
    attention_backend: str = "auto"  # "auto" | "pallas" | "dense"
    # With weight quantization on, also quantize the (untied) LM head to
    # int8: the V x D head is the largest single matrix and streams fully
    # every decode step; int8 halves that at negligible perplexity cost.
    quantize_lm_head: bool = True
    num_decode_steps: int = 8  # decode iterations per device call (1 = step-per-call)
    # Window-staged decode KV: within a multi-step window, new K/V ride a
    # bf16 tail operand of the attention kernel and the pool is committed
    # once per window. Measured NET-NEGATIVE at B=128 on 8B (TPU scatter
    # cost is per-ROW, so batching the commit saves nothing, and the tail
    # adds ~3 ms/step) — kept for configs where it wins (small batches,
    # future cheap-commit paths).
    window_staged_decode: bool = False
    # async pipelined decode: dispatch window n+1 from window n's on-device
    # tokens before fetching window n, hiding the host<->device round trip
    # under device compute (the TPU analogue of vLLM's async scheduling)
    async_decode: bool = True
    # Overlap prefill with the in-flight decode window: an arriving request's
    # prefill is dispatched BEHIND the current window (device runs them back
    # to back) and both results are fetched with one host sync, instead of
    # draining the pipeline first (flush + 2 syncs per arrival — the r4
    # arrival-TTFT structural cost, VERDICT r4 #2).
    overlap_prefill: bool = True
    enable_chunked_prefill: bool = True  # split prompts longer than the token budget
    speculative_config: Any = None
    # On-device multi-round ngram speculative decoding: how many draft+
    # verify+accept rounds run per device dispatch (one host round trip per
    # M rounds — the spec analogue of num_decode_steps; SPEC_r04 measured the
    # one-round-per-trip design at 0.194x wall clock purely from RTT).
    # None = auto (8); 0 disables the device path (host proposer per round).
    spec_rounds: int | None = None
    # recent-token window for the ON-DEVICE ngram match (the host proposer
    # scans the full history; the device buffer is fixed-size)
    spec_ngram_window: int = 64
    seed: int = 0

    def __post_init__(self):
        if self.hf_config is None:
            assert os.path.isdir(self.model), f"model dir not found: {self.model}"
            from transformers import AutoConfig

            self.hf_config = AutoConfig.from_pretrained(self.model)
        if isinstance(self.hf_config, dict):
            self.hf_config = _DictConfig(self.hf_config)
        assert self.kvcache_block_size % 16 == 0, "TPU KV pages must be a multiple of 16 tokens"
        assert self.tensor_parallel_size >= 1
        assert self.data_parallel_size >= 1
        assert self.pipeline_parallel_size >= 1
        if self.pp_microbatches is None and self.pipeline_parallel_size > 1:
            self.pp_microbatches = self.pipeline_parallel_size
        if self.pipeline_parallel_size > 1:
            m = self.pp_microbatches
            assert m >= 1 and m <= 8 and (m & (m - 1)) == 0, (
                f"pp_microbatches must be a power of two <= 8 (got {m}): every "
                "padded batch bucket (min 8 rows) must divide into microbatches"
            )
        max_pos = getattr(self.hf_config, "max_position_embeddings", self.max_model_len)
        self.max_model_len = min(self.max_model_len, max_pos)
        if not self.enable_chunked_prefill:
            # without chunking a prompt must fit one prefill step (the
            # reference's invariant, nanovllm/config.py:27)
            assert self.max_num_batched_tokens >= self.max_model_len

        if self.enforce_eager:
            self.attention_backend = "dense"
            self.num_decode_steps = 1
            self.async_decode = False
            self.overlap_prefill = False
            self.window_staged_decode = False

        if isinstance(self.speculative_config, dict):
            self.speculative_config = SpeculativeConfig(**self.speculative_config)


class _DictConfig:
    """Attribute view over a plain-dict model config."""

    def __init__(self, d: dict):
        self._d = dict(d)

    def __getattr__(self, name):
        try:
            return self._d[name]
        except KeyError:
            raise AttributeError(name) from None

    def to_dict(self):
        return dict(self._d)


@dataclass
class SpeculativeConfig:
    """Speculative decoding config (reference: nanovllm/config.py:30-49 — there
    declared but never consumed; here it is wired into the engine)."""

    method: str | None = None  # "ngram" | "draft_model" | "eagle"
    num_speculative_tokens: int | None = None
    prompt_lookup_max: int | None = None
    prompt_lookup_min: int | None = 1
    # draft_model method: the drafter checkpoint (any supported family) —
    # a directory path, or an inline hf_config dict for tests/benchmarks
    model: str | None = None
    draft_hf_config: dict | None = None
    draft_quantization: str | None = None  # None | "int8" | "int4"
    # eagle method: drafter trunk depth (EAGLE standard: 1); ``draft_params``
    # injects a pre-built drafter pytree (tests / offline-converted packs) —
    # without it the drafter is random-initialized (mechanism exercise only;
    # real acceptance needs a trained drafter)
    draft_num_layers: int = 1
    draft_params: Any = None

    def __post_init__(self):
        if self.method == "ngram":
            assert self.num_speculative_tokens is not None and self.num_speculative_tokens >= 1
            assert self.prompt_lookup_max is not None and self.prompt_lookup_max >= 1
            if self.prompt_lookup_min is None:
                self.prompt_lookup_min = 1
            assert 1 <= self.prompt_lookup_min <= self.prompt_lookup_max
        elif self.method == "draft_model":
            assert self.num_speculative_tokens is not None and self.num_speculative_tokens >= 1
            assert self.model or self.draft_hf_config, "draft_model needs a drafter checkpoint"
        elif self.method == "eagle":
            assert self.num_speculative_tokens is not None and self.num_speculative_tokens >= 1
            assert self.draft_num_layers >= 1


def config_from_kwargs(model: str = "", **kwargs) -> Config:
    """Build a Config keeping only recognised fields (reference behavior:
    nanovllm/engine/llm_engine.py:19-21 filters kwargs by dataclass fields)."""
    names = set(Config.__dataclass_fields__)
    filtered = {k: v for k, v in kwargs.items() if k in names}
    return Config(model=model, **filtered)
