"""Per-host execution layer: compiled step functions, KV pool, sampling.

TPU-native counterpart of the reference ModelRunner (nanovllm/engine/
model_runner.py:17-297). The reference's machinery dissolves as follows:

  - CUDA graphs at bucketed batch sizes  ->  one ``jax.jit`` step function;
    inputs are padded to bucket shapes so the XLA compile cache hits
    (compile-per-bucket == capture-per-bucket, but XLA owns the replay)
  - NCCL + shm/Event RPC lockstep ranks  ->  single SPMD program on a
    (data, model) mesh; GSPMD inserts collectives
  - profiled VRAM-based KV sizing (model_runner.py:115-136)  ->  static HBM
    budget arithmetic (weights + activation headroom are known up front)
  - Triton store_kvcache + flash-attn    ->  XLA scatter + paged attention
    (dense fallback now, Pallas kernels on TPU)

The KV pool is a per-layer pytree of (k, v) arrays [num_kv_heads, num_slots,
head_dim], donated into every step so the scatters update HBM in place.
"""

import math
from dataclasses import dataclass as _dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from byox_vllm_tpu.config import Config
from byox_vllm_tpu.engine.batch_prep import (
    lane_rows,
    pad_batch,
    prepare_decode,
    prepare_prefill,
    prepare_spec_verify,
)
from byox_vllm_tpu.engine.sequence import Sequence


@_dataclass
class PendingDecode:
    """A decode window in flight on the device (async pipelined decode)."""

    tokens: object  # jax [B_padded, K] int32 (device)
    num_seqs: int
    lookahead: int
    rows: object = None  # np [n] padded-row of each seq (data-parallel layout)
from byox_vllm_tpu.models import get_model
from byox_vllm_tpu.ops.sampler import sample_tokens
from byox_vllm_tpu.parallel.mesh import make_mesh
from byox_vllm_tpu.parallel.shardings import kv_cache_spec, qwen3_param_specs, shard_params
from byox_vllm_tpu.utils.loader import param_bytes
from byox_vllm_tpu.utils.logging import logger

# Per-JAX-DEVICE HBM by TPU generation, for platforms whose PJRT plugin
# implements no memory_stats (the axon tunnel). Sources: public TPU system
# specs. v2/v3 expose one jax device per TensorCore (two per chip), so their
# entries are half the per-chip HBM (ADVICE r4: the per-chip figures would
# over-budget the KV pool 2x there).
_HBM_BY_DEVICE_KIND = [
    ("v5 lite", 16),  # v5e
    ("v5litepod", 16),
    ("v5e", 16),
    ("v5p", 95),
    ("v6 lite", 32),  # Trillium
    ("v6e", 32),
    ("v4", 32),
    ("v3", 16),  # 32 GiB/chip, 2 devices
    ("v2", 8),  # 16 GiB/chip, 2 devices
]


def _hbm_bytes_from_device_kind(kind: str) -> int | None:
    k = (kind or "").lower()
    for name, gib in _HBM_BY_DEVICE_KIND:
        if name in k:
            return gib * 1024**3
    return None


def estimate_activation_bytes(spec, config) -> int:
    """Peak transient-activation estimate at the LARGEST compiled shapes,
    used to reserve headroom when sizing the KV pool (the reference instead
    warmup-probes CUDA memory at max shapes, model_runner.py:102-136; XLA's
    equivalent measurement is tools/measure_headroom.py, which cross-checks
    this formula via compiled memory_analysis()).

    Terms (generous constants — XLA fuses most elementwise chains away):
      - prefill stream at [tokens = padded token budget]: residual + norm +
        attention I/O buffers (~8x tokens*hidden bf16)
      - MLP intermediate (~3x tokens*inter bf16: gate_up halves + product)
      - QKV projections (~3x tokens*(q+2kv) bf16)
      - dense-attention fallback only: the materialized [heads, Tq, Tk] score
        matrix (the Pallas path tiles it away)
      - sampling: fp32 logits [B, V] x2 (+1 sort copy with top-k/p)
      - spec verify: all-position fp32 logits [B, K+1, V] x2
    """
    # padded prefill token cap: the scheduler's padded admission keeps
    # B_bucket x chunk_bucket <= max_num_batched_tokens for serving-scale
    # budgets (engine/scheduler.py); tiny test budgets floor at one bucket.
    # PER-DEVICE accounting: under data parallelism each device runs one
    # lane's rows (the runner shards the batch over 'data'), so both the
    # token budget and the sampling batch divide by dp — sizing headroom
    # from the GLOBAL budget would starve the KV pool dp-fold (r3 weak #6).
    dp = max(1, config.data_parallel_size)
    tokens = max(-(-config.max_num_batched_tokens // dp), 8 * 16)
    h, inter = spec.hidden_size, spec.intermediate_size
    if getattr(spec, "num_experts", None):
        # routed MLP: N*K token-expert rows through the grouped matmuls
        inter = max(inter, spec.num_experts_per_tok * spec.moe_intermediate_size)
    qkv = spec.q_size + 2 * spec.kv_size
    act = 2 * tokens * (8 * h + 3 * inter + 3 * qkv)
    if config.attention_backend == "dense":
        tq = min(tokens, config.max_model_len)
        act += 4 * spec.num_heads * tq * config.max_model_len
    b = max(8, -(-config.max_num_seqs // dp))  # per-device (lane) rows
    logit_copies = 3  # logits + gumbel/argmax temp + top-k/p sort copy
    act += 4 * b * spec.vocab_size * logit_copies
    sc = config.speculative_config
    if sc is not None and getattr(sc, "num_speculative_tokens", None):
        act += 2 * 4 * b * (sc.num_speculative_tokens + 1) * spec.vocab_size
    # measured on chip (MEMORY_r03.json): the 8B INT4+INT8KV flagship peaks
    # at 1.297 GB vs 1.303 GB from this formula — a 1.004x margin. The flat
    # buffer is sized so composition drift (XLA version, fusion changes)
    # cannot flip the estimate below the true peak; it costs ~1% of KV pool.
    return int(act * 1.25) + 384 * 1024**2


def _next_bucket(n: int, buckets: list[int]) -> int:
    for b in buckets:
        if b >= n:
            return b
    return buckets[-1]


def _pow2_buckets(lo: int, hi: int) -> list[int]:
    out = []
    b = lo
    while b < hi:
        out.append(b)
        b *= 2
    out.append(hi)
    return out


def _enable_compilation_cache():
    """Persistent XLA compilation cache: step-program compiles (one per shape
    bucket) are paid once per machine, not once per process. The reference
    re-captures CUDA graphs on every startup (model_runner.py:256-297); TPU
    serving restarts become cheap instead."""
    import os

    if os.environ.get("BYOX_NO_COMPILE_CACHE"):
        return
    if jax.default_backend() == "cpu":
        return  # tests/dev: CPU programs compile fast; don't mix AOT results
    try:
        cache_dir = os.environ.get(
            "BYOX_COMPILE_CACHE_DIR", os.path.expanduser("~/.cache/byox_vllm_tpu_xla")
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        logger.warning("compilation cache unavailable: %s", e)


class ModelRunner:
    def __init__(self, config: Config, mesh=None):
        self.config = config
        _enable_compilation_cache()
        hf = config.hf_config
        self.mesh = mesh if mesh is not None else make_mesh(
            config.tensor_parallel_size,
            config.data_parallel_size,
            config.pipeline_parallel_size,
        )
        model_cls = get_model(getattr(hf, "model_type", "qwen3"))
        self.spec = model_cls.spec_from_hf(hf)
        if config.quantization:
            from dataclasses import replace

            bits = {"int8": 8, "int4": 4, "w4a8": 4}[config.quantization]
            act_bits = 8 if config.quantization == "w4a8" else None
            head_bits = (
                8
                if config.quantize_lm_head and not self.spec.tie_word_embeddings
                else None
            )
            self.spec = replace(
                self.spec, quant_bits=bits, act_bits=act_bits, head_bits=head_bits,
                quant_group=config.quant_group,
            )
        self.forward_fn = model_cls.forward
        self.block_size = config.kvcache_block_size
        self.dtype = jnp.dtype(config.dtype)

        # head_dim support matrix (README): the Pallas attention kernels
        # assume head_dim == 128. Other dims run the dense XLA fallback —
        # exact, but a large decode perf cliff at scale — so surface it at
        # INIT, not at the first decode step (VERDICT r4 #6).
        if self.spec.head_dim != 128 and jax.default_backend() in ("tpu", "axon"):
            if config.attention_backend == "pallas":
                raise ValueError(
                    f"attention_backend='pallas' requires head_dim == 128 "
                    f"(got {self.spec.head_dim}); use attention_backend='auto' "
                    "to accept the dense fallback (README: kernel support matrix)"
                )
            logger.warning(
                "head_dim %d != 128: Pallas attention kernels unavailable — the "
                "dense fallback is exact but slow at scale (README support matrix)",
                self.spec.head_dim,
            )

        # --- parameters -------------------------------------------------
        if config.model:
            from byox_vllm_tpu.tools.quantize import load_prequantized

            params, qmeta = load_prequantized(config.model)
            if params is not None:
                from dataclasses import replace

                from byox_vllm_tpu.ops.quant import fold_enabled, fold_pack

                head_bits = qmeta.get("head_bits")
                if (
                    head_bits is None
                    and config.quantize_lm_head
                    and not self.spec.tie_word_embeddings
                    and "lm_head" in params
                    and not isinstance(params["lm_head"], dict)
                ):
                    # older pack with a bf16 head: quantize it at load time
                    from byox_vllm_tpu.models.qwen3 import quantize_head

                    head_bits = 8
                    params["lm_head"] = quantize_head(
                        params["lm_head"], head_bits, group=config.quant_group,
                        fold=fold_enabled(self.spec.act_bits),
                    )
                if fold_enabled(self.spec.act_bits) and qmeta["bits"] == 4:
                    # legacy {"q","s"} pack under w4a8: snap scales to the
                    # folded layout (bounded post-hoc rounding — fresh packs
                    # via tools/quantize.py --quant w4a8 fold exactly)
                    params["layers"] = {
                        name: (
                            fold_pack(w, qmeta["bits"])
                            if isinstance(w, dict) and "s" in w
                            else w
                        )
                        for name, w in params["layers"].items()
                    }
                self.spec = replace(self.spec, quant_bits=qmeta["bits"], head_bits=head_bits)
                logger.info("loaded pre-quantized int%d pack from %s", qmeta["bits"], config.model)
            else:
                params = model_cls.load_params(config.model, self.spec, self.dtype)
        else:
            logger.warning("no model path given: using random-initialized weights")
            params = model_cls.init_params(self.spec, self.dtype, seed=config.seed)
        self.tp = config.tensor_parallel_size
        self.dp = config.data_parallel_size
        self.pp = config.pipeline_parallel_size
        if self.pp > 1:
            assert self.spec.num_layers % self.pp == 0, (self.spec.num_layers, self.pp)
            # ngram/draft-model spec decode composes with pp: the verify step
            # calls forward_pp with all_logits=True (signature-compatible).
            # EAGLE needs capture_hidden through the pipeline register — TBD.
            sc_ = config.speculative_config
            assert sc_ is None or getattr(sc_, "method", None) != "eagle", (
                "eagle speculative decoding under pp TBD"
            )
            assert not config.window_staged_decode, (
                "pp supports the standard KV store path only"
            )
        if self.tp > 1:
            # shard_map TP: fused projection columns must be grouped per
            # shard (parallel/tp.py) BEFORE the mesh placement, and
            # row-parallel quantized scale rows refined (losslessly) so they
            # shard tp-ways — quantization itself is tp-agnostic
            from byox_vllm_tpu.parallel.tp import (
                tp_permute_layer_params,
                tp_refine_layer_scales,
            )

            params["layers"] = tp_permute_layer_params(
                params["layers"], self.spec, self.tp
            )
            if self.spec.quant_bits is not None:
                params["layers"] = tp_refine_layer_scales(
                    params["layers"], self.tp, self.spec.quant_bits
                )
            params = jax.tree.map(jnp.asarray, params)
        if self.pp > 1:
            # stage-grouped copy-free layout: per-local-layer lists of
            # [S, ...] arrays sharded P('stage', ...) — inside shard_map the
            # [1, ...] -> [...] squeeze is a whole-buffer reshape, so Pallas
            # custom-calls consume weight buffers directly (no per-step
            # stacked-slice copy; models/pp.py docstring)
            from byox_vllm_tpu.models.pp import regroup_layers_pp

            params["layers"] = regroup_layers_pp(
                params["layers"], self.spec.num_layers, self.pp
            )
        self.params = shard_params(params, self.mesh, pp=self.pp)
        if self.pp == 1:
            # stacked [L, ...] -> per-layer lists: a stacked slice feeding a
            # Pallas custom-call (quantized matmul) is materialized as a copy
            # every step, tripling weight traffic (models/qwen3.py docstring).
            from byox_vllm_tpu.models.qwen3 import unstack_layer_params

            self.params["layers"] = unstack_layer_params(
                self.params["layers"], self.spec.num_layers
            )

        # --- KV pool sizing & allocation --------------------------------
        if config.num_kvcache_blocks <= 0:
            config.num_kvcache_blocks = self._compute_num_blocks()
        self.num_slots = config.num_kvcache_blocks * self.block_size
        kv_dtype = self.dtype if config.kv_cache_dtype == "auto" else jnp.dtype(config.kv_cache_dtype)
        assert config.kv_cache_dtype in ("auto", "int8"), config.kv_cache_dtype
        from jax.sharding import NamedSharding

        from jax.sharding import PartitionSpec as _P

        from byox_vllm_tpu.models.qwen3 import make_kv_cache
        from byox_vllm_tpu.parallel.distributed import put_global

        # +1 scratch block at the pool tail: the sentinel target for padded
        # prefill write-runs (ops/kv_cache.py::write_kv_runs); no block table
        # ever references it
        if self.pp > 1:
            # stage-grouped pools: per-local-layer tuples of [S, slots, ...]
            from byox_vllm_tpu.models.pp import make_kv_cache_pp

            self._kv_pspec = _P("stage", *kv_cache_spec())
            kv_sharding = NamedSharding(self.mesh, self._kv_pspec)
            self.kv_cache = jax.tree.map(
                lambda x: put_global(x, kv_sharding),
                make_kv_cache_pp(
                    self.spec, self.num_slots + self.block_size, kv_dtype,
                    num_stages=self.pp, tp=self.tp,
                ),
            )
            kv_bytes = sum(x.nbytes for x in jax.tree.leaves(self.kv_cache))
        else:
            self._kv_pspec = kv_cache_spec()
            kv_sharding = NamedSharding(self.mesh, self._kv_pspec)
            self.kv_cache = jax.tree.map(
                lambda x: put_global(x, kv_sharding),
                make_kv_cache(self.spec, self.num_slots + self.block_size, kv_dtype, tp=self.tp),
            )
            kv_bytes = sum(x.nbytes for lay in self.kv_cache for x in lay)
        logger.info(
            "KV pool: %d blocks x %d tokens (%.2f GiB)",
            config.num_kvcache_blocks, self.block_size, kv_bytes / 1024**3,
        )

        # --- compiled step ----------------------------------------------
        # tp == 1: plain jit; GSPMD handles the (data-only) sharding.
        # tp > 1: jit(shard_map(step)) — GSPMD has no partitioning rule for
        # Pallas custom-calls (it would all-gather weights and the KV pool
        # every step), so each shard runs the SAME step on its local
        # weight/KV-head shard with explicit psums (parallel/tp.py).
        self.rng = jax.random.PRNGKey(config.seed)
        if self.tp > 1:
            from byox_vllm_tpu.parallel.tp import local_spec

            run_model_spec = local_spec(self.spec, self.tp)
            tp_kwargs = dict(
                tp_axis="model", global_vocab=self.spec.vocab_size
            )
        else:
            run_model_spec = self.spec
            tp_kwargs = {}
        if self.pp > 1:
            # pipeline stages: the in-shard step runs L/pp layers and hands
            # activations along the 'stage' axis (models/pp.py); the forward
            # is signature-compatible so the step programs don't change
            from dataclasses import replace as _replace

            from byox_vllm_tpu.models.pp import forward_pp

            run_model_spec = _replace(
                run_model_spec, num_layers=self.spec.num_layers // self.pp
            )
            self.forward_fn = partial(
                forward_pp, num_stages=self.pp,
                num_microbatches=config.pp_microbatches,
            )
        # Eagle feature-level drafting: the target's post-final-norm hidden
        # states ride along as an extra program output for the drafter
        sc = config.speculative_config
        self.capture_hidden = bool(sc is not None and getattr(sc, "method", None) == "eagle")
        self.last_hidden = None  # (hidden [Bpad, T, D] device, row of each seq)
        if self.capture_hidden:
            # tp/dp compose: hidden states are model-replicated after the
            # final psum and batch-sharded over 'data' (out_specs below); the
            # drafter itself is tiny and runs unsharded on the default device
            assert self.pp == 1, "eagle speculative decoding under pp TBD"
        step_impl = partial(
            _model_step,
            forward_fn=self.forward_fn,
            spec=run_model_spec,
            block_size=self.block_size,
            attention_backend=config.attention_backend,
            capture_hidden=self.capture_hidden,
            **tp_kwargs,
        )
        decode_impl = partial(
            _multi_decode_step,
            forward_fn=self.forward_fn,
            spec=run_model_spec,
            block_size=self.block_size,
            attention_backend=config.attention_backend,
            window_staged=config.window_staged_decode,
            **tp_kwargs,
        )
        verify_impl = partial(
            _spec_verify_step,
            forward_fn=self.forward_fn,
            spec=run_model_spec,
            block_size=self.block_size,
            attention_backend=config.attention_backend,
            capture_hidden=self.capture_hidden,
            **tp_kwargs,
        )
        def spec_multi_impl(rounds, num_spec, min_n, max_n):
            return partial(
                _spec_multi_step,
                forward_fn=self.forward_fn,
                spec=run_model_spec,
                block_size=self.block_size,
                attention_backend=config.attention_backend,
                rounds=rounds, num_spec=num_spec, min_n=min_n, max_n=max_n,
                **tp_kwargs,
            )

        self._spec_multi_cache: dict = {}
        if self.tp == 1 and self.dp == 1 and self.pp == 1:
            self._step = jax.jit(step_impl, donate_argnums=(1,))
            self._decode = jax.jit(decode_impl, donate_argnums=(1,))
            self._spec_verify = jax.jit(verify_impl, donate_argnums=(1,))
            self._make_spec_multi = lambda *a: jax.jit(
                spec_multi_impl(*a), donate_argnums=(1,)
            )
        else:
            # dp > 1 must also take the shard_map path: under shard_map each
            # data shard scatters only ITS rows into ITS pool replica (the
            # per-lane-pool semantics DataParallelScheduler assumes); plain
            # jit/GSPMD would instead enforce one logical pool and lanes'
            # overlapping slot ids would clobber each other.
            self._tp_cache: dict = {}
            from jax.sharding import PartitionSpec as P

            param_specs = qwen3_param_specs(self.params, self.mesh, pp=self.pp)
            kv_specs = jax.tree.map(lambda _: self._kv_pspec, self.kv_cache)
            Dx = "data"

            def opt(spec_tuple, arg):
                return None if arg is None else spec_tuple

            def step_specs(args):
                (_, _, _, _, _, _, _, _, _, filters, runs, seed_info) = args
                # prefill run arrays: dp segments, one per lane (shard-local
                # src rows) -> shard over 'data'; replicated when dp == 1
                run_spec = (P(Dx), P(Dx)) if self.dp > 1 else (P(), P())
                ins = (
                    param_specs, kv_specs, P(Dx, None), P(Dx), P(Dx),
                    P(Dx, None), P(Dx, None), P(Dx), P(),
                    opt((P(Dx), P(Dx)), filters),
                    opt(run_spec, runs),
                    opt((P(Dx), P(Dx)), seed_info),
                )
                outs = (P(Dx), kv_specs)
                if self.capture_hidden:
                    outs = outs + (P(Dx, None, None),)  # hidden [B, T, D]
                return ins, outs

            def decode_specs(args):
                (_, _, _, _, _, _, _, _, filters, seed_info) = args
                ins = (
                    param_specs, kv_specs, P(Dx), P(Dx), P(Dx, None),
                    P(Dx, None), P(Dx), P(),
                    opt((P(Dx), P(Dx)), filters),
                    opt((P(Dx), P(Dx)), seed_info),
                )
                return ins, (P(Dx, None), kv_specs)

            def verify_specs(args):
                filters, seed_info = args[-2], args[-1]
                ins = (
                    param_specs, kv_specs, P(Dx, None), P(Dx), P(Dx),
                    P(Dx, None), P(Dx, None), P(Dx, None), P(Dx), P(Dx), P(),
                    opt((P(Dx), P(Dx)), filters),
                    opt((P(Dx), P(Dx)), seed_info),
                )
                outs = (P(Dx, None), P(Dx), kv_specs)
                if self.capture_hidden:
                    outs = outs + (P(Dx, None, None),)  # hidden [B, T, D]
                return ins, outs

            def make_caller(kind, impl, specs_fn):
                def call(*args):
                    key = (kind, tuple(a is None for a in args))
                    ins, outs = specs_fn(args)
                    fn = self._tp_cache.get(key)
                    if fn is None:
                        try:
                            from jax import shard_map
                        except ImportError:  # older jax
                            from jax.experimental.shard_map import shard_map

                        # Replication/VMA checking must be OFF: the KV pool
                        # replicas deliberately DIVERGE across the data axis
                        # (each lane scatters only its own rows — the
                        # per-lane-pool design, engine/scheduler.py
                        # DataParallelScheduler), which the varying-manual-
                        # axes type system would reject.
                        for kw in ({"check_vma": False}, {"check_rep": False}, {}):
                            try:
                                sm = shard_map(
                                    impl, mesh=self.mesh, in_specs=ins,
                                    out_specs=outs, **kw,
                                )
                                break
                            except TypeError:
                                continue
                        fn = jax.jit(sm, donate_argnums=(1,))
                        self._tp_cache[key] = fn
                    if jax.process_count() > 1:
                        # multi-host: host-local batch arrays must become
                        # global jax.Arrays laid out per the in_specs (every
                        # host builds the identical full batch; each supplies
                        # only its addressable shards). params/kv_cache are
                        # already global.
                        from jax.sharding import NamedSharding

                        from byox_vllm_tpu.parallel.distributed import put_global

                        def to_global(a, s):
                            if a is None:
                                return None
                            if isinstance(a, tuple):
                                return tuple(to_global(x, y) for x, y in zip(a, s))
                            if isinstance(a, jax.Array) and not a.is_fully_addressable:
                                return a
                            return put_global(a, NamedSharding(self.mesh, s))

                        args = args[:2] + tuple(
                            to_global(a, s) for a, s in zip(args[2:], ins[2:])
                        )
                    return fn(*args)

                return call

            self._step = make_caller("step", step_impl, step_specs)
            self._decode = make_caller("decode", decode_impl, decode_specs)
            self._spec_verify = make_caller("verify", verify_impl, verify_specs)

            def spec_multi_specs(args):
                filters, seed_info = args[-2], args[-1]
                ins = (
                    param_specs, kv_specs, P(Dx, None), P(Dx), P(Dx),
                    P(Dx, None), P(Dx), P(),
                    opt((P(Dx), P(Dx)), filters),
                    opt((P(Dx), P(Dx)), seed_info),
                )
                outs = (P(None, Dx, None), P(None, Dx), P(None, Dx), kv_specs)
                return ins, outs

            self._make_spec_multi = lambda *a: make_caller(
                "spec_multi_" + "_".join(map(str, a)),
                spec_multi_impl(*a), spec_multi_specs,
            )
        # Shape buckets. Every distinct shape is a separate compiled program
        # (and on this backend each program load costs ~1s per process), so
        # the bucket sets are deliberately small: block-table width is always
        # padded to the max (the Pallas kernel skips out-of-context pages, so
        # padded width is nearly free).
        dp = config.data_parallel_size
        self.seq_buckets = [b for b in _pow2_buckets(max(8, dp), max(8, config.max_num_seqs))]
        # data-parallel row layout: each lane's group is padded to a common
        # per-lane stride so shard_map's contiguous split lands lane L on
        # data shard L
        self.lane_buckets = _pow2_buckets(max(1, 8 // dp), max(1, -(-config.max_num_seqs // dp)))
        self.token_buckets = _pow2_buckets(16, config.max_model_len)
        max_table_width = math.ceil(config.max_model_len / self.block_size)
        self.table_buckets = [max(1, max_table_width)]

    # ------------------------------------------------------------------

    def _compute_num_blocks(self) -> int:
        import os

        dev = jax.devices()[0]
        limit = None
        try:
            stats = dev.memory_stats()
            if stats and "bytes_limit" in stats:
                limit = stats["bytes_limit"]
        except Exception:
            pass
        if os.environ.get("BYOX_HBM_BYTES"):
            limit = int(os.environ["BYOX_HBM_BYTES"])
        elif limit is None and dev.platform != "cpu":
            # The platform reports no memory stats (the tunneled PJRT plugin
            # doesn't implement them): derive HBM from the chip generation.
            # A silently-wrong default would mis-size the pool on v4/v5p
            # (r2/r3 finding) — unknown chips are a hard error instead.
            limit = _hbm_bytes_from_device_kind(getattr(dev, "device_kind", ""))
            if limit is None:
                raise RuntimeError(
                    f"device {getattr(dev, 'device_kind', dev.platform)!r} reports no "
                    "memory stats and is not a known TPU generation; set "
                    "BYOX_HBM_BYTES=<per-chip HBM bytes> or pass num_kvcache_blocks"
                )
            logger.info(
                "no memory stats; HBM %.0f GiB inferred from device_kind %r",
                limit / 1024**3, dev.device_kind,
            )
        if dev.platform == "cpu":
            return 2048  # tests / CPU dev: fixed small pool
        weights = param_bytes(self.params)
        tp = self.config.tensor_parallel_size
        nkv_tp = max(1, self.spec.num_kv_heads // tp)
        from byox_vllm_tpu.ops.kv_cache import row_width

        if self.config.kv_cache_dtype == "int8":
            # merged int8 row: K + V + bf16 scale bytes (ops/kv_cache.py)
            per_token_bytes = row_width(nkv_tp * self.spec.head_dim, True)
        else:
            per_token_bytes = (
                row_width(nkv_tp * self.spec.head_dim, False) * self.dtype.itemsize
            )
        # per-DEVICE accounting: layers and weights divide across stages (pp)
        layers_local = self.spec.num_layers // self.config.pipeline_parallel_size
        kv_bytes_per_token = layers_local * per_token_bytes
        headroom = estimate_activation_bytes(self.spec, self.config)
        budget = (
            int(limit * self.config.gpu_memory_utilization)
            - weights // (tp * self.config.pipeline_parallel_size)
            - headroom
        )
        logger.info(
            "HBM budget: limit %.2f GiB, weights %.2f GiB, activation headroom %.2f GiB",
            limit / 1024**3, weights / tp / 1024**3, headroom / 1024**3,
        )
        num_blocks = max(16, budget // (kv_bytes_per_token * self.block_size))
        # don't allocate more capacity than max_num_seqs full-length seqs need
        cap = self.config.max_num_seqs * math.ceil(self.config.max_model_len / self.block_size)
        return int(min(num_blocks, cap))

    def _layout(self, seqs: list[Sequence], n: int):
        """(padded_num_seqs, rows) for the batch layout: identity (rows None)
        when dp == 1; contiguous per-lane groups otherwise. ``seqs`` must be
        lane-ordered (DataParallelScheduler.schedule's contract)."""
        if self.dp == 1:
            return _next_bucket(n, self.seq_buckets), None
        counts = [0] * self.dp
        for s in seqs:
            counts[s.dp_shard] += 1
        stride = _next_bucket(max(max(counts), 1), self.lane_buckets)
        # an over-admitting lane would spill rows onto the next data shard
        # (DataParallelScheduler divides admission caps to prevent this)
        assert max(counts) <= stride, (counts, self.lane_buckets)
        return stride * self.dp, lane_rows(counts, stride)

    def run(self, seqs: list[Sequence], is_prefill: bool, lookahead: int = 1) -> list:
        """Execute one engine step. Prefill (or lookahead 1) returns one
        sampled token per sequence; decode with lookahead K returns a list of
        K tokens per sequence (sampled on-device without host round trips —
        the TPU counterpart of replaying K CUDA graphs, minus K-1 host syncs).
        """
        if is_prefill:
            return self.fetch_prefill(self.dispatch_prefill(seqs))
        batch = prepare_decode(seqs, self.block_size, lookahead)
        n = batch.num_seqs
        num_rows, rows = self._layout(seqs, n)
        padded = pad_batch(
            batch,
            num_seqs=num_rows,
            num_tokens=1,
            table_width=_next_bucket(batch.block_tables.shape[1], self.table_buckets),
            rows=rows,
        )
        self.rng, step_key = jax.random.split(self.rng)
        filters = None
        if padded.top_k is not None:
            filters = (jnp.asarray(padded.top_k), jnp.asarray(padded.top_p))
        seed_info = None
        if padded.seeds is not None:
            seed_info = (jnp.asarray(padded.seeds), jnp.asarray(padded.steps))
        pending = self._dispatch_decode_padded(
            padded, n, lookahead, step_key, filters, seed_info, rows=rows
        )
        return self.fetch_decode(pending)

    def dispatch_prefill(self, seqs: list[Sequence]):
        """Launch a prefill step WITHOUT waiting for the device; returns a
        handle for ``fetch_prefill``. Separated from ``run`` so the engine
        can queue a prefill BEHIND an in-flight decode window (overlap
        prefill): the arriving request's prefill then costs no pipeline
        drain and no extra host sync (VERDICT r4 #2 — TTFT was dominated by
        the flush-per-arrival, not prefill compute)."""
        batch = prepare_prefill(seqs, self.block_size)
        n = batch.num_seqs
        num_rows, rows = self._layout(seqs, n)
        padded = pad_batch(
            batch,
            num_seqs=num_rows,
            num_tokens=_next_bucket(batch.token_ids.shape[1], self.token_buckets),
            table_width=_next_bucket(batch.block_tables.shape[1], self.table_buckets),
            rows=rows,
        )
        self.rng, step_key = jax.random.split(self.rng)
        filters = None
        if padded.top_k is not None:
            filters = (jnp.asarray(padded.top_k), jnp.asarray(padded.top_p))
        seed_info = None
        if padded.seeds is not None:
            seed_info = (jnp.asarray(padded.seeds), jnp.asarray(padded.steps))
        # block-DUS KV stores for both bf16 and int8 pools; under DP the run
        # arrays carry one shard-local segment per lane
        runs = _prefill_write_runs(
            seqs, padded.token_ids.shape[1], self.block_size,
            rows=rows, stride=num_rows // self.dp, dp=self.dp,
            scratch_dst=self.num_slots,
        )
        if self.pp > 1:
            # run-DUS src rows index the whole padded batch; pp's
            # microbatches slice it -> use the scatter store instead
            runs = None
        step_out = self._step(
            self.params,
            self.kv_cache,
            jnp.asarray(padded.token_ids),
            jnp.asarray(padded.q_lens),
            jnp.asarray(padded.context_lens),
            jnp.asarray(padded.slot_mapping),
            jnp.asarray(padded.block_tables),
            jnp.asarray(padded.temperatures),
            step_key,
            filters,
            runs,
            seed_info,
        )
        hidden = None
        if self.capture_hidden:
            tokens, self.kv_cache, hidden = step_out
            self.last_hidden = (hidden, np.arange(n) if rows is None else rows)
        else:
            tokens, self.kv_cache = step_out
        return (tokens, n, rows)

    def fetch_prefill(self, handle) -> list:
        """Block on a dispatched prefill and return its sampled tokens."""
        tokens, n, rows = handle
        out = self._host_fetch(tokens)
        return (out[:n] if rows is None else out[rows]).tolist()

    def dispatch_decode(self, seqs: list[Sequence], lookahead: int, carry=None):
        """Async pipelined decode: launch a K-step decode window and return a
        PendingDecode handle WITHOUT waiting for the device. ``carry`` is the
        previous window's on-device [B_padded, K] token matrix — its last
        column feeds this window's first step, so the host never sees the
        intermediate tokens (the fetch of window n overlaps the device
        executing window n+1, hiding the dispatch round-trip entirely)."""
        batch = prepare_decode(seqs, self.block_size, lookahead)
        n = batch.num_seqs
        num_rows, rows = self._layout(seqs, n)
        padded = pad_batch(
            batch,
            num_seqs=num_rows,
            num_tokens=1,
            table_width=_next_bucket(batch.block_tables.shape[1], self.table_buckets),
            rows=rows,
        )
        self.rng, step_key = jax.random.split(self.rng)
        filters = None
        if padded.top_k is not None:
            filters = (jnp.asarray(padded.top_k), jnp.asarray(padded.top_p))
        seed_info = None
        if padded.seeds is not None:
            seed_info = (jnp.asarray(padded.seeds), jnp.asarray(padded.steps))
        if carry is None:
            first_tokens = jnp.asarray(padded.token_ids[:, 0])
        elif getattr(carry, "is_fully_addressable", True):
            first_tokens = carry[:, -1]
        else:  # multi-host: eager slicing needs addressability; jit is SPMD
            first_tokens = _take_last_column(carry)
        return self._dispatch_decode_padded(
            padded, n, lookahead, step_key, filters, seed_info,
            first_tokens=first_tokens, rows=rows,
        )

    def _dispatch_decode_padded(
        self, padded, n, lookahead, step_key, filters, seed_info, first_tokens=None, rows=None
    ):
        if first_tokens is None:
            first_tokens = jnp.asarray(padded.token_ids[:, 0])
        tokens, self.kv_cache = self._decode(
            self.params,
            self.kv_cache,
            first_tokens,
            jnp.asarray(padded.context_lens),
            jnp.asarray(padded.slot_mapping),
            jnp.asarray(padded.block_tables),
            jnp.asarray(padded.temperatures),
            step_key,
            filters,
            seed_info,
        )
        return PendingDecode(tokens=tokens, num_seqs=n, lookahead=lookahead, rows=rows)

    def fetch_decode(self, pending: "PendingDecode") -> list:
        """Block on a dispatched decode window and return its token lists."""
        full = self._host_fetch(pending.tokens)
        out = full[: pending.num_seqs] if pending.rows is None else full[pending.rows]  # [n, K]
        return out[:, 0].tolist() if pending.lookahead == 1 else out.tolist()

    @staticmethod
    def _host_fetch(x) -> np.ndarray:
        """Device array -> host numpy. In a multi-host deployment per-shard
        outputs are not fully addressable from one process; allgather them so
        every host sees the full batch (keeping every host's scheduler state
        identical — the deterministic-lockstep contract)."""
        if getattr(x, "is_fully_addressable", True):
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    def run_spec(
        self, seqs: list[Sequence], drafts: list[list[int]], num_spec_tokens: int
    ) -> tuple[list[list[int]], np.ndarray]:
        """Speculative verify step: scores each sequence's draft window in one
        model call and rejection-samples on device. Returns (emitted token
        lists per sequence, accepted-draft counts)."""
        batch, draft_matrix, num_drafts = prepare_spec_verify(
            seqs, drafts, self.block_size, num_spec_tokens
        )
        n = batch.num_seqs
        bucket, rows = self._layout(seqs, n)
        filters = None
        if batch.top_k is not None:
            filters = batch.top_k, batch.top_p
        padded = pad_batch(
            batch,
            num_seqs=bucket,
            num_tokens=batch.token_ids.shape[1],
            table_width=_next_bucket(batch.block_tables.shape[1], self.table_buckets),
            rows=rows,
        )
        dst = np.arange(n) if rows is None else rows

        def pad_rows(arr, fill=0):
            out = np.full((bucket,) + arr.shape[1:], fill, dtype=arr.dtype)
            out[dst] = arr
            return out

        self.rng, step_key = jax.random.split(self.rng)
        padded_filters = None
        if filters is not None:
            padded_filters = (
                jnp.asarray(pad_rows(filters[0])),
                jnp.asarray(pad_rows(filters[1].astype(np.float32), fill=1.0)),
            )
        seed_info = None
        if padded.seeds is not None:
            seed_info = (jnp.asarray(padded.seeds), jnp.asarray(padded.steps))
        verify_out = self._spec_verify(
            self.params,
            self.kv_cache,
            jnp.asarray(padded.token_ids),
            jnp.asarray(padded.q_lens),
            jnp.asarray(padded.context_lens),
            jnp.asarray(padded.slot_mapping),
            jnp.asarray(padded.block_tables),
            jnp.asarray(pad_rows(draft_matrix)),
            jnp.asarray(pad_rows(num_drafts)),
            jnp.asarray(padded.temperatures),
            step_key,
            padded_filters,
            seed_info,
        )
        if self.capture_hidden:
            tokens, num_emitted, self.kv_cache, hidden = verify_out
            self.last_hidden = (hidden, dst)
        else:
            tokens, num_emitted, self.kv_cache = verify_out
        tokens = self._host_fetch(tokens)[dst]
        num_emitted = self._host_fetch(num_emitted)[dst]
        return [tokens[i, : num_emitted[i]].tolist() for i in range(n)], num_emitted - 1

    def run_spec_ngram(
        self, seqs: list[Sequence], num_spec: int, rounds: int,
        min_n: int, max_n: int, window: int,
    ) -> tuple[list[list[int]], np.ndarray, np.ndarray]:
        """On-device multi-round ngram speculative decoding: M draft+verify+
        accept rounds scanned in one compiled program (_spec_multi_step), one
        host round trip per M rounds. The scheduler must have reserved
        rounds*(num_spec+1) tokens of KV capacity (engine wiring).

        Returns (emitted token lists per sequence, draft counts [M, n],
        accepted counts [M, n]) — the per-round stats feed SpecMetrics."""
        from byox_vllm_tpu.engine.batch_prep import _sampling_filters, _sampling_seeds

        n = len(seqs)
        num_rows, rows = self._layout(seqs, n)
        dst = np.arange(n) if rows is None else rows
        r = window
        toks = np.full((num_rows, r), -1, np.int32)
        blens = np.zeros(num_rows, np.int32)
        clens = np.zeros(num_rows, np.int32)
        temps = np.ones(num_rows, np.float32)
        wpad = _next_bucket(
            max(1, max(len(s.block_table) for s in seqs)), self.table_buckets
        )
        tables = np.full((num_rows, wpad), -1, np.int32)
        for i, s in enumerate(seqs):
            t = s.token_ids[-r:]
            row = dst[i]
            toks[row, r - len(t):] = t
            blens[row] = len(t)
            clens[row] = len(s)
            temps[row] = s.temperature
            tables[row, : len(s.block_table)] = s.block_table

        def pad_rows(arr, fill):
            out = np.full((num_rows,) + arr.shape[1:], fill, dtype=arr.dtype)
            out[dst] = arr
            return out

        filters = None
        top_k, top_p = _sampling_filters(seqs)
        if top_k is not None:
            filters = (
                jnp.asarray(pad_rows(top_k, 0)),
                jnp.asarray(pad_rows(top_p, np.float32(1.0))),
            )
        seed_info = None
        seeds, steps = _sampling_seeds(seqs)
        if seeds is not None:
            seed_info = (
                jnp.asarray(pad_rows(seeds, -1)),
                jnp.asarray(pad_rows(steps, 0)),
            )
        key_ = (rounds, num_spec, min_n, max_n)
        fn = self._spec_multi_cache.get(key_)
        if fn is None:
            fn = self._spec_multi_cache[key_] = self._make_spec_multi(*key_)
        self.rng, step_key = jax.random.split(self.rng)
        tok_rounds, emit_rounds, draft_rounds, self.kv_cache = fn(
            self.params, self.kv_cache,
            jnp.asarray(toks), jnp.asarray(blens), jnp.asarray(clens),
            jnp.asarray(tables), jnp.asarray(temps), step_key,
            filters, seed_info,
        )
        tok_rounds = self._host_fetch(tok_rounds)[:, dst]  # [M, n, K+1]
        emit_rounds = self._host_fetch(emit_rounds)[:, dst]  # [M, n]
        draft_rounds = self._host_fetch(draft_rounds)[:, dst]
        token_lists = [
            [
                int(t)
                for m in range(rounds)
                for t in tok_rounds[m, i, : emit_rounds[m, i]]
            ]
            for i in range(n)
        ]
        return token_lists, draft_rounds, emit_rounds - 1


def _model_step(
    params,
    kv_cache,
    token_ids,
    q_lens,
    context_lens,
    slot_mapping,
    block_tables,
    temperatures,
    key,
    filters=None,
    write_runs=None,
    seed_info=None,
    *,
    forward_fn,
    spec,
    block_size,
    attention_backend="auto",
    tp_axis=None,
    global_vocab=0,
    capture_hidden=False,
):
    from functools import partial as _partial

    from byox_vllm_tpu.ops.attention import paged_attention

    out, kv_cache = forward_fn(
        params, kv_cache, token_ids, q_lens, context_lens, slot_mapping, block_tables,
        spec, block_size,
        attention_fn=_partial(paged_attention, backend=attention_backend),
        write_runs=write_runs,
        tp_axis=tp_axis,
        capture_hidden=capture_hidden,
    )
    logits, hidden = out if capture_hidden else (out, None)
    top_k, top_p = filters if filters is not None else (None, None)
    seeds, steps = seed_info if seed_info is not None else (None, None)
    if tp_axis is not None:
        from byox_vllm_tpu.ops.sampler import sample_tokens_tp

        tokens = sample_tokens_tp(
            logits, temperatures, key, tp_axis, global_vocab,
            top_k=top_k, top_p=top_p, seeds=seeds, steps=steps,
        )
    else:
        tokens = sample_tokens(
            logits, temperatures, key, top_k=top_k, top_p=top_p, seeds=seeds,
            steps=steps, vocab=spec.vocab_size,
        )
    if capture_hidden:
        return tokens, kv_cache, hidden
    return tokens, kv_cache


@jax.jit
def _take_last_column(x):
    return x[:, -1]


def _prefill_write_runs(seqs, padded_tq, block_size, rows=None, stride=0, dp=1, scratch_dst=0):
    """(run_dst, run_src) int32 arrays for block-aligned prefill KV stores
    (ops/kv_cache.py::write_kv_runs), or None when any sequence's cached
    prefix is not block-aligned (rare: the fully-cached-prompt recompute) —
    the caller then falls back to the scatter store. Run count is padded to
    a power-of-two bucket by duplicating run 0 (idempotent rewrite).

    Data parallel (dp > 1): each lane's DUS may only touch its OWN pool
    replica, so the arrays carry dp same-length segments — segment L holds
    lane L's runs with SHARD-LOCAL src rows — sharded P('data') into the
    per-shard step. Lanes short on runs pad with writes into the pool's
    scratch tail block (``scratch_dst``)."""
    per = [[] for _ in range(dp)]  # (dst, src) per lane
    for i, seq in enumerate(seqs):
        start = seq.num_computed_tokens
        chunk = seq.scheduled_chunk or seq.num_pending_prefill_tokens
        if start % block_size:
            return None
        lane, local_row = (0, i) if dp == 1 else (rows[i] // stride, rows[i] % stride)
        end_block = -(-(start + chunk) // block_size)
        for j in range(start // block_size, end_block):
            per[lane].append(
                (seq.block_table[j] * block_size, local_row * padded_tq + (j * block_size - start))
            )
    if not any(per):
        return None
    r = 1
    while r < max(len(p) for p in per):
        r *= 2
    dst, src = [], []
    for p in per:
        pad = (p[0] if p else (scratch_dst, 0),) * (r - len(p))
        for d, s in list(p) + list(pad):
            dst.append(d)
            src.append(s)
    return jnp.asarray(np.array(dst, np.int32)), jnp.asarray(np.array(src, np.int32))


def _multi_decode_step(
    params,
    kv_cache,
    last_tokens,  # [B]
    context_lens,  # [B]
    slot_mapping,  # [B, K]
    block_tables,  # [B, W]
    temperatures,  # [B]
    key,
    filters=None,
    seed_info=None,
    *,
    forward_fn,
    spec,
    block_size,
    attention_backend="auto",
    window_staged=False,
    tp_axis=None,
    global_vocab=0,
):
    """K decode iterations in one device program: each iteration's sampled
    token feeds the next iteration's forward without leaving the chip. The
    KV pools ride the scan carry (updated in place by XLA's while-loop
    buffer aliasing). Returns tokens [B, K].

    ``window_staged``: the pools stay READ-ONLY within the window — each
    step's new K/V rows go to a small bf16 tail operand of the attention
    kernel and the pool scatter happens once per window after the scan.
    Measured net-negative at B=128 on 8B (config.py knob docs), default off.
    """
    from functools import partial as _partial

    from byox_vllm_tpu.ops.attention import paged_attention
    from byox_vllm_tpu.ops.kv_cache import write_kv, write_kv_quant

    k_steps = slot_mapping.shape[1]
    b = last_tokens.shape[0]
    ones = jnp.ones_like(context_lens)
    nkv, hd = spec.num_kv_heads, spec.head_dim
    top_k, top_p = filters if filters is not None else (None, None)

    def sample(logits, step_idx):
        if seed_info is not None:
            seeds, steps = seed_info[0], seed_info[1] + step_idx
        else:
            seeds, steps = None, None
        if tp_axis is not None:
            from byox_vllm_tpu.ops.sampler import sample_tokens_tp

            return sample_tokens_tp(
                logits, temperatures, jax.random.fold_in(key, step_idx),
                tp_axis, global_vocab, top_k=top_k, top_p=top_p,
                seeds=seeds, steps=steps,
            )
        return sample_tokens(
            logits, temperatures, jax.random.fold_in(key, step_idx),
            top_k=top_k, top_p=top_p, seeds=seeds, steps=steps,
            vocab=spec.vocab_size,
        )

    xs = (jnp.arange(k_steps, dtype=context_lens.dtype), slot_mapping.T)

    if not window_staged:
        attention_fn = _partial(paged_attention, backend=attention_backend)

        def body(carry, xs):
            tokens, kv = carry
            step_idx, slots_k = xs
            logits, kv = forward_fn(
                params, kv, tokens[:, None], ones, context_lens + step_idx,
                slots_k[:, None], block_tables, spec, block_size,
                attention_fn=attention_fn,
                attention_backend=attention_backend,
                tp_axis=tp_axis,
            )
            next_tokens = sample(logits, step_idx)
            return (next_tokens, kv), next_tokens

        (_, kv_cache), tokens = jax.lax.scan(body, (last_tokens, kv_cache), xs)
        return tokens.T, kv_cache

    tails0 = [
        (
            jnp.zeros((b, k_steps, nkv, hd), jnp.bfloat16),
            jnp.zeros((b, k_steps, nkv, hd), jnp.bfloat16),
        )
        for _ in range(spec.num_layers)
    ]

    def body(carry, xs):
        tokens, tails = carry
        step_idx, slots_k = xs
        logits, tails = forward_fn(
            params, kv_cache, tokens[:, None], ones, context_lens + step_idx,
            slots_k[:, None], block_tables, spec, block_size,
            decode_tails=tails, tail_index=step_idx,
            attention_backend=attention_backend,
        )
        next_tokens = sample(logits, step_idx)
        return (next_tokens, tails), next_tokens

    (_, tails), tokens = jax.lax.scan(body, (last_tokens, tails0), xs)

    # commit the window's staged K/V: one batched scatter per layer
    flat_slots = slot_mapping.reshape(-1)  # [B*K]; row b*K+t == tail[b, t]
    new_kv = []
    for i, lay in enumerate(kv_cache):
        k_rows = tails[i][0].reshape(b * k_steps, nkv, hd)
        v_rows = tails[i][1].reshape(b * k_steps, nkv, hd)
        pool = lay[0]
        if pool.dtype == jnp.int8:
            new_kv.append((write_kv_quant(pool, k_rows, v_rows, flat_slots),))
        else:
            new_kv.append((write_kv(pool, k_rows, v_rows, flat_slots),))
    return tokens.T, new_kv


def _spec_multi_step(
    params,
    kv_cache,
    toks_buf,  # [B, R] int32 right-aligned recent tokens (-1 left pad)
    buf_lens,  # [B] int32 valid token counts (<= R)
    cur_lens,  # [B] int32 current sequence length (0 = padding row)
    block_tables,  # [B, W] int32
    temperatures,  # [B] f32
    key,
    filters=None,
    seed_info=None,
    *,
    forward_fn,
    spec,
    block_size,
    attention_backend="auto",
    rounds,  # M verify rounds scanned on device
    num_spec,  # K draft tokens per round
    min_n,
    max_n,
    tp_axis=None,
    global_vocab=0,
):
    """M speculative rounds in ONE device program: each round drafts on
    device (ops/ngram.py), verifies all K positions in one forward, and
    rejection-samples — the sampled tokens feed the next round's draft buffer
    without leaving the chip. This is what makes spec decode serving-viable
    over a high-RTT link: SPEC_r04 measured the one-round-per-host-trip
    design at 0.194x wall-clock DESPITE 0.90 acceptance, because every ~2
    emitted tokens paid a tunnel round trip while the plain decode path
    amortizes 16 steps per dispatch (VERDICT r4 #3b).

    Slot mapping is computed ON DEVICE from the block tables (the host cannot
    know round n+1's write positions — they depend on round n's acceptance);
    the scheduler pre-reserves rounds*(K+1) tokens of KV capacity.

    Returns (tok_rounds [M, B, K+1], emit_rounds [M, B], draft_rounds [M, B],
    kv_cache). Row b of round m emits tok_rounds[m, b, :emit_rounds[m, b]]."""
    from byox_vllm_tpu.ops.attention import paged_attention
    from byox_vllm_tpu.ops.ngram import append_tokens_device, ngram_propose_device
    from byox_vllm_tpu.ops.spec_sampler import verify_and_sample

    b, r = toks_buf.shape
    k1 = num_spec + 1
    w = block_tables.shape[1]
    top_k, top_p = filters if filters is not None else (None, None)
    attention_fn = partial(paged_attention, backend=attention_backend)
    col = jnp.arange(k1, dtype=jnp.int32)[None, :]

    def body(carry, rnd):
        toks, blens, clens, kv = carry
        live = clens > 0
        drafts, ndraft = ngram_propose_device(toks, blens, min_n, max_n, num_spec)
        ndraft = jnp.where(live, ndraft, 0)
        token_ids = jnp.concatenate([jnp.maximum(toks[:, -1:], 0), drafts], axis=1)
        q_lens = jnp.where(live, 1 + ndraft, 0)
        ctx = jnp.where(live, clens + ndraft, 0)
        # query positions clens-1 .. clens-1+K; their pool slots from the
        # padded block table (same arithmetic as host prepare_spec_verify)
        pos = jnp.maximum(clens - 1, 0)[:, None] + col
        bt_idx = jnp.clip(pos // block_size, 0, w - 1)
        blk = jnp.take_along_axis(block_tables, bt_idx, axis=1)
        slots = blk * block_size + pos % block_size
        slots = jnp.where((col < q_lens[:, None]) & (blk >= 0), slots, -1)
        logits, kv = forward_fn(
            params, kv, token_ids, q_lens, ctx, slots, block_tables,
            spec, block_size, attention_fn=attention_fn, all_logits=True,
            tp_axis=tp_axis,
        )
        rkey = jax.random.fold_in(key, rnd)
        if seed_info is not None:
            seeds, steps = seed_info[0], seed_info[1] + (clens - cur_lens)
        else:
            seeds, steps = None, None
        tokens, num_emitted = verify_and_sample(
            logits, drafts, ndraft, temperatures, rkey,
            top_k=top_k, top_p=top_p, seeds=seeds, steps=steps,
        )
        num_emitted = jnp.where(live, num_emitted, 0)
        toks, blens = append_tokens_device(toks, blens, tokens, num_emitted)
        clens = clens + num_emitted
        return (toks, blens, clens, kv), (tokens, num_emitted, ndraft)

    (_, _, _, kv_cache), (tok_rounds, emit_rounds, draft_rounds) = jax.lax.scan(
        body, (toks_buf, buf_lens, cur_lens, kv_cache),
        jnp.arange(rounds, dtype=jnp.int32),
    )
    return tok_rounds, emit_rounds, draft_rounds, kv_cache


def _spec_verify_step(
    params,
    kv_cache,
    token_ids,  # [B, K+1]: last real token then draft tokens
    q_lens,  # [B] = 1 + num_drafts
    context_lens,  # [B] = len + num_drafts
    slot_mapping,  # [B, K+1]
    block_tables,  # [B, W]
    draft_tokens,  # [B, K]
    num_drafts,  # [B]
    temperatures,  # [B]
    key,
    filters=None,
    seed_info=None,
    *,
    forward_fn,
    spec,
    block_size,
    attention_backend="auto",
    tp_axis=None,
    global_vocab=0,
    capture_hidden=False,
):
    """Speculative verify: one forward over the draft window scoring every
    position, then vectorized rejection sampling (ops/spec_sampler.py).
    Returns (tokens [B, K+1], num_emitted [B], kv_cache[, hidden [B, T, D]
    when capture_hidden — the Eagle drafter consumes the target's features])."""
    from functools import partial as _partial

    from byox_vllm_tpu.ops.attention import paged_attention
    from byox_vllm_tpu.ops.spec_sampler import verify_and_sample

    out, kv_cache = forward_fn(
        params, kv_cache, token_ids, q_lens, context_lens, slot_mapping, block_tables,
        spec, block_size,
        attention_fn=_partial(paged_attention, backend=attention_backend),
        all_logits=True,
        tp_axis=tp_axis,
        capture_hidden=capture_hidden,
    )
    logits, hidden = out if capture_hidden else (out, None)
    top_k, top_p = filters if filters is not None else (None, None)
    seeds, steps = seed_info if seed_info is not None else (None, None)
    tokens, num_emitted = verify_and_sample(
        logits, draft_tokens, num_drafts, temperatures, key,
        top_k=top_k, top_p=top_p, seeds=seeds, steps=steps,
    )
    if capture_hidden:
        return tokens, num_emitted, kv_cache, hidden
    return tokens, num_emitted, kv_cache
