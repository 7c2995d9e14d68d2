"""Multi-host serving scaffolding.

The reference's distributed runtime is single-node by construction: an NCCL
group over hardcoded tcp://localhost:2333 plus a pickle-over-shared-memory
RPC that lock-steps worker processes (nanovllm/engine/model_runner.py:27,
42-100). On TPU both planes dissolve into SPMD:

- every host runs the SAME engine loop (this module initializes
  jax.distributed so all hosts join one runtime; jit then compiles one
  global program whose collectives ride ICI within a slice and DCN across)
- scheduling is deterministic lockstep instead of an RPC broadcast: the
  scheduler is a pure function of the request stream (FCFS queues, integer
  arithmetic, content hashes), and sampling uses counter-derived PRNG keys,
  so identical inputs yield identical decisions and identical device
  programs on every host — no control-plane messages at all. Feeding every
  host the same request stream is the deployment contract (same file / same
  frontend broadcast), mirroring how the reference feeds every TP rank the
  same pickled seqs.

Single-chip hardware is all this environment exposes; the multi-host path is
compile-validated via the 8-device CPU mesh (tests/test_sharding.py and
__graft_entry__.dryrun_multichip).
"""

import os

import jax

from byox_vllm_tpu.utils.logging import logger


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-host JAX runtime. On Cloud TPU pods the arguments are
    discovered from the environment; pass them explicitly elsewhere."""
    kwargs = {}
    if coordinator_address or os.environ.get("BYOX_COORDINATOR"):
        kwargs["coordinator_address"] = coordinator_address or os.environ["BYOX_COORDINATOR"]
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    logger.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_primary_host() -> bool:
    return jax.process_index() == 0
