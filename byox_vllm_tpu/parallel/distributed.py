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
EXECUTED (not just compiled) by tests/test_multihost.py — two OS processes
join one jax.distributed runtime over a (data=2, model=2) CPU mesh whose
data axis spans the processes, run the full engine on the same request
stream with zero inter-host messages, and must produce identical outputs
equal to the single-process run. Request partitioning across the data axis
is the DataParallelScheduler (engine/scheduler.py): round-robin lane pinning
at admission — a pure function of arrival order, so every host derives it
independently. Sharding-compile coverage additionally via the 8-device CPU
mesh (tests/test_sharding.py, __graft_entry__.dryrun_multichip).
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


def put_global(x, sharding):
    """Place a host-replicated value onto a (possibly multi-process) sharding.

    Single process: plain device_put. Multi-process: every host passes the
    SAME value (the deterministic-lockstep contract — each host's scheduler
    derives identical batches), and the global array is assembled from each
    host's addressable shards without any cross-host transfer."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    import numpy as np

    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])
