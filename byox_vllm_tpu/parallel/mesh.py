"""Device mesh construction.

The TPU replacement for the reference's process topology (NCCL process group
+ shm RPC control plane, nanovllm/engine/model_runner.py:27,42-100): a single
SPMD program over a named ``jax.sharding.Mesh`` with axes

  - ``data``  : replica / batch parallelism (requests sharded across it)
  - ``model`` : tensor parallelism (heads / hidden features sharded)

XLA inserts all collectives (all-reduce for row-parallel matmuls, gathers for
the vocab-parallel head) over ICI/DCN automatically from the shardings in
parallel/shardings.py. Multi-host runs initialize jax.distributed and run the
same engine loop on every host.
"""

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
STAGE_AXIS = "stage"  # pipeline stages (models/pp.py); present when pp > 1


def make_mesh(
    tensor_parallel_size: int = 1,
    data_parallel_size: int = 1,
    pipeline_parallel_size: int = 1,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    needed = tensor_parallel_size * data_parallel_size * pipeline_parallel_size
    assert len(devices) >= needed, f"need {needed} devices, have {len(devices)}"
    if pipeline_parallel_size > 1:
        grid = np.array(devices[:needed]).reshape(
            data_parallel_size, pipeline_parallel_size, tensor_parallel_size
        )
        return Mesh(grid, (DATA_AXIS, STAGE_AXIS, MODEL_AXIS))
    grid = np.array(devices[:needed]).reshape(data_parallel_size, tensor_parallel_size)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
