"""Test configuration: force the CPU backend with 8 virtual devices so mesh /
sharding tests run anywhere and parity tests get exact fp32 matmuls (the TPU
path is exercised by bench.py and the driver's dryrun).

Note: the environment's sitecustomize registers the TPU ('axon') PJRT plugin
at interpreter start and pins jax_platforms — plain JAX_PLATFORMS env vars
are overridden, so the config is forced back here before backends initialize.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
