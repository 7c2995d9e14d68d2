"""Test configuration: force the CPU backend with 8 virtual devices so mesh /
sharding tests run anywhere (the TPU path is exercised by bench.py and the
driver's dryrun)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
