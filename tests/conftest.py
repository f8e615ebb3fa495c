"""Test configuration: force a virtual 8-device CPU mesh for JAX tests.

Must run before jax initializes. The TPU kernels are platform-agnostic jax
code; multi-chip sharding is validated on the virtual CPU mesh here and
dry-run separately by the driver (see __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
