"""Test configuration: force a virtual 8-device CPU mesh for JAX tests.

The container's sitecustomize registers the axon TPU backend and forces
``jax_platforms="axon,cpu"``; tests must run on a virtual CPU mesh, so we
override the config before any backend initializes (safe: sitecustomize does
not initialize backends). Multi-chip sharding is validated on the virtual
8-device CPU mesh here and dry-run separately by the driver
(__graft_entry__.dryrun_multichip).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
