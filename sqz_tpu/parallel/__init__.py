"""Multi-chip / multi-host scaling (FORMAT.md §3, SURVEY.md §2.6).

The reference is strictly single-threaded; block parallelism over the sqzt
container is this framework's distribution model: blocks shard over a device
mesh (`jax.sharding.Mesh` axis "blocks"), every chip runs the same batched
codec scans on its local blocks, and the variable-length compressed payloads
are gathered in block order (the length table is the container's prefix-sum
index). Collectives ride ICI via shard_map (psum for telemetry, all_gather
for the ordered payload gather when a single host assembles the container).
"""

from sqz_tpu.parallel.mesh import make_mesh  # noqa: F401
