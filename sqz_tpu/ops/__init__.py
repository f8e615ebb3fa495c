"""TPU compute path: block-parallel codec kernels (JAX/XLA/Pallas).

Design (see FORMAT.md §3, SURVEY.md §7 and PERF.md): the entropy coders are
serial *within* a block by construction — every token updates the adaptive
model the next token is coded with — so device throughput comes from coding
many independent blocks in lock-step, blocks riding the vector lanes.

Two generations live here:

* ``sqz4_pallas`` — the production kernels. The whole serial coder loop is
  ONE Mosaic kernel per direction (u64 registers as u32 pairs, incremental
  cumulative-frequency tables, staged ring I/O); used on real TPU backends.
* ``sqz4_jax`` / ``squeeze_jax`` / ``huffman_jax`` — the batched XLA scan
  formulation; bit-identical but ~100 µs/step in loop overhead (PERF.md),
  kept as the CPU-mesh / shard_map-dryrun path and differential reference.

x64 mode is required by the scan paths: the wire formats are defined over
exact 64-bit range-coder arithmetic (FORMAT.md §2.3). The Pallas kernels
use u32-pair emulation and pin every dtype explicitly.
"""

import jax

jax.config.update("jax_enable_x64", True)
