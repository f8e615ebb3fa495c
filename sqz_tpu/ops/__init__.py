"""TPU compute path: block-parallel codec kernels (JAX/XLA/Pallas).

Design (see FORMAT.md §3 and SURVEY.md §7): the entropy coders are serial
*within* a block by construction — every token updates the adaptive model the
next token is coded with — so device throughput comes from coding many
independent blocks in lock-step. Each kernel is a batched state machine: the
per-block coder state (range-coder registers, model frequency tables, output
cursors) lives in arrays with a leading block axis, one `lax.scan` /
`lax.while_loop` step advances every block by one micro-operation, and all
per-step work (cumulative frequencies, renormalization, scatter/gather of
stream bytes) is vectorized across blocks and the 256-symbol axis.

x64 mode is required: the wire formats are defined over exact 64-bit
range-coder arithmetic (FORMAT.md §2.3).
"""

import jax

jax.config.update("jax_enable_x64", True)
