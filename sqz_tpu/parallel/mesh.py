"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh
import numpy as np


def make_mesh(n_devices: Optional[int] = None, axis: str = "blocks",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the block axis — the natural sharding for independent
    sqzt blocks. Multi-host: pass jax.devices() spanning all processes."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
