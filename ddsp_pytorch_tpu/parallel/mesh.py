"""Device-mesh construction.

Axis convention: ('data', 'time').  'data' carries batch/voices (gradient
psum rides ICI); 'time' carries the audio sample axis for long-form
synthesis (halo exchange between neighboring time shards).  On a multi-host
pod slice, call jax.distributed.initialize() before building the mesh; the
mesh uses all visible devices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = -1,
    time: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'time') mesh.

    data=-1 means "all remaining devices after the time axis".
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if time <= 0:
        time = 1
    if data == -1:
        if n % time != 0:
            raise ValueError(f"{n} devices not divisible by time={time}")
        data = n // time
    if data * time > n:
        raise ValueError(f"mesh {data}x{time} exceeds {n} devices")
    grid = np.asarray(devices[: data * time]).reshape(data, time)
    return Mesh(grid, axis_names=("data", "time"))
