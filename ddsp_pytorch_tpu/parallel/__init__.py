"""Parallelism layer: device mesh, shardings, halo collectives, scans.

The reference is strictly single-process/single-device (SURVEY.md §2.7); this
layer is new, TPU-first capability: a ('data', 'time') mesh where the
batch/voice axis shards over 'data' (pjit + psum gradient reduction) and the
audio time axis shards over 'time' (distributed phase scan + overlap-save
halo exchange for convolutions + STFT frame halos — parallel/ops.py).
"""

from ddsp_pytorch_tpu.parallel.mesh import make_mesh  # noqa: F401
from ddsp_pytorch_tpu.parallel.sharding import (  # noqa: F401
    replicate_state,
    shard_batch,
    shard_train_step,
)
