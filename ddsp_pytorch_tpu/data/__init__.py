"""L3 — data pipeline: preprocessing, cached dataset, loaders."""

from ddsp_pytorch_tpu.data.dataset import (  # noqa: F401
    Dataset,
    DataLoader,
    DeviceDataLoader,
    Datamodule,
    dict_collate,
)
from ddsp_pytorch_tpu.data.preprocess import (  # noqa: F401
    get_files,
    preprocess,
    preprocess_folder,
)
from ddsp_pytorch_tpu.data.synthetic import make_synthetic_dataset  # noqa: F401
