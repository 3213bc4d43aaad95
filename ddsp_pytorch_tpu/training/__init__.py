"""L4 — training driver: loss, train state, jitted/pjitted step, fit loop."""

from ddsp_pytorch_tpu.training.loss import (  # noqa: F401
    multiscale_spec_loss,
    spectral_loss_from_signals,
)
from ddsp_pytorch_tpu.training.state import TrainState, create_train_state  # noqa: F401
from ddsp_pytorch_tpu.training.train import (  # noqa: F401
    Trainer,
    make_train_step,
    make_train_multi_step,
    make_eval_step,
)
