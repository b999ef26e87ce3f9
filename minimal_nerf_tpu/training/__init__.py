"""Training subsystem: jitted steps, optimizer, checkpointing, metrics, trainer."""

from minimal_nerf_tpu.training.config import TrainConfig  # noqa: F401
from minimal_nerf_tpu.training.loop import (  # noqa: F401
    make_eval_step,
    make_lr_schedule,
    make_multi_step,
    make_optimizer,
    make_train_step,
    nerf_loss,
    sample_train_batch,
    scene_static,
)
from minimal_nerf_tpu.training.trainer import (  # noqa: F401
    Trainer,
    load_model_for_inference,
    load_state_for_inference,
)
