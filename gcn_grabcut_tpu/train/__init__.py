from .losses import focal_loss, label_smoothing_ce, trimap_loss, make_loss_fn  # noqa: F401
from .trainer import Trainer, TrainConfig  # noqa: F401
from .checkpoints import (  # noqa: F401
    save_checkpoint, load_checkpoint, load_model_from_checkpoint,
    load_ensemble_from_checkpoints,
)
