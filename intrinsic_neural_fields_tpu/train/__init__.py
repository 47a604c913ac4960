from .losses import get_loss_fn, elementwise_loss
from .config import (
    load_config,
    load_config_file,
    get_seed,
    get_log_dir,
    get_data,
    get_model_and_optim,
    get_renderer,
)
from .trainer import Trainer
