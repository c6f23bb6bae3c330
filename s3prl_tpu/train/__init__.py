from .optimizers import build_optimizer, build_scheduler
from .trainer import Trainer, TrainerConfig
from . import checkpoint
