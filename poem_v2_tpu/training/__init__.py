from .optim import build_optimizer, build_schedule
from .trainer import TrainState, Trainer, make_train_step
