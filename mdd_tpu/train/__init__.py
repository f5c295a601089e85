from mdd_tpu.train.plateau import PlateauScheduler, PlateauAction
from mdd_tpu.train.loop import Trainer, TrainState
