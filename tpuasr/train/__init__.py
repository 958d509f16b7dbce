from tpuasr.train.optim import make_optimizer, PlateauTracker
from tpuasr.train.step import TrainState, make_train_step, make_eval_step

__all__ = ["make_optimizer", "PlateauTracker", "TrainState", "make_train_step", "make_eval_step"]
