from nerf_shared_tpu.train.state import TrainState, create_train_state
from nerf_shared_tpu.train.step import make_train_step, nerf_loss

__all__ = ["TrainState", "create_train_state", "make_train_step", "nerf_loss"]
