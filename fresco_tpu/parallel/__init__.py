from fresco_tpu.parallel.sharding import (
    make_mesh,
    shard_model_params,
    frame_sharding,
)
from fresco_tpu.parallel.train import train_step, TrainState
