from .sharded import ShardedFlatIndex, sharded_exact_search
from .train import TrainState, make_train_step, train_step_fn
