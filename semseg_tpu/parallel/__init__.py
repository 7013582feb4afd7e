from .mesh import (
    batch_sharding,
    device_prefetch,
    make_mesh,
    make_mesh_2d,
    replicate_state,
    replicated,
    shard_batch,
)
from . import distributed
from .train_step import (
    TrainState,
    create_train_state,
    current_lrs,
    jitted_train_step,
    make_optimizer,
    stack_microbatches,
    train_step,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "distributed",
    "device_prefetch",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_state",
    "TrainState",
    "create_train_state",
    "train_step",
    "jitted_train_step",
    "stack_microbatches",
    "make_optimizer",
    "current_lrs",
]
