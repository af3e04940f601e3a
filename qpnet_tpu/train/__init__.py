from qpnet_tpu.train.step import (  # noqa: F401
    masked_ce_loss, make_optimizer, make_train_step, make_eval_step, TrainState,
    param_sharding_tree, shard_train_state,
)
from qpnet_tpu.train.checkpoint import (  # noqa: F401
    save_checkpoint, load_checkpoint, save_final,
)
