from qpnet_tpu.models.qpnet import (  # noqa: F401
    QPNet, init_params, forward, count_params,
)
from qpnet_tpu.models.generate import (  # noqa: F401
    batch_fast_generate, teacher_forced_logits,
)
