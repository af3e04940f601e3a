from qpnet_tpu.utils.logging import set_loglevel  # noqa: F401
from qpnet_tpu.utils.multi_process import multi_processing  # noqa: F401
