from qpnet_tpu.utils.jax_cache import enable_compile_cache  # noqa: F401
from qpnet_tpu.utils.logging import set_loglevel  # noqa: F401
from qpnet_tpu.utils.multi_process import multi_processing  # noqa: F401
