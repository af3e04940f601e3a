from qpnet_tpu.data.h5io import (  # noqa: F401
    read_hdf5, write_hdf5, check_hdf5, shape_hdf5,
)
from qpnet_tpu.data.lists import (  # noqa: F401
    find_files, read_txt, write_txt, check_filenames,
)
from qpnet_tpu.data.stats import Scaler, calc_stats, load_scaler  # noqa: F401
from qpnet_tpu.data.batcher import (  # noqa: F401
    train_window_generator, background, BackgroundGenerator, padded_shape,
)
