from rtdsd_tpu.utils.metrics import AverageMeter, EarlyStopping, compute_eer  # noqa: F401
from rtdsd_tpu.utils.logging import Logger  # noqa: F401
from rtdsd_tpu.utils.rng import RngStream, set_seed  # noqa: F401
