from rtdsd_tpu.ops.preemphasis import pre_emphasis  # noqa: F401
from rtdsd_tpu.ops.rawboost import rawboost  # noqa: F401
from rtdsd_tpu.ops.augment import waveform_augment  # noqa: F401
