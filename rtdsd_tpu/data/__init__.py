from rtdsd_tpu.data.io import load_audio  # noqa: F401
from rtdsd_tpu.data.dataset import (  # noqa: F401
    ASVspoof2019LA, ASVspoof2019LA_eval, ASVspoof2021DF_eval,
    ASVspoof2021LA_eval, ASVSpoof5, FakeOrReal, InTheWild,
    adjust_duration, adjust_duration_random_start)
from rtdsd_tpu.data.loader import DataLoader  # noqa: F401
