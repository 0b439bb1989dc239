"""rtdsd_tpu — TPU-native real-time deepfake (spoofed) speech detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``hungdinhxuan/real-time-deepfake-speech-detection`` (PyTorch reference):
binary spoofed-speech detection over raw 16 kHz waveforms with an
XLSR (wav2vec2) front-end and AASIST / Conformer back-ends, RawBoost and
waveform augmentation, DDP-equivalent data parallelism over a
``jax.sharding.Mesh``, knowledge distillation, and ASVspoof scoring.

Layout:
  - ``config``    typed config mirroring the reference YAML schema
  - ``models``    flax model zoo (XLSR front-end, AASIST, Conformer) + registry
  - ``ops``       device DSP: pre-emphasis, RawBoost, waveform augmentation
  - ``data``      protocol parsers, audio decode, static-shape batching
  - ``engine``    jitted train/eval/score steps, KD engine, checkpointing
  - ``parallel``  mesh construction + sharding rules (dp/fsdp/tp)
  - ``utils``     EER, metrics, logging, seeding
  - ``cli``       train / score / KD entry points
"""

__version__ = "0.1.0"

from rtdsd_tpu.config import ExpConfig, SysConfig, load_yaml_config  # noqa: F401
