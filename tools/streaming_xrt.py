"""Streaming real-time factor (xRT) of the chunked sliding-window scorer.

Scores long synthetic audio with engine/streaming.StreamingScorer (4 s
windows, 2 s hop, flagship XLSR_AASIST bf16) and reports wall-clock seconds
of compute per second of audio (xRT < 1 = faster than real time). Includes
the relay dispatch overhead, so this is the deployable end-to-end number,
not just device time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()


def log(m):
    print(m, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.engine.steps import make_score_step
from rtdsd_tpu.engine.streaming import StreamingScorer
from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host

SR = 16000
DUR = 4 * SR
HOP = 2 * SR
BATCH = 16
AUDIO_SECONDS = int(sys.argv[1]) if len(sys.argv) > 1 else 120

spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16)
model = spec.module
v = jax.device_put(init_variables_host(
    model, jnp.zeros((2, DUR), jnp.float32), train=False))
jax.block_until_ready(v)

from rtdsd_tpu.engine.streaming import IncrementalStreamingScorer  # noqa: E402

naive = StreamingScorer(make_score_step(model), v["params"],
                        v.get("batch_stats", {}), duration=DUR, hop=HOP,
                        batch_size=BATCH)
inc = IncrementalStreamingScorer(model, v["params"],
                                 v.get("batch_stats", {}),
                                 model.w2v_cfg, duration=DUR, hop=HOP,
                                 batch_size=BATCH)

wave = (np.random.default_rng(0).standard_normal(AUDIO_SECONDS * SR) * 0.1
        ).astype(np.float32)

for tag, scorer in [("naive", naive), ("incremental", inc)]:
    t0 = time.time()
    s = scorer.score(wave)
    log(f"{tag}: compile+first {time.time() - t0:.1f}s (utt score {s:.3f})")
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        scorer.score(wave)
        times.append(time.perf_counter() - t0)
    xrt = min(times) / AUDIO_SECONDS
    n_windows = 1 + max(0, (AUDIO_SECONDS * SR - DUR)) // HOP
    log(f"{tag}: {AUDIO_SECONDS}s audio, {n_windows} windows (4s/2s hop), "
        f"batch {BATCH}: {min(times)*1000:.0f} ms -> xRT {xrt:.5f} "
        f"({1.0/xrt:.0f}x faster than real time)")
