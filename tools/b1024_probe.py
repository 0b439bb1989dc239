"""Push batched scoring past the b1024 OOM with a batch-chunked conv
front-end.

At b1024 the bf16 L0 conv activation (1024 x 12800 x 512) peaks ~19 GB >
15.75 GB HBM. The transformer's input is only (B, 199, 1024), so chunking
JUST the conv stack over the batch (lax.map -> XLA reuses one chunk-sized
buffer) caps the peak at chunk_b x 13 GB/1024 while the transformer still
sees the full batch. Measures ms/clip at (batch, chunks) vs the b768
unchunked baseline.

    python tools/b1024_probe.py [batch] [chunks]
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

from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.models.wav2vec2 import ConvFeatureExtractor
from rtdsd_tpu.utils.init_host import init_variables_host

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
CHUNKS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spec = get_model("XLSR_AASIST", dtype=jnp.bfloat16)
model = spec.module
conv = ConvFeatureExtractor(model.w2v_cfg, jnp.bfloat16)

clips = (np.random.default_rng(0).standard_normal((BATCH, 64000)) * 0.1
         ).astype(np.float32)
waves = jax.device_put(jnp.asarray(clips))
t0 = time.time()
variables = jax.device_put(init_variables_host(
    model, jnp.zeros((2, 64000), jnp.float32)))
jax.block_until_ready(variables)
log(f"init+put: {time.time() - t0:.1f}s")


@jax.jit
def score_chunked(variables, waves):
    b = waves.shape[0]
    chunks = waves.reshape(CHUNKS, b // CHUNKS, -1)
    conv_p = variables["params"]["ssl_model"]["feature_extractor"]
    feats = jax.lax.map(lambda w: conv.apply({"params": conv_p}, w), chunks)
    feats = feats.reshape(b, feats.shape[2], feats.shape[3])
    return model.apply(variables, None, train=False, conv_feats=feats)[:, 1]


t0 = time.time()
np.asarray(score_chunked(variables, waves))
log(f"compile+first: {time.time() - t0:.1f}s")
for _ in range(2):
    np.asarray(score_chunked(variables, waves))
times = []
for _ in range(12):
    t0 = time.perf_counter()
    np.asarray(score_chunked(variables, waves))
    times.append(time.perf_counter() - t0)
per = np.asarray(times) / BATCH * 1000
log(f"batch={BATCH} chunks={CHUNKS}: p50 {np.percentile(per, 50):.3f} "
    f"ms/clip ({BATCH / np.median(times):.0f} utt/s, "
    f"spread {per.min():.3f}-{per.max():.3f})")
