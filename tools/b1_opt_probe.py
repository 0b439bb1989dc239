"""Batch-1 latency levers (VERDICT r1 item 9): measure cheap XLA-level
restructures of the flagship before/instead of a back-end megakernel.

Variants (full XLSR_AASIST forward, B=1, carry-dependent scan-of-K):
  base        — shipping eval config (scan over 24 layers)
  unroll24    — scan_unroll=24 (flat transformer program: kills the scan
                loop's per-iteration overhead, which B>=8 amortizes but
                B=1 may not)
  segconv     — conv front-end computed as 8 batched segments (stride-
                aligned, exact) then flattened: turns the B=1 64k-sample
                conv chain into a better-utilized B=8 x 8.08k one
  base_f32    — backend (AASIST graph) in float32 (tiny-op layout costs
                sometimes dominate bf16 at B=1)

    python tools/b1_opt_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()


def log(m):
    print(m, file=sys.stderr, flush=True)


import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.engine.streaming import receptive_field
from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
from rtdsd_tpu.models.zoo import XLSR_AASIST
from rtdsd_tpu.utils.init_host import init_variables_host

K = 32
rng = np.random.default_rng(0)
wave_np = (rng.standard_normal((1, 64000)) * 0.1).astype(np.float32)


def bench(tag, fn, v, x):
    jfn = jax.jit(fn)

    t0 = time.time()
    float(jfn(v, x))
    compile_s = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jfn(v, x))
        ts.append((time.perf_counter() - t0) / K * 1000)
    log(f"{tag:12s}: {min(ts):6.3f} ms/clip  [compile {compile_s:.1f}s]")
    return min(ts)


def scanned(apply_fn):
    def many(v, x):
        def body(carry, _):
            out = apply_fn(v, x * (1.0 + carry * 1e-30))
            return carry + jnp.sum(out.astype(jnp.float32)) * 1e-30, None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return out
    return many


cfg = Wav2Vec2Config()
model = XLSR_AASIST(w2v_cfg=cfg, dtype=jnp.bfloat16)
v = jax.device_put(init_variables_host(model, jnp.asarray(wave_np),
                                       train=False))
jax.block_until_ready(v)
x = jax.device_put(jnp.asarray(wave_np))

t_base = bench("base", scanned(
    lambda v, x: model.apply(v, x, train=False)), v, x)

# unrolled transformer scan
cfg24 = dataclasses.replace(cfg, scan_unroll=24)
model24 = XLSR_AASIST(w2v_cfg=cfg24, dtype=jnp.bfloat16)
t_unroll = bench("unroll24", scanned(
    lambda v, x: model24.apply(v, x, train=False)), v, x)

# segmented conv: split the wave into 8 stride-aligned overlapping segments,
# run the conv extractor at B=8, flatten frames, re-enter via conv_feats
stride = cfg.total_stride
rf = receptive_field(cfg.conv_layers)
total_frames = cfg.num_frames(64000)          # 199
seg_frames = -(-total_frames // 8)            # 25
seg_samples = rf + (seg_frames - 1) * stride  # 8080
seg_hop = seg_frames * stride

from rtdsd_tpu.models.wav2vec2 import ConvFeatureExtractor  # noqa: E402

conv = ConvFeatureExtractor(cfg, jnp.bfloat16)


def segconv_apply(v, x):
    pad_to = 7 * seg_hop + seg_samples
    xp = jnp.pad(x[0], (0, max(0, pad_to - x.shape[1])))
    segs = jnp.stack([jax.lax.dynamic_slice_in_dim(xp, i * seg_hop,
                                                   seg_samples)
                      for i in range(8)])
    feats = conv.apply(
        {"params": v["params"]["ssl_model"]["feature_extractor"]}, segs)
    feats = feats.reshape(1, -1, feats.shape[-1])[:, :total_frames]
    return model.apply(v, None, train=False, conv_feats=feats)


t_seg = bench("segconv", scanned(segconv_apply), v, x)


def segconv_unroll_apply(v, x):
    pad_to = 7 * seg_hop + seg_samples
    xp = jnp.pad(x[0], (0, max(0, pad_to - x.shape[1])))
    segs = jnp.stack([jax.lax.dynamic_slice_in_dim(xp, i * seg_hop,
                                                   seg_samples)
                      for i in range(8)])
    feats = conv.apply(
        {"params": v["params"]["ssl_model"]["feature_extractor"]}, segs)
    feats = feats.reshape(1, -1, feats.shape[-1])[:, :total_frames]
    return model24.apply(v, None, train=False, conv_feats=feats)


t_both = bench("seg+unroll", scanned(segconv_unroll_apply), v, x)

log(f"== base {t_base:.3f} -> unroll {t_unroll:.3f}, segconv {t_seg:.3f}, "
    f"both {t_both:.3f} ms/clip ==")

# numeric check of the segmented conv path
a = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
b = jax.jit(segconv_apply)(v, x)
log(f"segconv drift: {float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))):.5f}")
