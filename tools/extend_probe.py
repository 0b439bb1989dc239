"""Split the serving extend dispatch cost: conv forward vs ring scatter,
and candidate scatter reformulations, at serving shapes (S segments of
~0.5 s into a (S+1, ring, C) feature ring).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rtdsd_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.models.wav2vec2 import ConvFeatureExtractor
from rtdsd_tpu.utils.init_host import init_variables_host

S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
duration, hop, sr = 16000, 8000, 16000

flag = get_model("XLSR_AASIST", dtype=jnp.bfloat16).module
cfg = flag.w2v_cfg
stride = cfg.total_stride
rf = cfg.conv_receptive_field
seg_frames = hop // stride
seg_samples = rf + (seg_frames - 1) * stride
win_frames = cfg.num_frames(duration)
ring = -(-(win_frames + 2 * seg_frames) // 8) * 8
C = cfg.conv_layers[-1][0]
log(f"S={S} seg_samples={seg_samples} seg_frames={seg_frames} "
    f"ring={ring} C={C}")

fvars = init_variables_host(flag, jnp.zeros((2, duration), jnp.float32),
                            train=False)
conv_params = jax.device_put(fvars["params"]["ssl_model"]
                             ["feature_extractor"])
conv = ConvFeatureExtractor(cfg, jnp.bfloat16)

rng = np.random.default_rng(0)
segs = jax.device_put(jnp.asarray(
    rng.standard_normal((S, seg_samples)).astype(np.float32) * 0.1))
slots = jax.device_put(jnp.asarray(
    rng.permutation(S).astype(np.int32)))  # distinct slots
pos = jax.device_put(jnp.asarray(
    (rng.integers(0, ring // seg_frames, S) * seg_frames
     ).astype(np.int32)))
feats0 = jax.device_put(jnp.zeros((S + 1, ring, C), jnp.bfloat16))
new0 = jax.device_put(jnp.zeros((S, seg_frames, C), jnp.bfloat16))
seg_ar = jnp.arange(seg_frames, dtype=jnp.int32)


def _force(out):
    """Host readback of one dependent element — block_until_ready does
    NOT block through the axon relay (CLAUDE.md), only a readback does."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0].astype(jnp.float32))


def timeit(name, fn, *args, n=10):
    out = fn(*args)  # compile+warm
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / n * 1000
    log(f"{name}: {dt:.1f} ms")
    return out


@jax.jit
def conv_only(cp, segs):
    return conv.apply({"params": cp}, segs)


@jax.jit
def scatter_set(feats, new, slots, pos):
    idx = (pos[:, None] + seg_ar) % ring
    return feats.at[slots[:, None], idx].set(new)


@jax.jit
def scatter_rowwise(feats, new, slots, pos):
    # gather rows, one-hot-matmul the block into each row, scatter rows
    rows = feats[slots]  # (S, ring, C) gather
    idx = (pos[:, None] + seg_ar) % ring  # (S, seg_frames)
    oh = jax.nn.one_hot(idx, ring, dtype=feats.dtype)  # (S,f,ring)
    written = jnp.einsum("bfr,bfc->brc", oh, new)
    mask = oh.sum(1)[..., None]  # (S, ring, 1)
    rows = rows * (1 - mask) + written
    return feats.at[slots].set(rows)


@jax.jit
def scatter_dus_loop(feats, new, slots, pos):
    # fori over segments, dynamic_update_slice each (no wrap handling —
    # timing probe only; wrap would need 2 slices)
    def body(i, f):
        row = jax.lax.dynamic_slice(
            f, (slots[i], 0, 0), (1, ring, C))
        row = jax.lax.dynamic_update_slice(
            row, new[i][None], (0, pos[i], 0))
        return jax.lax.dynamic_update_slice(f, row, (slots[i], 0, 0))
    return jax.lax.fori_loop(0, S, body, feats)


new = timeit("conv only", conv_only, conv_params, segs)
new = new.astype(jnp.bfloat16)
timeit("scatter .at[].set (2-level)", scatter_set, feats0, new, slots, pos)
timeit("scatter rowwise (gather+onehot+row set)", scatter_rowwise,
       feats0, new, slots, pos)
timeit("scatter fori DUS", scatter_dus_loop, feats0, new, slots, pos)


@jax.jit
def fused_current(cp, feats, segs, slots, pos):
    n = conv.apply({"params": cp}, segs)
    idx = (pos[:, None] + seg_ar) % ring
    return feats.at[slots[:, None], idx].set(n.astype(feats.dtype))


timeit("fused conv+scatter (current extend)", fused_current, conv_params,
       feats0, segs, slots, pos)
log("rc=0")


fused_donated = jax.jit(fused_current.__wrapped__, donate_argnums=1)


def run_donated():
    f = feats0
    n = 10
    f = fused_donated(conv_params, f, segs, slots, pos)  # warm
    _force(f)
    t0 = time.perf_counter()
    for _ in range(n):
        f = fused_donated(conv_params, f, segs, slots, pos)
    _force(f)
    log(f"fused conv+scatter DONATED: "
        f"{(time.perf_counter() - t0) / n * 1000:.1f} ms")


run_donated()
log("rc2=0")
