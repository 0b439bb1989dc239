"""Per-dispatch timing of the cascade serving path at a given S:
extend (conv), student window-score, flagship escalation chunk —
isolates which dispatch makes cascade ticks slower than flagship-only.
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

from rtdsd_tpu.engine.serving import MultiStreamScorer
from rtdsd_tpu.models.registry import get_model
from rtdsd_tpu.utils.init_host import init_variables_host

S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ESC = int(sys.argv[2]) if len(sys.argv) > 2 else max(8, S // 10)
sr = 16000
duration, hop = 16000, 8000

flag = get_model("XLSR_AASIST", dtype=jnp.bfloat16).module
cfg = flag.w2v_cfg
fvars = init_variables_host(flag, jnp.zeros((2, duration), jnp.float32),
                            train=False)
fparams = jax.device_put(fvars["params"])
fstats = jax.device_put(fvars.get("batch_stats", {}))

stud = get_model("My_XLSR_AASIST", dtype=jnp.bfloat16, num_layers=6).module
svars = init_variables_host(stud, jnp.zeros((2, duration), jnp.float32),
                            train=False)
sp = dict(svars["params"])
ssl = dict(sp["ssl_model"])
ssl["feature_extractor"] = fparams["ssl_model"]["feature_extractor"]
sp["ssl_model"] = ssl
sparams = jax.device_put(sp)
sstats = jax.device_put(svars.get("batch_stats", {}))

eng = MultiStreamScorer(stud, sparams, sstats, cfg, duration=duration,
                        hop=hop, max_streams=S,
                        escalate=(flag, fparams, fstats),
                        escalate_band=-1.0, esc_batch=ESC)
t0 = time.time()
eng.warmup()
log(f"S={S} esc_batch={ESC}: warmup {time.time() - t0:.1f}s")

scratch = eng._scratch
slots_e = jnp.full((eng.extend_batch,), scratch, jnp.int32)
pos_e = jnp.zeros((eng.extend_batch,), jnp.int32)
segs = jnp.asarray(np.random.default_rng(0).standard_normal(
    (eng.extend_batch, eng.seg_samples)).astype(np.float32) * 0.1)
slots_s = jnp.full((eng.score_batch,), scratch, jnp.int32)
starts_s = jnp.zeros((eng.score_batch,), jnp.int32)
slots_c = jnp.full((ESC,), scratch, jnp.int32)
starts_c = jnp.zeros((ESC,), jnp.int32)


def timeit(name, fn, n=8):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    np.asarray(out[0] if isinstance(out, tuple) else out)
    dt = (time.perf_counter() - t0) / n * 1000
    log(f"{name}: {dt:.1f} ms")
    return dt


def do_extend():
    eng._feats = eng._extend(eng._conv_params, eng._feats, segs,
                             slots_e, pos_e)
    return eng._feats


def do_score():
    return np.asarray(eng._score(eng.params, eng.batch_stats, eng._feats,
                                 slots_s, starts_s))


def do_esc():
    return np.asarray(eng._score_esc(eng._esc_params, eng._esc_stats,
                                     eng._feats, slots_c, starts_c))


timeit("extend (conv, B=%d)" % eng.extend_batch, do_extend)
timeit("student score (B=%d)" % eng.score_batch, do_score)
timeit("flagship esc (B=%d)" % ESC, do_esc)

# flagship-only reference: same engine without cascade
eng2 = MultiStreamScorer(flag, fparams, fstats, cfg, duration=duration,
                         hop=hop, max_streams=S)
eng2.warmup()


def do_score2():
    return np.asarray(eng2._score(eng2.params, eng2.batch_stats,
                                  eng2._feats, slots_s, starts_s))


timeit("flagship score (B=%d)" % eng2.score_batch, do_score2)
log("rc=0")
