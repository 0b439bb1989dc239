"""Feature-ring score-window gather shootout (r4, negative result).

The slice trick does NOT transfer to the score program: window
frames gather contiguous (C=512)-wide rows, which XLA already moves
efficiently (3.0-3.2 ms row-index vs 3.2-3.6 ms dynamic-slice at
B=256/512) - the score gather stays row-index.
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from rtdsd_tpu.utils.cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from jax import lax

slots_n, ring_frames, C = 513, 104, 512
win = 50
feats = jnp.asarray((np.random.default_rng(0).standard_normal(
    (slots_n, ring_frames, C))).astype(jnp.bfloat16))

def timeit(name, fn, n=10, rounds=3):
    fn(); fn()
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / n * 1000)
    print(f"{name}: {best:.2f} ms", file=sys.stderr, flush=True)
    return best

for B in (256, 512):
    rng = np.random.default_rng(1)
    slots = jnp.asarray(rng.integers(0, slots_n, B).astype(np.int32))
    starts = jnp.asarray(rng.integers(0, ring_frames, B).astype(np.int32))
    win_ar = jnp.arange(win, dtype=jnp.int32)

    @jax.jit
    def rowidx(feats, slots, starts):
        idx = (starts[:, None] + win_ar) % ring_frames
        w = feats[slots[:, None], idx]          # (B, win, C) row gather
        return w.astype(jnp.float32).sum()

    @jax.jit
    def dslice(feats, slots, starts):
        rows = feats[slots]                     # (B, ring_frames, C)
        dbl = jnp.concatenate([rows, rows], axis=1)
        w = jax.vmap(lambda r, s: lax.dynamic_slice(
            r, (s, 0), (win, C)))(dbl, starts)
        return w.astype(jnp.float32).sum()

    a = rowidx(feats, slots, starts); b = dslice(feats, slots, starts)
    print(f"B={B} equal: {abs(float(a-b)):.3e}", file=sys.stderr)
    timeit(f"B={B} row-index gather", lambda: rowidx(feats, slots, starts))
    timeit(f"B={B} dyn-slice", lambda: dslice(feats, slots, starts))
print("rc=0", file=sys.stderr)
