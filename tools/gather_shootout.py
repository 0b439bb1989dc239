"""Sample-ring escalation gather shootout (r4, PERFORMANCE.md).

Times three bit-equal forms of the escalation window gather on the
(slots, ring_frames, stride) int16 sample ring: the per-element flat
gather (r3 proven form), a vmapped dynamic_slice on the doubled slot
row (6.2x faster, now the default esc_gather="slice"), and the
(B, rows, 320) row-granular gather (the form whose full-program
composition faulted the worker at S=1024 in r3).
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from rtdsd_tpu.utils.cache import enable_persistent_compile_cache
enable_persistent_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from jax import lax

slots_n, ring_frames, stride = 513, 104, 320
dur = 16000
ring_samples = ring_frames * stride
swave = jnp.asarray((np.random.default_rng(0).standard_normal(
    (slots_n, ring_frames, stride)) * 3000).astype(np.int16))

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

for B in (64, 128):
    rng = np.random.default_rng(1)
    slots = jnp.asarray(rng.integers(0, slots_n, B).astype(np.int32))
    starts = jnp.asarray((rng.integers(0, ring_frames, B) ).astype(np.int32))
    dur_ar = jnp.arange(dur, dtype=jnp.int32)

    @jax.jit
    def elem(swave, slots, starts):
        flat = swave.reshape(slots_n, ring_samples)
        sidx = (starts[:, None] * stride + dur_ar) % ring_samples
        return (flat[slots[:, None], sidx].astype(jnp.float32) * (1/32768.0)).sum()

    @jax.jit
    def dslice(swave, slots, starts):
        flat = swave.reshape(slots_n, ring_samples)
        rows = flat[slots]                       # (B, ring) row gather
        dbl = jnp.concatenate([rows, rows], axis=1)   # wrap handling
        def one(row, s):
            return lax.dynamic_slice(row, (s * stride,), (dur,))
        w = jax.vmap(one)(dbl, starts)
        return (w.astype(jnp.float32) * (1/32768.0)).sum()

    @jax.jit
    def rowgather(swave, slots, starts):
        # (B, rows, 320) row-granular gather — the form that faulted at
        # S=1024 in r3; probing ONLY at S=512 shapes
        need = dur // stride
        ridx = (starts[:, None] + jnp.arange(need, dtype=jnp.int32)) % ring_frames
        w = swave[slots[:, None], ridx]          # (B, need, 320)
        return (w.astype(jnp.float32) * (1/32768.0)).sum()

    a = elem(swave, slots, starts); b = dslice(swave, slots, starts); c = rowgather(swave, slots, starts)
    print(f"B={B} equal: dslice {abs(float(a-b)):.3e} rowgather {abs(float(a-c)):.3e}", file=sys.stderr)
    timeit(f"B={B} elem-gather", lambda: elem(swave, slots, starts))
    timeit(f"B={B} dyn-slice", lambda: dslice(swave, slots, starts))
    timeit(f"B={B} row-gather", lambda: rowgather(swave, slots, starts))
print("rc=0", file=sys.stderr)
