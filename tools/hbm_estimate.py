"""S=1024 serving-fault bisect via the new pre-flight estimator (no TPU
needed: abstract param trees + the engine's own _estimate_hbm, which runs
before any allocation when hbm_limit trips)."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from rtdsd_tpu.engine.serving import MultiStreamScorer
from rtdsd_tpu.models.registry import get_model

flag = get_model("XLSR_AASIST", dtype=jnp.bfloat16).module
cfg = flag.w2v_cfg
sr = 16000
duration = 16000 // cfg.total_stride * cfg.total_stride
hop = 8000 // cfg.total_stride * cfg.total_stride
fvars = jax.eval_shape(lambda: flag.init(jax.random.key(0),
                                         jnp.zeros((1, duration))))
fparams, fstats = fvars["params"], fvars.get("batch_stats", {})

stud = get_model("My_XLSR_AASIST", dtype=jnp.bfloat16, num_layers=6).module
svars = jax.eval_shape(lambda: stud.init(jax.random.key(0),
                                         jnp.zeros((1, duration))))
sparams, sstats = svars["params"], svars.get("batch_stats", {})

V5E = 16 * 2**30
for S in (256, 512, 768, 1024):
    for mode in ("flagship-bf16", "cascade10"):
        kw = dict(transport_dtype="int16")
        if mode == "cascade10":
            model, p, st = stud, sparams, sstats
            kw["escalate"] = (flag, fparams, fstats)
            kw["esc_batch"] = max(8, -(-S // 10))
        else:
            model, p, st = flag, fparams, fstats
        try:
            MultiStreamScorer(model, p, st, cfg, duration=duration, hop=hop,
                              max_streams=S, hbm_limit=1, **kw)
            print(f"S={S} {mode}: guard did not trip (?)")
        except ValueError as e:
            gib = e.hbm_estimate / 2**30  # structured attr on the guard
            verdict = "FITS" if gib < 16 else "EXCEEDS 16 GiB v5e"
            print(f"S={S:5d} {mode:13s}: estimate {gib:.2f} GiB -> {verdict}")
