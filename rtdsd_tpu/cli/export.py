"""Portable model export via ``jax.export`` (serialized StableHLO).

Packages the scoring function — raw bonafide logit, NO pre-emphasis, the
exact semantics of ``cli.main --is_score`` (ref ``produce_evaluation_file``,
``/root/reference/main.py:199-221``) — into ONE self-contained artifact with
the checkpoint's weights baked in as constants. The artifact runs under any
jax.export-compatible runtime (JAX on CPU/TPU, or downstream StableHLO
consumers) with no dependency on this repo's Python code: the deployment
story for the paper's resource-limited targets, where the reference would
re-install torch+fairseq on the edge device.

    # flagship (teacher) scorer, symbolic batch, CPU+TPU lowering
    python -m rtdsd_tpu.cli.export --config cfg.yaml --ckpt runs/best \
        --out model.jaxexp

    # distilled student at a fixed batch, int8 MXU matmuls
    python -m rtdsd_tpu.cli.export --config kd.yaml --ckpt runs/last_kd \
        --student --w8a8 --batch 64 --out student.jaxexp

The default symbolic batch dimension (``--batch sym``) lets the serving
side pick its batch at run time; weights-as-constants is intentional here
(offline one-time lowering — the CLAUDE.md jit-over-host-params landmine
is about repeated XLA *compiles*, which export never performs).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def export_scorer(module, variables, *, num_samples: int,
                  batch: Optional[int] = None,
                  platforms: Sequence[str] = ("cpu", "tpu")):
    """Export ``module``'s scoring forward as a ``jax.export.Exported``.

    ``batch=None`` exports a symbolic ("b") leading dimension; an int pins
    it. ``variables`` (params + batch_stats) are baked into the artifact.
    """
    from jax import export as jexport

    def score(waves):
        return module.apply(variables, waves, train=False)[:, 1]

    if batch is None:
        b, = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    arg = jax.ShapeDtypeStruct((b, int(num_samples)), jnp.float32)
    return jexport.export(jax.jit(score), platforms=tuple(platforms))(arg)


def save_exported(exported, path: str, meta: dict) -> None:
    """Write the serialized artifact plus a ``<path>.json`` sidecar."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    meta = dict(meta, in_avals=[str(a) for a in exported.in_avals],
                out_avals=[str(a) for a in exported.out_avals],
                platforms=list(exported.platforms),
                artifact_bytes=len(blob))
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def load_exported(path: str):
    """Deserialize an artifact written by :func:`save_exported`.

    The returned object's ``.call(waves)`` scores a ``(B, T)`` float32
    batch on the current JAX backend.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def main(argv=None):
    p = argparse.ArgumentParser(
        description="export a scoring model as serialized StableHLO")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--batch", type=str, default="sym",
                   help='"sym" (symbolic, default) or a fixed batch size')
    p.add_argument("--duration_sec", type=float, default=None,
                   help="clip seconds (default: config test_duration_sec)")
    p.add_argument("--student", action="store_true",
                   help="export kd_kwargs.student_kwargs model "
                        "(sys_config.student_model) instead of the teacher")
    p.add_argument("--w8", action="store_true",
                   help="int8-quantize transformer weights first")
    p.add_argument("--w8a8", action="store_true",
                   help="w8 plus dynamic int8 activations (int8 MXU)")
    p.add_argument("--platforms", type=str, default="cpu,tpu",
                   help="comma-separated lowering platforms")
    args = p.parse_args(argv)

    from rtdsd_tpu.cli.common import load_eval_model
    from rtdsd_tpu.config import load_yaml_config

    sys_config, exp_config = load_yaml_config(args.config)
    if args.student:
        kd = exp_config.kd_kwargs or {}
        name, kwargs = sys_config.student_model, kd.get("student_kwargs", {})
    else:
        name, kwargs = None, None
    spec, state, _mesh, _bsharding = load_eval_model(
        sys_config, exp_config, args.ckpt, w8=args.w8, w8a8=args.w8a8,
        name=name, kwargs=kwargs)

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    dur = (args.duration_sec if args.duration_sec is not None
           else exp_config.test_duration_sec)
    num_samples = int(round(dur * exp_config.sample_rate))
    batch = None if args.batch == "sym" else int(args.batch)
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s)

    exported = export_scorer(spec.module, variables,
                             num_samples=num_samples, batch=batch,
                             platforms=platforms)
    save_exported(exported, args.out, {
        "model": spec.name,
        "ckpt": os.path.abspath(args.ckpt),
        "duration_sec": dur,
        "sample_rate": exp_config.sample_rate,
        "batch": "symbolic" if batch is None else batch,
        "quant": "w8a8" if args.w8a8 else ("w8" if args.w8 else "none"),
        "semantics": "score = bonafide logit, no pre-emphasis",
    })
    print(f"exported {spec.name} -> {args.out} "
          f"({os.path.getsize(args.out)} bytes, platforms={platforms}, "
          f"batch={'sym' if batch is None else batch}, T={num_samples})")


if __name__ == "__main__":
    main()
