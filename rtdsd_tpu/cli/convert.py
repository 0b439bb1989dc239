"""Checkpoint conversion CLI.

    # fairseq XLSR pretraining checkpoint -> JAX pytree cache
    python -m rtdsd_tpu.cli.convert --fairseq xlsr2_300m.pt --out pretrained/xlsr_jax

    # HF transformers snapshot dir (facebook/wav2vec2-xls-r-300m) -> same cache
    python -m rtdsd_tpu.cli.convert --hf ~/hf/wav2vec2-xls-r-300m --out pretrained/xlsr_jax

    # trained reference model .pt -> framework weights dir
    python -m rtdsd_tpu.cli.convert --reference best.pt --model XLSR_AASIST \\
        --out runs/converted_best

Replaces the reference's in-process fairseq load
(``/root/reference/models/fe.py:11-12``) with an offline, cached conversion.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fairseq", type=str, default=None,
                   help="fairseq wav2vec2/XLSR .pt checkpoint")
    p.add_argument("--hf", type=str, default=None,
                   help="HF transformers snapshot dir (config.json + "
                        "model.safetensors / pytorch_model.bin)")
    p.add_argument("--reference", type=str, default=None,
                   help="trained reference model .pt state dict")
    p.add_argument("--model", type=str, default="XLSR_AASIST",
                   help="reference model class name (for --reference)")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args(argv)

    from rtdsd_tpu.models.convert_fairseq import (convert_reference_model,
                                                  convert_w2v_checkpoint,
                                                  load_torch_state_dict)

    if args.fairseq or args.hf:
        if args.hf:
            from rtdsd_tpu.models.convert_hf import (convert_hf_checkpoint,
                                                     load_hf_dir)

            sd, hf_cfg = load_hf_dir(args.hf)
            params, _ = convert_hf_checkpoint(sd, hf_cfg)
        else:
            sd = load_torch_state_dict(args.fairseq)
            params = convert_w2v_checkpoint(sd)
        from rtdsd_tpu.cli.common import save_ssl_params

        save_ssl_params(args.out, params)
        n = sum(np.asarray(x).size for x in _leaves(params))
        print(f"Converted XLSR front-end: {n / 1e6:.1f}M params -> {args.out}")
    elif args.reference:
        sd = load_torch_state_dict(args.reference)
        tree = convert_reference_model(sd, args.model)
        import os

        import flax.serialization as ser

        os.makedirs(args.out, exist_ok=True)
        blob = ser.msgpack_serialize(
            {"params": tree["params"], "batch_stats": tree["batch_stats"]})
        with open(os.path.join(args.out, "weights.msgpack"), "wb") as f:
            f.write(blob)
        print(f"Converted {args.model} -> {args.out}")
    else:
        p.error("one of --fairseq / --hf / --reference required")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
