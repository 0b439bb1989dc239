"""Weight-only int8 (w8) conversion for the XLSR transformer stack.

Serving-mode counterpart of ``Wav2Vec2Config.w8``: takes a trained
float32/bfloat16 param tree and rewrites the six transformer matmul kernels
(q/k/v/out_proj/fc1/fc2 — ~96% of the 315M flagship parameters) into
``{vals: int8, scales: float32}`` pairs consumed by
:class:`rtdsd_tpu.models.wav2vec2.W8Dense`. Everything else (conv front-end,
layer norms, biases, AASIST/Conformer back-end) stays in float.

Quantization uses the Pallas per-column stochastic-rounding kernel
(:func:`rtdsd_tpu.ops.pallas.quant.quantize_int8`) on TPU and its jnp
fallback elsewhere; kernels are stacked (L, in, out) by ``nn.scan``, so the
kernel is vmapped over the layer axis.

There is no torch analogue in the reference (it serves f32/f16); this is a
TPU-build addition for the real-time small-batch path (PERFORMANCE.md).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import numpy as np

from rtdsd_tpu.ops.pallas.quant import quantize_int8

_W8_LEAVES = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")


def _is_dense_kernel(path: tuple, key: str) -> bool:
    return key in _W8_LEAVES and any("layers" in str(p) for p in path)


def quantize_encoder_params(params: Dict[str, Any], seed: int = 0
                            ) -> Dict[str, Any]:
    """f32/bf16 param tree -> w8 param tree (for a ``w8=True`` model).

    ``params`` is the plain/Frozen dict under the "params" collection. The
    returned tree has ``kernel`` replaced by ``vals``+``scales`` on the six
    transformer matmuls; all other leaves pass through unchanged. Each
    matmul (and each scanned layer) gets its own PRNG seed so stochastic
    rounding stays decorrelated across identically-shaped matrices; inside
    one matrix the kernel's grid offset decorrelates column blocks.
    """
    counter = [0]

    def next_seed() -> int:
        counter[0] += 1
        return seed + 7919 * counter[0]

    def rewrite(node: Any, path: tuple) -> Any:
        if not isinstance(node, Mapping):
            return node
        out = {}
        for key, child in node.items():
            if (isinstance(child, Mapping) and "kernel" in child
                    and _is_dense_kernel(path, key)):
                kernel = jax.numpy.asarray(child["kernel"], jax.numpy.float32)
                if kernel.ndim == 3:  # scan-stacked (L, in, out): loop, not
                    # vmap — vmap would make the batch the leading grid dim
                    # and defeat the kernel's per-block seed offset
                    pairs = [quantize_int8(kernel[i], seed=next_seed())
                             for i in range(kernel.shape[0])]
                    vals = jax.numpy.stack([p[0] for p in pairs])
                    scales = jax.numpy.stack([p[1] for p in pairs])
                else:
                    vals, scales = quantize_int8(kernel, seed=next_seed())
                new_child = {k: v for k, v in child.items() if k != "kernel"}
                new_child["vals"] = vals
                new_child["scales"] = scales
                out[key] = new_child
            else:
                out[key] = rewrite(child, path + (key,))
        return out

    out = rewrite(_to_plain(params), ())
    if counter[0] == 0:
        raise ValueError(
            "quantize_encoder_params found no transformer matmul kernels — "
            "is this a w2v param tree (expected .../layers/layer/{q,k,v,"
            "out_proj,fc1,fc2}/kernel)?")
    return out


def quantize_variables(variables: Dict[str, Any], seed: int = 0
                       ) -> Dict[str, Any]:
    """Whole-variables convenience wrapper (params + batch_stats etc.)."""
    out = dict(_to_plain(variables))
    out["params"] = quantize_encoder_params(out["params"], seed=seed)
    return out


def w8_bytes_saved(params: Dict[str, Any]) -> int:
    """Bytes of HBM weight traffic removed per forward vs bf16 storage."""
    saved = 0

    def walk(node, path):
        nonlocal saved
        if not isinstance(node, Mapping):
            return
        for key, child in node.items():
            if (isinstance(child, Mapping) and "kernel" in child
                    and _is_dense_kernel(path, key)):
                saved += int(np.prod(child["kernel"].shape))  # 2B -> 1B
            elif isinstance(child, Mapping):
                walk(child, path + (key,))

    walk(_to_plain(params), ())
    return saved


def _to_plain(tree):
    """FrozenDict (possibly nested) -> plain nested dict; dicts pass through."""
    unfreeze = getattr(tree, "unfreeze", None)
    return unfreeze() if callable(unfreeze) else tree
