"""Partitioner-safe grouped / depthwise 1-D convolutions.

XLA's SPMD partitioner (this toolchain, jax 0.8.x) mis-partitions the
*kernel gradient* of a feature-grouped convolution when the program runs
on a mesh with more than one axis: with batch sharded over ``data`` and a
``model`` axis present, d_kernel comes back multiplied by the model-axis
size (the forward pass is correct, which makes the bug silent — losses
match while gradients don't). Minimal repro + regression test:
``tests/test_distributed.py::test_grouped_conv_grad_multiaxis_mesh``.

The wav2vec2 relative positional conv (``feature_group_count=16``) and
the Conformer depthwise conv (``= channels``) are the only grouped convs
in this framework; these helpers compute the identical math through
forms the partitioner handles correctly:

- :func:`grouped_conv1d` — an unrolled loop of per-group *plain*
  convolutions (right for small group counts, e.g. pos_conv's 16);
- :func:`depthwise_conv1d` — the k-tap shift-multiply form (right for
  groups == channels, where a loop would be absurd and the per-channel
  product is just an elementwise FMA chain XLA fuses).

Both take the flax ``nn.Conv`` kernel layout ``(k, Cin // groups, Cout)``
so parameter trees (and converted reference checkpoints) are unchanged.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def grouped_conv1d(x: jax.Array, kernel: jax.Array,
                   bias: Optional[jax.Array], *, groups: int,
                   stride: int = 1,
                   padding: Sequence[Tuple[int, int]] = ((0, 0),)
                   ) -> jax.Array:
    """Feature-grouped conv1d as ``groups`` plain convolutions.

    x: (B, T, Cin); kernel: (k, Cin // groups, Cout) with Cout a multiple
    of ``groups`` (flax grouped-conv layout: output block g reads input
    block g).
    """
    _, _, cin = x.shape
    cout = kernel.shape[-1]
    if cin % groups or cout % groups:
        raise ValueError(f"channels {cin}->{cout} not divisible by "
                         f"{groups} groups")
    cg_in, cg_out = cin // groups, cout // groups
    outs = []
    for g in range(groups):
        xg = x[..., g * cg_in:(g + 1) * cg_in]
        wg = kernel[:, :, g * cg_out:(g + 1) * cg_out]
        outs.append(jax.lax.conv_general_dilated(
            xg, wg, (stride,), tuple(padding),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=x.dtype))
    y = jnp.concatenate(outs, axis=-1)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def depthwise_conv1d(x: jax.Array, kernel: jax.Array,
                     bias: Optional[jax.Array], *,
                     padding: Tuple[int, int]) -> jax.Array:
    """Depthwise conv1d (groups == channels) as a k-tap shift-multiply.

    x: (B, T, C); kernel: (k, 1, C). Output length is
    ``T + pad_lo + pad_hi - k + 1`` (stride 1), matching
    ``nn.Conv(C, (k,), padding=(padding,), feature_group_count=C)``.
    """
    k = kernel.shape[0]
    xp = jnp.pad(x, ((0, 0), padding, (0, 0)))
    t_out = xp.shape[1] - k + 1
    # Accumulate the k-tap sum in float32: term-by-term bf16 accumulation
    # adds ~sqrt(k)*eps_bf16 rounding noise relative to XLA conv's f32
    # accumulator (the eval path), a train/eval numerics gap that would
    # feed the conv module's BatchNorm statistics.
    y = None
    for j in range(k):
        term = (xp[:, j:j + t_out, :].astype(jnp.float32)
                * kernel[j, 0].astype(jnp.float32))
        y = term if y is None else y + term
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
