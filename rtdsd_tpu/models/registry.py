"""Explicit model registry.

Replaces the reference's string -> ``globals()`` lookup
(``/root/reference/main.py:76-84``) with a registry dict. Each entry is a
factory ``(dtype, remat, **kwargs) -> ModelSpec``; ``kwargs`` carries the same
free-form model arguments the reference forwards from YAML
(``exp_config.kwargs`` / ``kd_kwargs['student_kwargs']``): ``num_layers``,
``order``, ``custom_order``, ``emb_size``, ``heads``, ``kernel_size``,
``n_encoders``, ``partial_freeze_layers`` ...
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax.numpy as jnp

from rtdsd_tpu.models.wav2vec2 import resolve_layer_indices
from rtdsd_tpu.models.zoo import XLSR_AASIST, XLSR_Conformer, make_w2v_cfg


@dataclasses.dataclass
class ModelSpec:
    """A constructed model plus the metadata the engine needs around it."""

    name: str
    module: Any                          # flax nn.Module
    layer_indices: List[int]             # which of the 24 XLSR layers it uses
    # Parameter-path substrings whose params should be frozen (optimizer
    # mask), mirroring the reference's requires_grad_=False partial freeze
    # (/root/reference/models/fe.py:26-34). A param matching both freeze
    # and unfreeze patterns stays trainable (the reference's `and not
    # non_target` clause, fe.py:29); reinit_patterns are Xavier-re-inited
    # after the SSL checkpoint load (fe.py:36-40 + xlsr_aasist.py:20-21).
    freeze_patterns: List[str] = dataclasses.field(default_factory=list)
    reinit_patterns: List[str] = dataclasses.field(default_factory=list)
    unfreeze_patterns: List[str] = dataclasses.field(default_factory=list)


_REGISTRY: Dict[str, Callable[..., ModelSpec]] = {}


def register_model(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def list_models() -> List[str]:
    return sorted(_REGISTRY)


def get_model(name: str, dtype=jnp.float32, remat: bool = False,
              **kwargs) -> ModelSpec:
    if name not in _REGISTRY:
        raise ValueError(f"Model {name!r} not registered; have {list_models()}")
    return _REGISTRY[name](dtype=dtype, remat=remat, **kwargs)


def _layer_kwargs(kwargs) -> tuple[int, List[int]]:
    num_layers = int(kwargs.get("num_layers", 24))
    order = kwargs.get("order", "first")
    custom_order = kwargs.get("custom_order", None)
    indices = resolve_layer_indices(24, num_layers, order, custom_order)
    return len(indices), indices


def _freeze_spec(kwargs) -> tuple[List[str], List[str], List[str]]:
    """Reference schema (xlsr_aasist.py:10-21): partial_freeze_layers =
    {target_layers, non_target_layers}; non-target layers stay trainable
    AND get re-inited; partial_freeze_init_layers adds extra re-inits."""
    pf = kwargs.get("partial_freeze_layers") or {}
    freeze = list(pf.get("target_layers", []))
    non_target = list(pf.get("non_target_layers", []))
    reinit = list(kwargs.get("partial_freeze_init_layers", [])) + non_target
    return freeze, reinit, non_target


@register_model("XLSR_AASIST")
def _xlsr_aasist(dtype=jnp.float32, remat=False, **kwargs) -> ModelSpec:
    freeze, reinit, unfreeze = _freeze_spec(kwargs)
    module = XLSR_AASIST(
        w2v_cfg=make_w2v_cfg(24, **kwargs.get("w2v", {})),
        fix_out_s1_bug=bool(kwargs.get("fix_out_s1_bug", False)),
        fused_gat=bool(kwargs.get("fused_gat", False)),
        dtype=dtype, remat=remat)
    return ModelSpec("XLSR_AASIST", module, list(range(24)), freeze, reinit,
                     unfreeze)


@register_model("My_XLSR_AASIST")
def _my_xlsr_aasist(dtype=jnp.float32, remat=False, **kwargs) -> ModelSpec:
    n, indices = _layer_kwargs(kwargs)
    module = XLSR_AASIST(
        w2v_cfg=make_w2v_cfg(n, **kwargs.get("w2v", {})),
        fix_out_s1_bug=bool(kwargs.get("fix_out_s1_bug", False)),
        fused_gat=bool(kwargs.get("fused_gat", False)),
        dtype=dtype, remat=remat)
    return ModelSpec("My_XLSR_AASIST", module, indices)


def _conformer(name, num_layers, indices, dtype, remat, kwargs) -> ModelSpec:
    module = XLSR_Conformer(
        w2v_cfg=make_w2v_cfg(num_layers, **kwargs.get("w2v", {})),
        emb_size=int(kwargs.get("emb_size", 144)),
        heads=int(kwargs.get("heads", 4)),
        kernel_size=int(kwargs.get("kernel_size", 31)),
        n_encoders=int(kwargs.get("n_encoders", 4)),
        dtype=dtype, remat=remat)
    return ModelSpec(name, module, indices)


# The reference names the conformer teacher just "Model"; configs also refer
# to it as ConformerModel in score-file names. Register under both, plus the
# descriptive name.
@register_model("Model")
@register_model("ConformerModel")
@register_model("XLSR_Conformer")
def _xlsr_conformer(dtype=jnp.float32, remat=False, **kwargs) -> ModelSpec:
    return _conformer("XLSR_Conformer", 24, list(range(24)), dtype, remat,
                      kwargs)


@register_model("MyModel")
@register_model("My_XLSR_Conformer")
def _my_xlsr_conformer(dtype=jnp.float32, remat=False, **kwargs) -> ModelSpec:
    n, indices = _layer_kwargs(kwargs)
    return _conformer("My_XLSR_Conformer", n, indices, dtype, remat, kwargs)
