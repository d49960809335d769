"""Model registry: name → constructor.

Replaces the reference's if/elif dispatch tables
(``multi_train_MDViT.py:56-65``, ``multi_train_BASE.py:66-88``).
"""
from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn: Callable):
        _REGISTRY[name] = fn
        return fn

    return deco


def _import_model_modules() -> None:
    """Import every model module so its ``@register_model`` side effects run."""
    import mdvit_tpu.models.mdvit  # noqa: F401
    import mdvit_tpu.models.base  # noqa: F401
    import mdvit_tpu.models.swin_unet  # noqa: F401
    import mdvit_tpu.models.utnet  # noqa: F401
    import mdvit_tpu.models.transfuse  # noqa: F401
    import mdvit_tpu.models.swin_unetr  # noqa: F401
    import mdvit_tpu.models.mpvit  # noqa: F401
    import mdvit_tpu.models.coat  # noqa: F401


def get_model(name: str, **kwargs):
    if name not in _REGISTRY:
        _import_model_modules()
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def list_models() -> list[str]:
    _import_model_modules()
    return sorted(_REGISTRY)
