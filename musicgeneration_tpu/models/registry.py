"""Tiny model registry: name -> (module class, default config builder).

Replaces the reference's per-model script silos (each model had its own
config.py/train.py/generate.py trio) with one lookup the trainer and CLI
share."""

from __future__ import annotations

from typing import Callable, Dict, Tuple, Type

_REGISTRY: Dict[str, Tuple[type, Callable[..., dict]]] = {}


def register_model(name: str, default_config: Callable[..., dict] | None = None):
    def wrap(cls: Type):
        _REGISTRY[name] = (cls, default_config or (lambda **kw: dict(kw)))
        return cls

    return wrap


def get_model(name: str):
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def registered_models():
    return sorted(_REGISTRY)
