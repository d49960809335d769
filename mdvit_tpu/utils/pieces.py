"""Small cross-cutting utilities.

Capability parity with the reference's ``Utils/pieces.py`` (DotDict:5,
AvgMeter:76) plus YAML helpers used by the config system (C39 in SURVEY.md).
"""
from __future__ import annotations

from typing import Any, Iterator, Mapping

import yaml


class DotDict(dict):
    """A dict whose items are also reachable as attributes, recursively.

    Mirrors the reference config object (``Utils/pieces.py:5``): YAML is
    loaded into nested dicts and accessed as ``config.train.optimizer.mode``.
    Missing keys raise ``AttributeError`` (not silently ``None``) so typos in
    config access fail loudly.
    """

    def __init__(self, data: Mapping[str, Any] | None = None, **kwargs: Any):
        super().__init__()
        merged: dict[str, Any] = dict(data or {})
        merged.update(kwargs)
        for key, value in merged.items():
            self[key] = self._wrap(value)

    @classmethod
    def _wrap(cls, value: Any) -> Any:
        if isinstance(value, Mapping) and not isinstance(value, DotDict):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return type(value)(cls._wrap(v) for v in value)
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, self._wrap(value))

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for key, value in self.items():
            if isinstance(value, DotDict):
                out[key] = value.to_dict()
            elif isinstance(value, (list, tuple)):
                out[key] = type(value)(
                    v.to_dict() if isinstance(v, DotDict) else v for v in value
                )
            else:
                out[key] = value
        return out


def load_yaml(path: str) -> DotDict:
    with open(path, "r") as f:
        return DotDict(yaml.safe_load(f))


def flatten_dict(
    d: Mapping[str, Any], prefix: str = "", sep: str = "."
) -> Iterator[tuple[str, Any]]:
    for key, value in d.items():
        full = f"{prefix}{sep}{key}" if prefix else str(key)
        if isinstance(value, Mapping):
            yield from flatten_dict(value, full, sep)
        else:
            yield full, value


class AvgMeter:
    """Running average meter (reference: ``Utils/pieces.py:76``)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
