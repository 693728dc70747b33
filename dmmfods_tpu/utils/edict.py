"""Attribute-style dictionary (EasyDict-compatible surface).

The reference config system is built on ``easydict.EasyDict``
(see reference ``dmmfods/utils/Dense_U_Net_lidar_helper.py:9``); preserving the
attribute-access config API is part of the public surface we keep. This is a
fresh, dependency-free implementation: a ``dict`` subclass where item and
attribute access are interchangeable and nested mappings are converted
recursively.
"""

from __future__ import annotations

from typing import Any, Mapping


class EDict(dict):
    """``dict`` with attribute access; nested dicts are converted recursively."""

    def __init__(self, mapping: Mapping[str, Any] | None = None, **kwargs: Any):
        super().__init__()
        if mapping is not None:
            for key, value in mapping.items():
                self[key] = value
        for key, value in kwargs.items():
            self[key] = value

    @staticmethod
    def _convert(value: Any) -> Any:
        if isinstance(value, EDict):
            return value
        if isinstance(value, Mapping):
            return EDict(value)
        if isinstance(value, (list, tuple)):
            converted = [EDict._convert(v) for v in value]
            return type(value)(converted) if isinstance(value, tuple) else converted
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, EDict._convert(value))

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as exc:  # AttributeError expected by hasattr() etc.
            raise AttributeError(key) from exc

    def __delattr__(self, key: str) -> None:
        try:
            del self[key]
        except KeyError as exc:
            raise AttributeError(key) from exc

    def copy(self) -> "EDict":
        return EDict(self)

    def __deepcopy__(self, memo: dict) -> "EDict":
        import copy as _copy

        out = EDict()
        memo[id(self)] = out
        for key, value in self.items():
            dict.__setitem__(out, _copy.deepcopy(key, memo), _copy.deepcopy(value, memo))
        return out

    def to_dict(self) -> dict:
        """Plain-``dict`` (recursive) view, e.g. for JSON serialization."""

        def plain(value: Any) -> Any:
            if isinstance(value, dict):
                return {k: plain(v) for k, v in value.items()}
            if isinstance(value, (list, tuple)):
                return [plain(v) for v in value]
            return value

        return plain(self)


# Alias matching the reference import style (`from easydict import EasyDict as edict`).
EasyDict = EDict
edict = EDict
