"""Helm-like values-file loading for backend artifact generation.

Reference parity: wurzel/executors/backend/values.py — multiple YAML
values files deep-merge left-to-right (later files override, nested
dicts merge recursively, values.py:23-38) and validate into a typed
config model. Errors surface as :class:`ValuesFileError` for a missing
file, unparseable YAML, or a non-mapping document (values.py:40-52).
"""

from __future__ import annotations

from collections.abc import Iterable
from copy import deepcopy
from pathlib import Path
from typing import Any, TypeVar

import yaml
from pydantic import BaseModel

T = TypeVar("T", bound=BaseModel)


class ValuesFileError(ValueError):
    """A values file is missing, unparseable, or not a mapping."""


def deep_merge_dicts(base: dict[str, Any], override: dict[str, Any]) -> dict[str, Any]:
    """Recursively merge ``override`` into ``base`` without mutating
    either input (values.py:23-38): nested dicts merge key-by-key,
    anything else is replaced by the override value."""

    def _merge(dst: dict[str, Any], src: dict[str, Any]) -> dict[str, Any]:
        merged = deepcopy(dst)
        for key, value in src.items():
            if key not in merged:
                merged[key] = value
                continue
            if isinstance(merged[key], dict) and isinstance(value, dict):
                merged[key] = _merge(merged[key], value)
            else:
                merged[key] = value
        return merged

    return _merge(base, override)


def _load_values_file(path: Path) -> dict[str, Any]:
    if not path.exists():
        raise ValuesFileError(f"Values file '{path}' does not exist.")
    try:
        with path.open("r", encoding="utf-8") as handle:
            data = yaml.safe_load(handle) or {}
    except yaml.YAMLError as exc:
        raise ValuesFileError(f"Failed to parse YAML in '{path}': {exc}") from exc
    if not isinstance(data, dict):
        raise ValuesFileError(f"Values file '{path}' must start with a mapping.")
    return data


def load_values(files: Iterable[Path | str], model: type[T]) -> T:
    """Load and deep-merge YAML values files into ``model``
    (values.py:55-69); an empty file list yields the model defaults."""
    merged: dict[str, Any] = {}
    for file_path in files:
        merged = deep_merge_dicts(merged, _load_values_file(Path(file_path)))
    return model.model_validate(merged or {})
