"""Helm-like values-file loading for backend artifact generation.

Behavioral parity with the reference's values machinery
(wurzel/executors/backend/values.py): several YAML files merge
left-to-right — later files win, nested mappings merge key-by-key —
and the result validates into a typed pydantic config.
:class:`ValuesFileError` marks a missing file, unparseable YAML, or a
document that is not a mapping.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from pathlib import Path
from typing import Any, TypeVar

import yaml
from pydantic import BaseModel

T = TypeVar("T", bound=BaseModel)


class ValuesFileError(ValueError):
    """A values file is missing, unparseable, or not a mapping."""


def deep_merge_dicts(base: Mapping[str, Any], override: Mapping[str, Any]) -> dict[str, Any]:
    """Merge ``override`` into ``base`` recursively, returning a new
    dict: nested mappings combine key-by-key, any other value is
    replaced by the override. Neither input is mutated."""
    out: dict[str, Any] = dict(base)
    for key, value in override.items():
        if isinstance(out.get(key), dict) and isinstance(value, dict):
            out[key] = deep_merge_dicts(out[key], value)
        else:
            out[key] = value
    return out


def _read_mapping(path: Path) -> dict[str, Any]:
    if not path.exists():
        raise ValuesFileError(f"Values file '{path}' does not exist.")
    try:
        data = yaml.safe_load(path.read_text(encoding="utf-8"))
    except yaml.YAMLError as exc:
        raise ValuesFileError(f"Failed to parse YAML in '{path}': {exc}") from exc
    if data is None:
        return {}
    if not isinstance(data, dict):
        raise ValuesFileError(f"Values file '{path}' must start with a mapping.")
    return data


def load_values(files: Iterable[Path | str], model: type[T]) -> T:
    """Deep-merge the YAML ``files`` in order and validate the result
    into ``model``; no files (or all-empty files) yield the model's
    defaults."""
    merged: dict[str, Any] = {}
    for f in files:
        merged = deep_merge_dicts(merged, _read_mapping(Path(f)))
    return model.model_validate(merged)
