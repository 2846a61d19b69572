"""Config-file layer for the recipe dataclasses.

The reference has no config system: every tunable is a module-level
constant edited in-source (SURVEY §5.6; train_x3d_kinetics_multigrid.py:
40-67,110-123).  Here the recipes are real dataclasses already; this
module adds file round-tripping so runs are reproducible artifacts:

    python -m ...kinetics_multigrid --config run.json --synthetic
    python -m ...kinetics_multigrid --tiny --dump-config resolved.json

Precedence (applied by the recipe CLIs): dataclass defaults < flag
presets (``--tiny``) < config file < explicit CLI flags.  JSON is the
format (stdlib-only, and the
reference's own annotation format); lists coerce to tuples where the
dataclass field is a tuple, and unknown keys fail loudly with the list
of valid fields.
"""

import dataclasses
import json
import typing
from typing import Any, Dict


def _tuplify(v):
    """Recursively convert lists to tuples (JSON has no tuple type)."""
    if isinstance(v, list):
        return tuple(_tuplify(x) for x in v)
    if isinstance(v, dict):
        return {k: _tuplify(x) for k, x in v.items()}
    return v


def _coerce(cls, data: Dict[str, Any]) -> Dict[str, Any]:
    """Validate keys against ``cls``'s fields and coerce JSON types."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = sorted(set(data) - set(fields))
    if unknown:
        raise ValueError(
            f"unknown {cls.__name__} field(s) {unknown}; valid fields: "
            f"{sorted(fields)}")
    out = {}
    for k, v in data.items():
        origin = typing.get_origin(fields[k].type) if not isinstance(
            fields[k].type, str) else None
        # Tuple-typed fields (long_cycle, ...) and the nested
        # model_overrides dict (X3DConfig kwargs are tuples) get tuples;
        # annotations may be strings under `from __future__ import
        # annotations`, so fall back to name matching.
        ann = str(fields[k].type)
        if isinstance(v, list) and (origin is tuple or "Tuple" in ann
                                    or "tuple" in ann):
            v = _tuplify(v)
        elif k == "model_overrides" and isinstance(v, dict):
            v = _tuplify(v)
        out[k] = v
    return out


def recipe_to_dict(recipe) -> Dict[str, Any]:
    """Dataclass -> JSON-ready dict (tuples become lists on dump)."""
    return dataclasses.asdict(recipe)


def save_recipe(recipe, path: str) -> None:
    """Write the resolved recipe as pretty JSON (``-`` = stdout)."""
    text = json.dumps(recipe_to_dict(recipe), indent=2, sort_keys=True)
    if path == "-":
        print(text)
    else:
        with open(path, "w") as f:
            f.write(text + "\n")


def load_recipe_dict(path: str, cls) -> Dict[str, Any]:
    """Read a JSON config and validate it against recipe class ``cls``."""
    with open(path) as f:
        data = json.load(f)
    if not isinstance(data, dict):
        raise ValueError(f"{path}: expected a JSON object of "
                         f"{cls.__name__} fields, got {type(data).__name__}")
    return _coerce(cls, data)


# Sentinel for "flag not given": distinguishable from an explicit None,
# so Optional recipe fields could in principle be reset to None by an
# explicit override (None itself is also treated as unset for
# backward-compatible argparse defaults).
UNSET = object()


def make_recipe(cls, config_path=None, defaults=None, **overrides):
    """Construct ``cls`` with dataclass defaults < ``defaults`` < config
    file < explicit ``overrides``.

    ``defaults`` is the below-config tier for flag *presets* (e.g.
    ``--tiny`` geometry): a config file still wins over them.
    ``overrides`` with value :data:`UNSET` or ``None`` are dropped (the
    CLIs pass argparse defaults of ``None`` for flags the user did not
    set).
    """
    base: Dict[str, Any] = {}
    if defaults:
        base.update(_coerce(cls, {k: v for k, v in defaults.items()
                                  if v is not None and v is not UNSET}))
    if config_path:
        base.update(load_recipe_dict(config_path, cls))
    base.update(_coerce(cls, {k: v for k, v in overrides.items()
                              if v is not None and v is not UNSET}))
    return cls(**base)
