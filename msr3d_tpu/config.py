"""Config system: YAML + ``${a.b.c}`` interpolation + dotlist CLI overrides.

Drop-in replacement for the Hydra/OmegaConf layer the reference uses
(``/root/reference/run.py:12-59``, ``/root/reference/configs/msr3d.yaml``),
so the same YAML files (interpolation-heavy, e.g. ``msr3d.yaml:37,64-69``)
run unchanged without the omegaconf dependency.

Public API:
    cfg = load_config(path, overrides=["a.b=3", "c=foo"])
    cfg.model.name            # attribute access
    cfg.get('key', default)   # dict-style access with default
    cfg2dict(cfg)             # plain-dict container (common/type_utils.py:6-7)
"""

from __future__ import annotations

import copy
import json
import re
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


class _YamlLoader(yaml.SafeLoader):
    """SafeLoader that parses ``3e-5``-style floats (YAML 1.2 semantics).

    PyYAML's YAML 1.1 resolver requires a dot in scientific notation; the
    reference configs write ``lr: 3e-5`` (configs/msr3d.yaml:45), which
    OmegaConf parses as float. Match that.
    """


_YamlLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+]?[0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def yaml_load(stream) -> Any:
    return yaml.load(stream, Loader=_YamlLoader)


class Config:
    """Attribute-accessible nested config with lazy ``${...}`` interpolation.

    Wraps a plain dict. Interpolations are resolved against the *root* dict
    at access time, so forward references and override-then-resolve both work.
    """

    __slots__ = ("_data", "_root")

    def __init__(self, data: Dict[str, Any], root: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", data)
        object.__setattr__(self, "_root", root if root is not None else data)

    # -- resolution ---------------------------------------------------------

    def _resolve_path(self, dotted: str) -> Any:
        node: Any = self._root
        for part in dotted.split("."):
            if isinstance(node, dict):
                if part not in node:
                    raise KeyError(f"interpolation key not found: ${{{dotted}}}")
                node = node[part]
            elif isinstance(node, (list, tuple)):
                node = node[int(part)]
            else:
                raise KeyError(f"cannot descend into {type(node)} at ${{{dotted}}}")
        return self._resolve_value(node)

    def _resolve_value(self, v: Any) -> Any:
        if isinstance(v, str):
            m = _INTERP_RE.fullmatch(v)
            if m:  # whole-string interpolation: preserve referenced type
                return self._resolve_path(m.group(1))
            if "${" in v:  # embedded interpolation: string substitution
                return _INTERP_RE.sub(lambda m: str(self._resolve_path(m.group(1))), v)
            return v
        if isinstance(v, dict):
            return Config(v, self._root)
        if isinstance(v, list):
            return [self._resolve_value(x) for x in v]
        return v

    # -- access -------------------------------------------------------------

    def __getattr__(self, key: str) -> Any:
        data = object.__getattribute__(self, "_data")
        if key in data:
            return self._resolve_value(data[key])
        raise AttributeError(f"config has no key {key!r}; available: {list(data)}")

    def __getitem__(self, key: str) -> Any:
        return self.__getattr__(key)

    def __setattr__(self, key: str, value: Any) -> None:
        if isinstance(value, Config):
            value = value.to_dict()
        self._data[key] = value

    __setitem__ = __setattr__

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self):
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __bool__(self) -> bool:
        return bool(self._data)

    def __eq__(self, other) -> bool:
        if isinstance(other, Config):
            return self.to_dict() == other.to_dict()
        if isinstance(other, dict):
            return self.to_dict() == other
        return NotImplemented

    def get(self, key: str, default: Any = None) -> Any:
        if key in self._data:
            return self._resolve_value(self._data[key])
        return default

    def keys(self):
        return self._data.keys()

    def values(self):
        return [self._resolve_value(v) for v in self._data.values()]

    def items(self):
        return [(k, self._resolve_value(v)) for k, v in self._data.items()]

    def setdefault(self, key: str, default: Any = None) -> Any:
        if key not in self._data:
            self._data[key] = default
        return self._resolve_value(self._data[key])

    def to_dict(self) -> Dict[str, Any]:
        """Fully-resolved plain-dict container."""

        def conv(v: Any) -> Any:
            if isinstance(v, Config):
                return {k: conv(val) for k, val in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return {k: conv(self._resolve_value(v)) for k, v in self._data.items()}

    def __repr__(self) -> str:
        return f"Config({json.dumps(self.to_dict(), indent=2, default=str)})"


def _parse_scalar(text: str) -> Any:
    """Parse an override RHS with YAML scalar rules ('3'→int, 'true'→bool, ...)."""
    try:
        return yaml_load(text)
    except yaml.YAMLError:
        return text


def apply_overrides(data: Dict[str, Any], overrides: List[str]) -> None:
    """Apply Hydra-style ``key.path=value`` dotlist overrides in place."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, _, raw = ov.partition("=")
        parts = key.strip().split(".")
        node = data
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"cannot override through non-dict at {p!r} in {key!r}")
        node[parts[-1]] = _parse_scalar(raw)


def load_config(path: str | Path, overrides: Optional[List[str]] = None) -> Config:
    with open(path) as f:
        data = yaml_load(f) or {}
    if overrides:
        apply_overrides(data, overrides)
    return Config(data)


def config_from_dict(data: Dict[str, Any]) -> Config:
    return Config(copy.deepcopy(data))


def cfg2dict(cfg: Any) -> Dict[str, Any]:
    """Resolve a Config (or pass through a dict) into a plain container."""
    if isinstance(cfg, Config):
        return cfg.to_dict()
    return cfg


def save_config(cfg: Config, path: str | Path) -> None:
    """Save the fully-resolved config snapshot (run.py:55 semantics)."""
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
