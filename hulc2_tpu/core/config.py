"""Config system: group composition + CLI overrides + interpolation.

Replaces the reference's Hydra stack (203 YAMLs under conf/, ``@hydra.main``
entries, ``_target_`` instantiation — reference: hulc2/training.py:30-51,
conf/cfg_low_level.yaml) with a dependency-free, explicitly-Pythonic registry:

- config *groups* are registered dicts: ``register("model/distribution",
  "discrete", {...})``
- composites declare ``"_defaults_": [("model", "calvin_hulc")]`` lists which
  are expanded depth-first like Hydra defaults lists
- CLI-style overrides: ``model.kl_beta=0.1`` (dotted set),
  ``model/distribution=continuous`` (group swap)
- ``${a.b.c}`` string interpolation resolved after composition
- ``instantiate(cfg)`` builds objects from ``_name_`` keys via a factory
  registry (the TPU-native analogue of Hydra ``_target_``)

The resolved config is a plain nested dict (JSON/YAML-serializable); trained
run dirs persist it as ``config.json``, which serves as the serialized model
spec at eval time (mirroring the reference's ``.hydra/config.yaml`` role,
manager_aff_lmp.py:93-110).
"""
from __future__ import annotations

import copy
import json
import re
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

_GROUPS: Dict[str, Dict[str, dict]] = {}
_FACTORIES: Dict[str, Callable] = {}

_INTERP_RE = re.compile(r"^\$\{([a-zA-Z0-9_./]+)\}$")
_INTERP_INLINE_RE = re.compile(r"\$\{([a-zA-Z0-9_./]+)\}")


def register(group: str, name: str, cfg: dict) -> dict:
    """Register option ``name`` of config group ``group``. Returns cfg."""
    _GROUPS.setdefault(group, {})[name] = cfg
    return cfg


def options(group: str) -> List[str]:
    return sorted(_GROUPS.get(group, {}))


def factory(name: str) -> Callable:
    """Decorator: register a constructor under ``name`` for instantiate()."""

    def deco(fn):
        _FACTORIES[name] = fn
        return fn

    return deco


def get_factory(name: str) -> Callable:
    if name not in _FACTORIES:
        raise KeyError(f"no factory registered under {name!r}; known: {sorted(_FACTORIES)}")
    return _FACTORIES[name]


def _get_group_cfg(group: str, name: str) -> dict:
    if name in (None, "none", "null"):
        return None  # type: ignore[return-value]
    try:
        return copy.deepcopy(_GROUPS[group][name])
    except KeyError:
        raise KeyError(
            f"unknown config {group}={name}; known options: {options(group)}"
        ) from None


def _expand_defaults(cfg: dict, path: str = "") -> dict:
    """Depth-first expansion of _defaults_ lists, self-last merge semantics."""
    if not isinstance(cfg, dict):
        return cfg
    defaults = cfg.get("_defaults_", [])
    out: dict = {}
    for entry in defaults:
        group, name = entry
        sub = _get_group_cfg(group, name)
        key = group.split("/")[-1]
        out[key] = _expand_defaults(sub, f"{path}{key}.") if sub is not None else None
    for k, v in cfg.items():
        if k == "_defaults_":
            continue
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            merged = out[k]
            merged.update({kk: vv for kk, vv in _expand_defaults(v).items()})
            out[k] = merged
        else:
            out[k] = _expand_defaults(v) if isinstance(v, dict) else v
    return out


def _parse_value(s: str) -> Any:
    try:
        return json.loads(s)
    except (json.JSONDecodeError, TypeError):
        return s


def _set_path(cfg: dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            node[k] = {}
        node = node[k]
    node[keys[-1]] = value


def _get_path(cfg: dict, dotted: str) -> Any:
    node: Any = cfg
    for k in dotted.split("."):
        node = node[k]
    return node


def apply_overrides(cfg: dict, overrides: Sequence[str]) -> dict:
    """Apply CLI-style overrides in order.

    ``group/sub=option`` swaps a config-group option (placed at the dotted
    path given by the slashes, minus the leading group root if it matches a
    top-level key); ``a.b.c=value`` sets a value (JSON-parsed when possible).
    """
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        key, _, val = ov.partition("=")
        if "/" not in key and "." not in key and key in _GROUPS and val.strip() in _GROUPS[key]:
            # top-level group selection, e.g. ``aff_detection=rn50_clip_pixel``
            _set_path(cfg, key, _expand_defaults(_get_group_cfg(key, val.strip())))
        elif "/" in key:  # group swap
            sub = _get_group_cfg(key, val.strip())
            dotted = key.replace("/", ".")
            # allow both "model/distribution" and "distribution" roots
            parts = dotted.split(".")
            if parts[0] not in cfg and len(parts) > 1:
                dotted = ".".join(parts[1:])
            _set_path(cfg, dotted, _expand_defaults(sub) if sub is not None else None)
        else:
            _set_path(cfg, key, _parse_value(val.strip()))
    return cfg


def resolve_interpolations(cfg: dict) -> dict:
    """Resolve ``${a.b.c}`` references against the root config, to fixpoint."""

    def resolve_node(node: Any, root: dict) -> Any:
        if isinstance(node, dict):
            return {k: resolve_node(v, root) for k, v in node.items()}
        if isinstance(node, list):
            return [resolve_node(v, root) for v in node]
        if isinstance(node, str):
            m = _INTERP_RE.match(node)
            if m:  # full-string interpolation preserves type
                return _get_path(root, m.group(1).replace("/", "."))
            return _INTERP_INLINE_RE.sub(
                lambda mm: str(_get_path(root, mm.group(1).replace("/", "."))), node
            )
        return node

    for _ in range(8):  # chase chained interpolations
        new = resolve_node(cfg, cfg)
        if new == cfg:
            return new
        cfg = new
    raise ValueError("interpolation did not converge (circular reference?)")


def compose(name: str, overrides: Sequence[str] = ()) -> dict:
    """Build the resolved config for top-level composite ``name``."""
    root = _get_group_cfg("root", name)
    cfg = _expand_defaults(root)
    cfg = apply_overrides(cfg, overrides)
    return resolve_interpolations(cfg)


def instantiate(cfg: Optional[dict], **kwargs) -> Any:
    """Construct the object described by ``cfg`` via its ``_name_`` factory.

    Non-recursive by default (like the reference's ``_recursive_: false``
    composite roots): nested dicts are passed through for the factory to
    handle. Extra kwargs override/augment config entries.
    """
    if cfg is None:
        return None
    if "_name_" not in cfg:
        raise ValueError(f"cannot instantiate config without _name_: {sorted(cfg)}")
    fn = get_factory(cfg["_name_"])
    args = {k: v for k, v in cfg.items() if k != "_name_"}
    args.update(kwargs)
    return fn(**args)


def save_config(cfg: dict, path: Union[str, Path]) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(cfg, indent=2, default=str))


def load_config(path: Union[str, Path]) -> dict:
    return json.loads(Path(path).read_text())
