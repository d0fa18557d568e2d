"""Config system: YAML base configs + named-config composition + CLI overrides.

Reproduces the sacred experiment semantics the reference relies on
(/root/reference/src/train.py:23-35, track.py:24-26): a base YAML, named
configs that can be composed on the command line
(`train.py with deformable tracking mot17 lr=1e-4`), dotted-key overrides,
and a resolved-config dump to the output dir for reproducibility
(/root/reference/src/train.py:60-62).

No sacred dependency — a small, deterministic loader on top of PyYAML.
"""
from __future__ import annotations

import copy
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, List, Optional, Sequence

import yaml

CFG_DIR = Path(__file__).resolve().parent.parent / "cfgs"


def _deep_update(base: Dict[str, Any], upd: Dict[str, Any]) -> Dict[str, Any]:
    for k, v in upd.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = copy.deepcopy(v)
    return base


def _parse_value(text: str) -> Any:
    """Parse a CLI override value: int, float ('1e-4' included — YAML 1.1
    would keep it a string), then YAML scalar rules (true/null/lists)."""
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        pass
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def _set_dotted(cfg: Dict[str, Any], key: str, value: Any) -> None:
    parts = key.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
        if not isinstance(node, dict):
            raise KeyError(f"cannot set {key}: {p} is not a mapping")
    node[parts[-1]] = value


def load_config(base: str = "train.yaml",
                named_configs: Sequence[str] = (),
                overrides: Optional[Dict[str, Any]] = None,
                cfg_dir: Optional[Path] = None) -> Dict[str, Any]:
    """Load base YAML, apply named configs in order, then dotted overrides."""
    cfg_dir = Path(cfg_dir) if cfg_dir else CFG_DIR
    with open(cfg_dir / base) as f:
        cfg = yaml.safe_load(f) or {}
    for name in named_configs:
        path = cfg_dir / f"{base.split('.')[0]}_{name}.yaml"
        if not path.exists():
            path = cfg_dir / f"{name}.yaml"
        if not path.exists():
            raise FileNotFoundError(f"named config '{name}' not found in {cfg_dir}")
        with open(path) as f:
            _deep_update(cfg, yaml.safe_load(f) or {})
    for key, value in (overrides or {}).items():
        _set_dotted(cfg, key, value)
    return cfg


def parse_cli(argv: Sequence[str], base: str = "train.yaml",
              cfg_dir: Optional[Path] = None) -> Dict[str, Any]:
    """Parse `with name1 name2 key=value ...` CLI syntax (sacred-style)."""
    args = list(argv)
    if args and args[0] == "with":
        args = args[1:]
    named: List[str] = []
    overrides: Dict[str, Any] = {}
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = _parse_value(v)
        else:
            named.append(a)
    return load_config(base, named, overrides, cfg_dir)


def dump_config(cfg: Dict[str, Any], path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def nested_namespace(cfg: Any) -> Any:
    """dict -> nested SimpleNamespace (parity with util/misc.py:574-588)."""
    if isinstance(cfg, dict):
        ns = SimpleNamespace()
        for k, v in cfg.items():
            setattr(ns, k, nested_namespace(v))
        return ns
    if isinstance(cfg, list):
        return [nested_namespace(v) for v in cfg]
    return cfg


def namespace_to_dict(ns: Any) -> Any:
    if isinstance(ns, SimpleNamespace):
        return {k: namespace_to_dict(v) for k, v in vars(ns).items()}
    if isinstance(ns, list):
        return [namespace_to_dict(v) for v in ns]
    return ns
