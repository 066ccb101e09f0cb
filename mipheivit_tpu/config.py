"""Hydra/OmegaConf-compatible config system (dependency-free).

The reference drives everything through a Hydra config tree
(`configs/config.yaml` composition root with groups ``data``/``train``/``model``,
``# @package _global_`` preset files under ``default_configs/`` and
``experiments/``, and dotted CLI overrides — reference: run.py:16-42,
configs/config.yaml:1-41, README.md:193-197). Hydra is not available in this
environment, and the contract that actually matters downstream is just:

  * a YAML tree with the same group layout,
  * ``+group=name`` / ``key.path=value`` / ``++key.path=value`` overrides,
  * the resolved config saved as ``config.yaml`` beside checkpoints and
    re-loaded verbatim by test/inference/eval drivers
    (reference: src/train.py:175-176, run_inference.py:26).

This module implements exactly that contract in ~200 lines.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Union

import yaml

_CONFIG_ROOT = Path(__file__).parent / "configs"


class Config(dict):
    """A dict with attribute access and deep merge, like a tiny OmegaConf."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, Config):
            return Config({k: Config._wrap(v) for k, v in value.items()})
        if isinstance(value, list):
            return [Config._wrap(v) for v in value]
        return value

    @classmethod
    def create(cls, data: Optional[Dict[str, Any]] = None) -> "Config":
        return cls._wrap(dict(data or {}))

    def merge(self, other: Dict[str, Any]) -> "Config":
        """Deep-merge ``other`` into self (in place); other wins."""
        _deep_merge(self, other)
        return self

    def select(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_dotted(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node: Dict[str, Any] = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = Config._wrap(value)

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(value: Any) -> Any:
            if isinstance(value, dict):
                return {k: unwrap(v) for k, v in value.items()}
            if isinstance(value, list):
                return [unwrap(v) for v in value]
            return value

        return unwrap(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def _deep_merge(dst: Dict[str, Any], src: Dict[str, Any]) -> Dict[str, Any]:
    for key, value in src.items():
        if key in dst and isinstance(dst[key], dict) and isinstance(value, dict):
            _deep_merge(dst[key], value)
        else:
            dst[key] = Config._wrap(copy.deepcopy(value))
    return dst


def load_yaml(path: Union[str, Path]) -> Config:
    with open(path, "r") as f:
        data = yaml.safe_load(f) or {}
    return Config.create(data)


def save_config(cfg: Config, path: Union[str, Path]) -> None:
    with open(path, "w") as f:
        f.write(cfg.to_yaml())


def _apply_group_file(
    cfg: Config, group_dir: Path, name: str, config_root: Path
) -> None:
    """Merge one group config file.

    Files may carry a Hydra ``defaults`` list with ``override /group: name``
    entries (reference: configs/default_configs/miphei-vit.yaml:2-4); those are
    resolved first, then the body is merged. ``# @package _global_`` files
    (``default_configs``/``experiments``) merge at the root; plain group files
    merge under their group key.
    """
    path = group_dir / f"{name}.yaml"
    if not path.exists():
        raise FileNotFoundError(f"No config '{name}' in group '{group_dir.name}' ({path})")
    text = path.read_text()
    body = Config.create(yaml.safe_load(text) or {})
    at_global = "@package _global_" in text or group_dir.name in (
        "default_configs",
        "experiments",
    ) or group_dir.parent.name == "experiments"

    defaults = body.pop("defaults", None)
    if defaults:
        for entry in defaults:
            if isinstance(entry, dict):
                for key, val in entry.items():
                    key = str(key)
                    if key.startswith("override "):
                        key = key[len("override "):]
                    key = key.strip().lstrip("/")
                    if key == "_self_" or val is None:
                        continue
                    _apply_group_file(cfg, config_root / key, str(val), config_root)
            # bare "_self_" strings are ordering hints; body merges below anyway.

    if at_global:
        _deep_merge(cfg, body)
    else:
        node = cfg.setdefault(group_dir.name, Config())
        _deep_merge(node, body)


def _parse_value(text: str) -> Any:
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def compose(
    overrides: Iterable[str] = (),
    config_root: Union[str, Path, None] = None,
    config_name: str = "config",
) -> Config:
    """Compose the config like ``hydra.main`` would.

    Supported override forms (reference README.md:180-197):
      * ``+default_configs=miphei-vit``  — merge a preset/experiment group file
      * ``+experiments/gan=full_gan``    — nested groups
      * ``data=hemit``                   — swap a defaults group
      * ``train.epochs=100`` / ``++train.epochs=100`` — dotted value overrides
    """
    config_root = Path(config_root) if config_root else _CONFIG_ROOT
    root_file = config_root / f"{config_name}.yaml"
    raw = yaml.safe_load(root_file.read_text()) or {}
    defaults = raw.pop("defaults", [])
    cfg = Config.create({})

    group_overrides: Dict[str, str] = {}
    file_merges: List[tuple] = []
    value_overrides: List[tuple] = []
    for ov in overrides:
        ov = ov.strip()
        if not ov:
            continue
        plus = ov.startswith("+") and not ov.startswith("++")
        force = ov.startswith("++")
        body_txt = ov.lstrip("+")
        if "=" not in body_txt:
            raise ValueError(f"Malformed override: {ov!r}")
        key, val = body_txt.split("=", 1)
        if plus and (config_root / key).is_dir():
            file_merges.append((key, val))
        elif not plus and not force and (config_root / key).is_dir() and "." not in key:
            group_overrides[key] = val
        else:
            value_overrides.append((key, val))

    for entry in defaults:
        if entry == "_self_":
            _deep_merge(cfg, Config.create(raw))
            continue
        if isinstance(entry, dict):
            for group, name in entry.items():
                if name is None:
                    continue
                name = group_overrides.pop(str(group), str(name))
                _apply_group_file(cfg, config_root / str(group), name, config_root)
    if "_self_" not in defaults:
        _deep_merge(cfg, Config.create(raw))
    for group, name in group_overrides.items():
        _apply_group_file(cfg, config_root / group, name, config_root)
    for group, name in file_merges:
        _apply_group_file(cfg, config_root / group, name, config_root)
    for key, val in value_overrides:
        cfg.set_dotted(key, _parse_value(val))
    return cfg


def _expand_sweep(val: str, group_dir: Optional[Path]) -> Optional[List[str]]:
    """Sweep variants for one override value, or None if not a sweep.

    Supports Hydra's multirun syntaxes (reference README.md:193-197):
      * ``glob(*)`` / ``glob(uni*)`` on a config-group override — every yaml
        in the group dir whose stem matches the pattern;
      * comma lists (``a,b,c``) on group or dotted value overrides.
    """
    import re

    m = re.fullmatch(r"glob\((.*)\)", val.strip())
    if m:
        if group_dir is None:
            raise ValueError(
                f"glob() sweep requires a config-group override, got {val!r}")
        pat = m.group(1).strip() or "*"
        names = sorted(p.stem for p in group_dir.glob(pat + ".yaml"))
        if not names:
            raise FileNotFoundError(
                f"glob sweep {val!r} matched nothing in {group_dir}")
        return names
    if "," in val and not val.lstrip().startswith("["):
        return [v.strip() for v in val.split(",") if v.strip()]
    return None


def compose_multirun(
    overrides: Iterable[str] = (),
    config_root: Union[str, Path, None] = None,
    config_name: str = "config",
) -> List[tuple]:
    """Expand ``-m`` sweep overrides into ``[(job_name, cfg), ...]``.

    The cartesian product over every sweep override is composed
    sequentially, mirroring Hydra's basic sweeper
    (reference: README.md:193-197,
    ``python run.py -m +experiments/foundation_models='glob(*)'``).
    Non-sweep invocations return a single job named "0".
    """
    import itertools

    root = Path(config_root) if config_root else _CONFIG_ROOT
    slots: List[Union[str, List[tuple]]] = []
    has_sweep = False
    for ov in overrides:
        s = ov.strip()
        if not s:
            continue
        body = s.lstrip("+")
        prefix = s[: len(s) - len(body)]
        if "=" in body:
            key, val = body.split("=", 1)
            gd = root / key
            variants = _expand_sweep(val, gd if gd.is_dir() else None)
            if variants:
                has_sweep = True
                slots.append([(f"{prefix}{key}={v}", v) for v in variants])
                continue
        slots.append(s)
    if not has_sweep:
        return [("0", compose(list(overrides), config_root, config_name))]
    sweep_axes = [slot for slot in slots if isinstance(slot, list)]
    jobs = []
    for combo in itertools.product(*sweep_axes):
        it = iter(combo)
        ovs, names = [], []
        for slot in slots:
            if isinstance(slot, list):
                ov, name = next(it)
                ovs.append(ov)
                names.append(str(name))
            else:
                ovs.append(slot)
        jobs.append(("_".join(names), compose(ovs, config_root, config_name)))
    return jobs
