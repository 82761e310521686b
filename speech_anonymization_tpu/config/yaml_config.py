"""Registry-based YAML object-graph config loader.

HyperPyYAML-equivalent (the reference's L1 config layer, SURVEY.md §2.7):

  * ``!new:<path> {kwargs}``  — instantiate via the registry at load time
  * ``!name:<path> {kwargs}`` — partial/factory (``functools.partial``)
  * ``!ref <key>``            — graph reference to another config node;
    strings containing ``<key>`` substrings interpolate their string value
    (``!ref <output_folder>/save`` — convae.yaml:16)
  * ``!apply:<path> [args]``  — call at load time (e.g. seeding)

plus CLI override parsing (``--key value`` pairs and/or an overrides YAML
string), mirroring sb.parse_arguments (speechbrain_convae_train.py:516).

Differences from HyperPyYAML (deliberate): tags resolve against a registry
instead of arbitrary imports (see registry.py), and ``!ref`` does not
support arithmetic on refs (none of the reference configs use it).
"""

from __future__ import annotations

import copy
import functools
import re
from typing import Any

import yaml


class _Tagged:
    def __init__(self, path: str, payload: Any):
        self.path = path
        self.payload = payload


class _New(_Tagged):
    pass


class _Name(_Tagged):
    pass


class _Apply(_Tagged):
    pass


class _Ref:
    def __init__(self, expr: str):
        self.expr = expr


class _Loader(yaml.SafeLoader):
    pass


def _tag_multi(cls):
    def construct(loader: yaml.Loader, suffix: str, node: yaml.Node):
        if isinstance(node, yaml.MappingNode):
            payload = loader.construct_mapping(node, deep=True)
        elif isinstance(node, yaml.SequenceNode):
            payload = loader.construct_sequence(node, deep=True)
        else:
            scalar = loader.construct_scalar(node)
            payload = None if scalar in ("", None) else scalar
        return cls(suffix, payload)

    return construct


_Loader.add_multi_constructor("!new:", _tag_multi(_New))
_Loader.add_multi_constructor("!name:", _tag_multi(_Name))
_Loader.add_multi_constructor("!apply:", _tag_multi(_Apply))
_Loader.add_constructor(
    "!ref", lambda loader, node: _Ref(loader.construct_scalar(node))
)
# tuples written like (128, 256, 512) in the reference yamls arrive as strings;
# configs here just use lists.

_REF_RE = re.compile(r"<([^<>]+)>")


class ConfigResolver:
    def __init__(self, raw: dict):
        self.raw = raw
        self.resolved: dict[str, Any] = {}
        self._resolving: set[str] = set()

    def resolve_key(self, key: str) -> Any:
        if key in self.resolved:
            return self.resolved[key]
        if key not in self.raw:
            raise KeyError(f"!ref to unknown config key '{key}'")
        if key in self._resolving:
            raise ValueError(f"circular !ref involving '{key}'")
        self._resolving.add(key)
        try:
            value = self.resolve_node(self.raw[key])
        finally:
            self._resolving.discard(key)
        self.resolved[key] = value
        return value

    def resolve_node(self, node: Any) -> Any:
        if isinstance(node, _Ref):
            return self._resolve_ref(node.expr)
        if isinstance(node, _New):
            return self._call(node, instantiate=True)
        if isinstance(node, _Name):
            return self._call(node, instantiate=False)
        if isinstance(node, _Apply):
            return self._call(node, instantiate=True)
        if isinstance(node, dict):
            return {k: self.resolve_node(v) for k, v in node.items()}
        if isinstance(node, list):
            return [self.resolve_node(v) for v in node]
        return node

    def _resolve_ref(self, expr: str) -> Any:
        expr = expr.strip()
        m = _REF_RE.fullmatch(expr)
        if m:
            return self.resolve_key(m.group(1))
        # string interpolation: every <key> replaced by str(resolved)
        def sub(match):
            return str(self.resolve_key(match.group(1)))

        return _REF_RE.sub(sub, expr)

    def _call(self, node: _Tagged, instantiate: bool) -> Any:
        from .registry import resolve_path

        fn = resolve_path(node.path)
        payload = self.resolve_node(node.payload)
        if payload is None:
            return fn() if instantiate else fn
        if isinstance(payload, dict):
            return fn(**payload) if instantiate else functools.partial(fn, **payload)
        if isinstance(payload, list):
            return fn(*payload) if instantiate else functools.partial(fn, *payload)
        return fn(payload) if instantiate else functools.partial(fn, payload)


def _parse_scalar(text: str) -> Any:
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def load_config(path_or_stream, overrides: dict | str | None = None) -> dict:
    """Load a YAML config, apply overrides, resolve the object graph."""
    if hasattr(path_or_stream, "read"):
        raw = yaml.load(path_or_stream, Loader=_Loader)
    else:
        with open(path_or_stream) as f:
            raw = yaml.load(f, Loader=_Loader)
    if overrides:
        if isinstance(overrides, str):
            overrides = yaml.load(overrides, Loader=_Loader) or {}
        for k, v in overrides.items():
            raw[k] = v
    resolver = ConfigResolver(raw)
    return {k: resolver.resolve_key(k) for k in raw}


def parse_arguments(argv: list[str]):
    """Split argv into (config_path, run_opts, overrides).

    ``recipe.py config.yaml --device tpu --model_type endtoend --lr 0.5``
    Known run options (device, eval_only, ...) go to run_opts; everything
    else becomes a config override — mirroring sb.parse_arguments.
    """
    if not argv:
        raise SystemExit("usage: <recipe> <config.yaml> [--key value ...]")
    config_path = argv[0]
    run_opt_keys = {"device", "eval_only", "debug", "seed_override", "progressbar"}
    run_opts: dict[str, Any] = {}
    overrides: dict[str, Any] = {}
    i = 1
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise SystemExit(f"unexpected argument: {arg}")
        key = arg[2:]
        if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
            value = _parse_scalar(argv[i + 1])
            i += 2
        else:
            value = True
            i += 1
        if key in run_opt_keys:
            run_opts[key] = value
        else:
            overrides[key] = value
    return config_path, run_opts, overrides
