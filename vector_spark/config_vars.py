"""Config environment-variable interpolation + secret resolution.

Mirrors the reference's config loading pipeline:

- ``${VAR}`` / ``$VAR`` / ``${VAR:-default}`` / ``${VAR-default}`` /
  ``${VAR:?err}`` / ``${VAR?err}`` / ``$$`` escape —
  /root/reference/src/config/vars.rs:12-80 (same regex shape, same
  flag semantics: ``:-``/``:?`` treat empty-string values as unset,
  ``-``/``?`` only missing ones; values containing newlines are
  rejected; all errors are collected and reported together).
- ``SECRET[backend.key]`` placeholders resolved against backends
  declared in the config's ``secret:`` section —
  /root/reference/src/config/loading/secret.rs:27-35 (placeholder
  regex), :60-99 (retrieve per backend, key namespaced as
  ``backend.key``), src/config/secret.rs (backend trait).  Env vars
  are interpolated FIRST, then secret placeholders are collected and
  resolved (secret.rs `prepare`), so a secret value containing ``$``
  is never re-interpolated.

Backends (the daemon reference ships exec/aws/file backends; the batch
engine keeps the two with pure-batch semantics):

- ``file``: JSON object file of key -> secret value.
- ``static``: inline ``secrets:`` mapping (the unit-test backend,
  mirroring secret_backend_example.rs).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

__all__ = [
    "ConfigVarError",
    "interpolate",
    "collect_secret_keys",
    "resolve_secrets",
    "interpolate_secrets",
    "load_config_str",
    "load_config_file",
]


class ConfigVarError(ValueError):
    """All interpolation errors for a config, reported together."""

    def __init__(self, errors: list[str]):
        self.errors = errors
        super().__init__("; ".join(errors))


# vars.rs:12-20 — $$ escape, bare $VAR, ${VAR[(:)-?]default-or-err}.
# [[:word:].] == [\w.]: shell-style names plus '.' for Java-properties
# style variables.
_VAR_RE = re.compile(
    r"\$\$|\$([\w.]+)|\$\{([\w.]+)(?:(:?-|:?\?)([^}]*))?\}"
)

# secret.rs:35 — SECRET[backend.key]; backend is word/-, key may
# contain dots and slashes.
_SECRET_RE = re.compile(r"SECRET\[([\w\-]+)\.([\w.\-/]+)\]")


def interpolate(text: str, env: dict[str, str] | None = None) -> str:
    """Substitute ``$VAR``/``${VAR...}`` from ``env`` (default:
    ``os.environ``), with the reference's flag semantics; raises
    :class:`ConfigVarError` listing every problem at once."""
    vars_ = dict(os.environ) if env is None else env
    errors: list[str] = []

    def lookup(name: str) -> str | None:
        val = vars_.get(name)
        if val is not None and ("\n" in val or "\r" in val):
            errors.append(
                f"Environment variable contains newline character. name = {name!r}"
            )
            return None
        return val

    def sub(m: re.Match) -> str:
        if m.group(0) == "$$":
            return "$"
        name = m.group(1) or m.group(2)
        flags = m.group(3) or ""
        def_or_err = m.group(4) or ""
        val = lookup(name)
        if flags == ":-":
            return val if val else def_or_err
        if flags == "-":
            return val if val is not None else def_or_err
        if flags == ":?":
            if val:
                return val
            errors.append(
                "Non-empty environment variable required in config. "
                f"name = {name!r}, error = {def_or_err!r}"
            )
            return ""
        if flags == "?":
            if val is not None:
                return val
            errors.append(
                "Missing environment variable required in config. "
                f"name = {name!r}, error = {def_or_err!r}"
            )
            return ""
        if val is None:
            errors.append(
                f"Missing environment variable in config. name = {name!r}"
            )
            return ""
        return val

    out = _VAR_RE.sub(sub, text)
    if errors:
        raise ConfigVarError(errors)
    return out


def collect_secret_keys(text: str) -> dict[str, set[str]]:
    """backend -> set of keys referenced by SECRET[backend.key]."""
    keys: dict[str, set[str]] = {}
    for backend, key in _SECRET_RE.findall(text):
        keys.setdefault(backend, set()).add(key)
    return keys


def _retrieve(backend_name: str, cfg: dict, keys: set[str]) -> dict[str, str]:
    typ = cfg.get("type")
    if typ == "file":
        with open(cfg["path"]) as f:
            table = json.load(f)
    elif typ == "static":
        table = cfg.get("secrets", {})
    else:
        raise ConfigVarError(
            [f"Unknown secret backend type {typ!r} for backend {backend_name!r}"]
        )
    missing = sorted(k for k in keys if k not in table)
    if missing:
        raise ConfigVarError(
            [
                f"Backend {backend_name!r} does not provide secret {k!r}"
                for k in missing
            ]
        )
    return {k: str(table[k]) for k in keys}


def resolve_secrets(
    text: str, backends: dict[str, dict]
) -> dict[str, str]:
    """Retrieve every referenced secret: ``backend.key`` -> value
    (secret.rs:60-99: missing backend or key is an error)."""
    wanted = collect_secret_keys(text)
    out: dict[str, str] = {}
    for backend_name, keys in wanted.items():
        if backend_name not in backends:
            raise ConfigVarError(
                [
                    f'Backend "{backend_name}" is required for secret '
                    "retrieval but was not found in config."
                ]
            )
        got = _retrieve(backend_name, backends[backend_name], keys)
        for k, v in got.items():
            if "\n" in v or "\r" in v:
                raise ConfigVarError(
                    [f"Secret contains newline character. key = {backend_name}.{k!r}"]
                )
            out[f"{backend_name}.{k}"] = v
    return out


def interpolate_secrets(text: str, secrets: dict[str, str]) -> str:
    """Replace SECRET[backend.key] placeholders with resolved values."""
    return _SECRET_RE.sub(lambda m: secrets[f"{m.group(1)}.{m.group(2)}"], text)


def load_config_str(
    text: str, *, env: dict[str, str] | None = None, fmt: str = "yaml"
) -> dict[str, Any]:
    """Full config-loading pipeline on a YAML/JSON string:

    1. env-var interpolation (vars.rs),
    2. parse the ``secret:`` section and resolve SECRET[...] keys,
    3. substitute, re-parse, and drop the ``secret:`` section.
    """
    def parse(s: str) -> dict:
        if fmt == "json":
            return json.loads(s)
        import yaml

        return yaml.safe_load(s)

    interpolated = interpolate(text, env)
    cfg = parse(interpolated) or {}
    if collect_secret_keys(interpolated):
        secrets = resolve_secrets(interpolated, cfg.get("secret", {}))
        cfg = parse(interpolate_secrets(interpolated, secrets))
    cfg.pop("secret", None)
    return cfg


def load_config_file(path: str, *, env: dict[str, str] | None = None) -> dict[str, Any]:
    fmt = "json" if path.endswith(".json") else "yaml"
    with open(path) as f:
        return load_config_str(f.read(), env=env, fmt=fmt)
