"""Env-var interpolation + secret resolution for configs — semantics
mirror /root/reference/src/config/vars.rs (flag behaviors, $$ escape,
newline rejection, collected errors) and
src/config/loading/secret.rs (SECRET[backend.key] placeholders)."""

from __future__ import annotations

import json

import pytest

from vector_spark.config import build_topology
from vector_spark.config_vars import (
    ConfigVarError,
    collect_secret_keys,
    interpolate,
    load_config_str,
    resolve_secrets,
)

ENV = {"HOST": "web01", "EMPTY": "", "JAVA.STYLE": "jv", "BAD": "a\nb"}


def test_basic_forms():
    assert interpolate("${HOST}", ENV) == "web01"
    assert interpolate("$HOST", ENV) == "web01"
    assert interpolate("a-${HOST}-z $HOST", ENV) == "a-web01-z web01"
    assert interpolate("${JAVA.STYLE}", ENV) == "jv"


def test_dollar_escape():
    assert interpolate("cost: $$5 and $$HOST", ENV) == "cost: $5 and $HOST"


def test_default_flags():
    # ':-' treats empty as unset; '-' only missing
    assert interpolate("${EMPTY:-fallback}", ENV) == "fallback"
    assert interpolate("${EMPTY-fallback}", ENV) == ""
    assert interpolate("${MISSING:-fallback}", ENV) == "fallback"
    assert interpolate("${MISSING-fallback}", ENV) == "fallback"
    assert interpolate("${HOST:-fallback}", ENV) == "web01"


def test_required_flags():
    assert interpolate("${HOST:?need host}", ENV) == "web01"
    with pytest.raises(ConfigVarError, match="Non-empty environment variable"):
        interpolate("${EMPTY:?need host}", ENV)
    with pytest.raises(ConfigVarError, match="Missing environment variable required"):
        interpolate("${MISSING?who}", ENV)
    assert interpolate("${EMPTY?present-is-enough}", ENV) == ""


def test_missing_plain_is_error_and_errors_collect():
    with pytest.raises(ConfigVarError) as e:
        interpolate("${MISSING} $ALSO_MISSING ${BAD}", ENV)
    # BAD yields two errors (newline + treated-as-missing), exactly
    # like the reference's interpolate()
    assert len(e.value.errors) == 4


def test_newline_value_rejected():
    with pytest.raises(ConfigVarError, match="newline"):
        interpolate("${BAD}", ENV)


def test_secret_collection_and_resolution(tmp_path):
    text = "key: SECRET[vault.db/password] other: SECRET[vault.api_key]"
    assert collect_secret_keys(text) == {"vault": {"db/password", "api_key"}}
    p = tmp_path / "secrets.json"
    p.write_text(json.dumps({"db/password": "pw1", "api_key": "ak2"}))
    secrets = resolve_secrets(text, {"vault": {"type": "file", "path": str(p)}})
    assert secrets == {"vault.db/password": "pw1", "vault.api_key": "ak2"}


def test_secret_missing_backend_or_key():
    with pytest.raises(ConfigVarError, match='Backend "vault" is required'):
        resolve_secrets("SECRET[vault.k]", {})
    with pytest.raises(ConfigVarError, match="does not provide secret"):
        resolve_secrets(
            "SECRET[s.k]", {"s": {"type": "static", "secrets": {}}}
        )


def test_load_config_str_full_pipeline():
    text = """
secret:
  store:
    type: static
    secrets:
      token: tok-123
sinks:
  out:
    type: parquet
    path: /tmp/${HOST}/out
    token: SECRET[store.token]
"""
    cfg = load_config_str(text, env=ENV)
    assert cfg["sinks"]["out"]["path"] == "/tmp/web01/out"
    assert cfg["sinks"]["out"]["token"] == "tok-123"
    assert "secret" not in cfg  # backend defs don't leak downstream


def test_interpolated_yaml_builds_topology(spark):
    """End-to-end: a YAML config using ${VAR} for the source size and a
    route condition compiles into a runnable topology."""
    text = """
sources:
  in:
    type: transcripts
    n_turns: ${N_TURNS:-6000}
transforms:
  parsed:
    type: remap
    inputs: [in]
  routed:
    type: route
    inputs: [parsed]
    routes:
      errors: "level = '${LEVEL:?level required}'"
"""
    cfg = load_config_str(text, env={"N_TURNS": "6000", "LEVEL": "error"})
    # YAML leaves ${...} results as strings; source builder wants int
    cfg["sources"]["in"]["n_turns"] = int(cfg["sources"]["in"]["n_turns"])
    res = build_topology(spark, cfg)
    errors = res["routed"]["errors"]
    assert errors.filter("level <> 'error'").count() == 0
    assert errors.count() > 0

    with pytest.raises(ConfigVarError, match="level required"):
        load_config_str(text, env={"N_TURNS": "10"})
