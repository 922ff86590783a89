"""Config-driven topology — the Vector-config-style declarative DAG,
mirroring the reference's behavior tests
(/root/reference/tests/behavior/transforms/route.yaml:25-66 style
assertions: per-port extraction + clone-per-match + _unmatched)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vector_spark.config import ConfigError, build_topology, run_topology

OUT = "/tmp/vector_spark_test_topology"


@pytest.fixture
def outdir():
    shutil.rmtree(OUT, ignore_errors=True)
    yield OUT
    shutil.rmtree(OUT, ignore_errors=True)


BASE = {
    "sources": {"in": {"type": "transcripts", "n_turns": 6000}},
    "transforms": {
        "parsed": {"type": "remap", "inputs": ["in"]},
        "enriched": {
            "type": "enrich", "inputs": ["parsed"],
            "table": "tool_lookup", "keys": ["tool", "role"],
        },
        "routed": {
            "type": "route", "inputs": ["enriched"],
            "routes": {
                "errors": "level = 'error' OR http_status >= 500",
                "tools": "role = 'tool' AND tool <> 'none'",
            },
        },
        "error_agg": {
            "type": "aggregate", "inputs": ["routed.errors"],
            "keys": ["role"], "specs": {"n": ["count", "*"]},
            "interval_secs": 3600,
        },
    },
}


def test_route_ports_and_clone_per_match(spark):
    res = build_topology(spark, BASE)
    parsed = res["parsed"]
    errors = res["routed"]["errors"]
    tools = res["routed"]["tools"]
    unmatched = res["routed"]["_unmatched"]
    n_parsed = parsed.count()
    # non-exclusive: clone-per-match means port counts can exceed input
    assert errors.count() + tools.count() + unmatched.count() >= n_parsed
    # route equality per port
    assert errors.exceptAll(
        res["enriched"].filter("level = 'error' OR http_status >= 500")
    ).count() == 0
    # dropped port of remap carries the garbage rows
    dropped = res["parsed.dropped"]
    assert dropped.filter(~F.col("text").startswith("~~#")).count() == 0
    assert dropped.count() + n_parsed == 6000


def test_port_addressing_errors(spark):
    bad = {
        "sources": {"in": {"type": "transcripts", "n_turns": 1000}},
        "transforms": {
            "routed": {"type": "route", "inputs": ["in"],
                       "routes": {"a": "turn_idx > 5"}},
            "agg": {"type": "aggregate", "inputs": ["routed"],
                    "keys": [], "specs": {"n": ["count", "*"]}},
        },
    }
    with pytest.raises(ConfigError, match="has ports"):
        build_topology(spark, bad)
    bad2 = dict(BASE, transforms={
        "x": {"type": "filter", "inputs": ["nonexistent"], "condition": "1=1"}
    })
    with pytest.raises(ConfigError, match="unknown input"):
        build_topology(spark, bad2)


def test_cycle_detection(spark):
    cfg = {
        "sources": {"in": {"type": "transcripts", "n_turns": 1000}},
        "transforms": {
            "a": {"type": "filter", "inputs": ["b"], "condition": "1=1"},
            "b": {"type": "filter", "inputs": ["a"], "condition": "1=1"},
        },
    }
    with pytest.raises(ConfigError, match="cycle"):
        build_topology(spark, cfg)


def test_end_to_end_run_with_sinks(spark, outdir):
    cfg = dict(BASE)
    cfg["sinks"] = {
        "errors_out": {"type": "parquet", "inputs": ["routed.errors"],
                       "path": f"{OUT}/errors"},
        "agg_out": {"type": "parquet", "inputs": ["error_agg"],
                    "path": f"{OUT}/agg"},
        "drop_count": {"type": "blackhole", "inputs": ["parsed.dropped"]},
        "both": {"type": "blackhole",
                 "inputs": ["routed.errors", "routed.tools"]},
    }
    counts = run_topology(spark, cfg)
    res = build_topology(spark, BASE)
    assert counts["errors_out"] == res["routed"]["errors"].count()
    assert counts["drop_count"] == res["parsed.dropped"].count()
    # multi-input sink = union of both ports (glob-expansion semantics)
    assert counts["both"] == (
        res["routed"]["errors"].count() + res["routed"]["tools"].count()
    )
    written = spark.read.parquet(f"{OUT}/agg")
    assert written.count() == counts["agg_out"] and written.count() > 0


def test_multi_transform_chain(spark):
    cfg = {
        "sources": {"in": {"type": "transcripts", "n_turns": 6000}},
        "transforms": {
            "sampled": {"type": "sample", "inputs": ["in"], "rate": 5,
                        "key_field": "conv_id"},
            "sessions": {"type": "sessionize", "inputs": ["in"],
                         "group_by": ["conv_id"], "gap_secs": 600},
            "collapsed": {
                "type": "reduce", "inputs": ["in"], "group_by": ["conv_id"],
                "strategies": {"all_text": ["concat_newline", "text"],
                               "n": ["count", "text"]},
            },
            "deduped": {"type": "dedupe", "inputs": ["in"],
                        "match": ["conv_id", "turn_idx"]},
        },
    }
    res = build_topology(spark, cfg)
    assert res["deduped"].count() == 6000  # input has no dup keys
    assert res["collapsed"].columns == ["conv_id", "all_text", "n", "ts", "ts_end"]
    assert res["sessions"].select("session_id").distinct().count() >= 1
    assert 0 < res["sampled"].count() < 6000


def test_datadog_search_condition_in_config(spark):
    """Typed conditions in configs like the reference's AnyCondition
    (conditions/mod.rs:26-51): a route driven by Datadog search syntax."""
    cfg = {
        "sources": {"in": {"type": "transcripts", "n_turns": 6000}},
        "transforms": {
            "parsed": {"type": "remap", "inputs": ["in"]},
            "routed": {
                "type": "route", "inputs": ["parsed"],
                "routes": {
                    "errs": {"type": "datadog_search",
                             "source": "level:error OR http_status:>=500"},
                    "slow": {"type": "datadog_search",
                             "source": "latency_ms:>1500"},
                },
            },
        },
        "sinks": {},
    }
    outs = build_topology(spark, cfg)
    parsed = outs["parsed"]
    errs = outs["routed"]["errs"]
    want = parsed.filter("level = 'error' OR http_status >= 500")
    assert errs.count() == want.count() > 0
    slow = outs["routed"]["slow"]
    assert slow.count() == parsed.filter("latency_ms > 1500").count() > 0


def test_enrichment_tables_section(spark, tmp_path):
    """Top-level enrichment_tables (the reference's config block):
    static + memory table types referenced by name from enrich."""
    import datetime as dt

    from vector_spark.operators.memory_table import MemoryTable

    # pre-populate a memory table the topology will join against
    mt_path = str(tmp_path / "memtbl")
    seed = MemoryTable(spark, mt_path, ["role"], ttl_sec=10**9)
    seed.write(spark.createDataFrame(
        [("user", "blue", dt.datetime(2026, 1, 1)),
         ("assistant", "green", dt.datetime(2026, 1, 1))],
        "role string, team_color string, ts timestamp",
    ))

    cfg = {
        "enrichment_tables": {
            "colors": {"type": "memory", "path": mt_path,
                       "key_cols": ["role"], "ttl": 10**9},
            "labels": {"type": "static",
                       "rows": [("user", "human"), ("assistant", "model")],
                       "schema": "role string, label string"},
        },
        "sources": {"in": {"type": "transcripts", "n_turns": 2000}},
        "transforms": {
            "with_color": {
                "type": "enrich", "inputs": ["in"], "table": "colors",
                "keys": ["role"], "as_of": "2026-06-01 00:00:00",
            },
            "with_label": {
                "type": "enrich", "inputs": ["with_color"],
                "table": "labels", "keys": ["role"],
            },
        },
        "sinks": {},
    }
    outs = build_topology(spark, cfg)
    rows = outs["with_label"].filter("role = 'user'").limit(1).collect()
    assert rows[0]["team_color"] == "blue" and rows[0]["label"] == "human"
    # roles not in the tables enrich to null, rows preserved
    assert outs["with_label"].count() == 2000


def test_framed_file_source_in_config(spark, tmp_path):
    """file source with framing: octet_counting — a Vector config using
    RFC6587 framing ports directly."""
    from pyspark.sql import functions as F

    from vector_spark.sources.readers import octet_encode

    src = str(tmp_path / "framed")
    msgs = [f"log line {i}" for i in range(10)]
    spark.createDataFrame([(i, m) for i, m in enumerate(msgs)], "i int, m string").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", octet_encode(F.col("m")).alias("f")))),
                lambda x: x["f"],
            ),
        ).alias("value")
    ).coalesce(1).write.text(src)

    cfg = {
        "sources": {
            "in": {
                "type": "file", "path": src,
                "framing": {"method": "octet_counting"},
            }
        }
    }
    out = build_topology(spark, cfg)["in"]
    assert sorted(r["value"] for r in out.collect()) == sorted(msgs)


def test_geoip_enrichment_table_in_config(spark, tmp_path):
    """enrichment_tables: {type: geoip, path: x.mmdb} + enrich_geoip
    transform — the reference's geoip block ports directly."""
    from tests.test_enrich_mmdb import NETWORKS, write_mmdb

    mmdb = str(tmp_path / "geo.mmdb")
    write_mmdb(mmdb, NETWORKS)

    cfg = {
        "enrichment_tables": {
            "geo": {"type": "geoip", "path": mmdb,
                    "fields": ["country.iso_code"]},
        },
        "sources": {
            "in": {"type": "static_rows"},
        },
        "transforms": {
            "located": {
                "type": "enrich_geoip", "inputs": ["in"],
                "table": "geo", "ip_col": "client_ip",
            },
        },
    }
    # tiny inline source: reuse the static enrichment-table mechanism
    cfg["sources"]["in"] = {"type": "parquet", "path": str(tmp_path / "facts")}
    spark.createDataFrame(
        [("e1", "10.1.2.3"), ("e2", "8.8.8.8")],
        "event string, client_ip string",
    ).write.parquet(cfg["sources"]["in"]["path"])

    out = build_topology(spark, cfg)["located"]
    got = {r["event"]: r["country_iso_code"] for r in out.collect()}
    assert got == {"e1": "AA", "e2": None}


def test_length_delimited_file_source_in_config(spark, tmp_path):
    """file source with framing: length_delimited — regression: the
    frame explode was nested inside cast(), which the analyzer rejects
    (UNSUPPORTED_GENERATOR.NESTED_IN_EXPRESSIONS), so this config path
    crashed at plan time."""
    src = tmp_path / "ld.bin"
    msgs = ["alpha", "beta two", "gamma"]
    with open(src, "wb") as f:
        for m in msgs:
            b = m.encode()
            f.write(len(b).to_bytes(4, "big") + b)

    cfg = {
        "sources": {
            "in": {
                "type": "file", "path": str(src),
                "framing": {"method": "length_delimited"},
            }
        }
    }
    out = build_topology(spark, cfg)["in"]
    assert sorted(r["value"] for r in out.collect()) == sorted(msgs)


def test_run_topology_unpersists_on_build_failure(spark):
    """A component that fails to BUILD after the route branch persisted
    its input must still be unpersisted — the leak guard covers build
    errors, not just sink errors."""
    import pytest as _pytest

    from vector_spark.config import ConfigError, run_topology

    baseline = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    cfg = {
        "sources": {"in": {"type": "demo_logs", "n": 10}},
        "transforms": {
            "r": {"type": "route", "inputs": ["in"],
                  "routes": {"x": "true", "y": "false"}},
            "bad": {"type": "no_such_transform", "inputs": ["r.x"]},
        },
        "sinks": {"s": {"type": "blackhole", "inputs": ["bad"]}},
    }
    with _pytest.raises(ConfigError):
        run_topology(spark, cfg)
    import time
    for _ in range(50):  # unpersist is async on the Spark side
        if (spark.sparkContext._jsc.sc().getPersistentRDDs().size()
                <= baseline):
            break
        time.sleep(0.1)
    assert (spark.sparkContext._jsc.sc().getPersistentRDDs().size()
            <= baseline)


def test_vrl_decoder_codec(spark, tmp_path):
    """``decoding: vrl`` on a text source
    (lib/codecs/src/decoding/format/vrl.rs): frames decode by running
    a program over {message: <line>}; unparseable frames are decoding
    errors and are dropped, not crashed on."""
    p = tmp_path / "lines.log"
    p.write_text(
        "type=click user=7\ntype=error user=9\ngarbage\ntype=view user=11\n"
    )
    topo = {
        "sources": {
            "in": {
                "type": "text", "path": str(p), "codec": "vrl",
                "vrl": {
                    "assignments": {
                        "etype": "regexp_extract(message, 'type=([^ ]+)', 1)",
                        "user": (
                            "try_cast(regexp_extract(message,"
                            " 'user=([^ ]+)', 1) AS BIGINT)"
                        ),
                    },
                    "error_when": "etype = ''",
                    "deletions": ["message"],
                },
            }
        },
        "transforms": {
            "errs": {"type": "filter", "inputs": ["in"],
                     "condition": "etype = 'error'"},
        },
    }
    res = build_topology(spark, topo)
    rows = {r["etype"]: r["user"] for r in res["in"].collect()}
    # the garbage frame is a decoding error: dropped, never emitted
    assert rows == {"click": 7, "error": 9, "view": 11}
    assert res["in"].columns == ["etype", "user"]  # message deleted
    assert res["errs"].count() == 1


def test_vrl_decoder_on_framed_file_source(spark, tmp_path):
    """``decoding: vrl`` composes with non-newline framing: the file
    source's octet-counted frames feed the program."""
    p = tmp_path / "framed.log"
    msgs = ["type=a n=1", "type=b n=2"]
    p.write_text("".join(f"{len(m)} {m}" for m in msgs))
    topo = {
        "sources": {
            "in": {
                "type": "file", "path": str(p),
                "framing": {"method": "octet_counting"},
                "codec": "vrl",
                "vrl": {
                    "assignments": {
                        "etype": "regexp_extract(message, 'type=([^ ]+)', 1)",
                        "n": (
                            "try_cast(regexp_extract(message,"
                            " 'n=([^ ]+)', 1) AS BIGINT)"
                        ),
                    },
                },
            }
        },
        "transforms": {},
    }
    res = build_topology(spark, topo)
    got = sorted((r["etype"], r["n"]) for r in res["in"].collect())
    assert got == [("a", 1), ("b", 2)]


def test_file_sink_encodings(spark, outdir):
    """`type: file` sink renders events through the encoding stack
    (lib/codecs/src/encoding/format/): logfmt lines re-parse to the
    original fields; syslog lines carry the configured field roles."""
    cfg = dict(BASE)
    cfg["sinks"] = {
        "lf": {"type": "file", "inputs": ["error_agg"],
               "path": f"{OUT}/lf", "encoding": {"codec": "logfmt"}},
        "sl": {"type": "file", "inputs": ["routed.errors"],
               "path": f"{OUT}/sl",
               "encoding": {"codec": "syslog", "message_field": "msg",
                            "severity": "level", "app_name": "service",
                            "timestamp_field": "ts"}},
        "tx": {"type": "file", "inputs": ["routed.errors"],
               "path": f"{OUT}/tx",
               "encoding": {"codec": "text", "message_field": "msg"}},
    }
    counts = run_topology(spark, cfg)
    res = build_topology(spark, BASE)
    n_err = res["routed"]["errors"].count()
    assert counts["sl"] == n_err and counts["tx"] == n_err
    assert counts["lf"] == res["error_agg"].count() > 0

    from vector_spark.functions.vrl import parse_logfmt, parse_syslog_5424

    lf = spark.read.text(f"{OUT}/lf")
    back = lf.select(parse_logfmt(F.col("value")).alias("m"))
    [r] = back.limit(1).collect()
    assert {"role", "n"} <= set(r["m"].keys())

    sl = spark.read.text(f"{OUT}/sl")
    p = sl.select(parse_syslog_5424(F.col("value")).alias("p"))
    assert p.filter(F.col("p").isNull()).count() == 0
    # level='error' rows carry severity err(3); app is the service field
    sev = p.select("p.severity").distinct().collect()
    assert {row[0] for row in sev} <= {3, 6}  # http_status-routed rows keep default

    tx = spark.read.text(f"{OUT}/tx")
    # apache-routed rows have no msg → empty payload lines (text.rs)
    assert tx.filter(F.col("value") != "").count() > 0


def test_character_delimited_file_source_in_config(spark, tmp_path):
    """file source with framing: character_delimited
    (framing/character_delimited.rs): custom delimiter, max_length
    discards oversized frames entirely."""
    src = tmp_path / "cd.txt"
    src.write_text("one\x1ftwo is long\x1fthree\x1f")
    cfg = {
        "sources": {
            "in": {
                "type": "file", "path": str(src),
                "framing": {"method": "character_delimited",
                            "delimiter": "\x1f", "max_length": 5},
            }
        }
    }
    out = build_topology(spark, cfg)["in"]
    assert sorted(r["value"] for r in out.collect()) == ["one", "three"]


def test_varint_length_delimited_file_source_in_config(spark, tmp_path):
    """file source with framing: varint_length_delimited
    (framing/varint_length_delimited.rs): varint prefixes incl. a
    multi-byte one (>127-byte frame)."""
    from vector_spark.sources.otlp import _write_varint

    msgs = ["alpha", "x" * 200, "gamma"]
    src = tmp_path / "vld.bin"
    with open(src, "wb") as f:
        for m in msgs:
            b = m.encode()
            f.write(_write_varint(len(b)) + b)
    cfg = {
        "sources": {
            "in": {
                "type": "file", "path": str(src),
                "framing": {"method": "varint_length_delimited"},
            }
        }
    }
    out = build_topology(spark, cfg)["in"]
    assert sorted(r["value"] for r in out.collect()) == sorted(msgs)
    # FrameTooLarge invalidates the payload (framing error → no rows)
    cfg["sources"]["in"]["framing"]["max_frame_length"] = 100
    assert build_topology(spark, cfg)["in"].count() == 0
