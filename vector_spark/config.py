"""Config-driven topology: a Vector-style declarative pipeline spec
compiled onto the operator library.

Mirrors the reference's config lifecycle (SURVEY §3.1):
sources/transforms/sinks with ``inputs`` edges
(/root/reference/src/config/compiler.rs:11-164), multi-output
components addressed as ``name.port``
(/root/reference/src/transforms/route.rs:64-92 port naming), cycle and
unknown-input validation (/root/reference/src/config/graph.rs:244-318).
The compiled topology is a dict of lazy DataFrames — Catalyst is the
physical planner; running the sinks triggers execution.

Supported component types map 1:1 to SURVEY §2 operators:

sources:    parquet | csv | json | text (with codec) | transcripts |
            demo_logs | file (multiline or framing: octet_counting /
            length_delimited / varint_length_delimited /
            character_delimited / chunked_gelf)
transforms: remap(parse) | remap_exprs | filter | route | exclusive_route | sample |
            throttle | dedupe | reduce | aggregate | window | enrich |
            enrich_geoip | log_to_metric | metric_to_log |
            incremental_to_absolute | tag_cardinality_limit |
            sessionize | lineage
enrichment_tables: csv | memory | static | geoip/mmdb (range table)
sinks:      parquet | csv | json | console | blackhole | avro
            | file (line-encoded via encoding.codec: text/raw_message/
              json/logfmt/csv/syslog/gelf/cef)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from vector_spark.operators import (
    aggregate,
    context_window,
    dedupe,
    exclusive_route,
    filter_events,
    incremental_to_absolute,
    log_to_metric,
    metric_to_log,
    reduce_events,
    route,
    sample,
    sessionize,
    tag_cardinality_limit,
    throttle,
)
from vector_spark.plans.driver import add_lineage


class ConfigError(ValueError):
    pass


class PortAddressError(ConfigError):
    """Permanent addressing mistake (vs a dependency not built yet)."""


def _resolve_input(results: dict[str, Any], ref: str) -> DataFrame:
    """``name`` or ``name.port`` (multi-output components)."""
    if ref in results:
        out = results[ref]
        if isinstance(out, dict):
            raise PortAddressError(
                f"component {ref!r} has ports {sorted(out)}; "
                f"address one as '{ref}.<port>'"
            )
        return out
    if "." in ref:
        name, port = ref.rsplit(".", 1)
        if name in results and isinstance(results[name], dict):
            ports = results[name]
            if port not in ports:
                raise PortAddressError(f"{name!r} has no port {port!r} "
                                       f"(have {sorted(ports)})")
            return ports[port]
    raise ConfigError(f"unknown input {ref!r}")


def _union_inputs(results: dict[str, Any], refs: list[str]) -> DataFrame:
    """Multiple ``inputs`` union into one stream, as in the reference
    (compiler.rs:166-193 glob expansion feeds one component)."""
    dfs = [_resolve_input(results, r) for r in refs]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _build_source(spark: SparkSession, cfg: dict) -> DataFrame:
    typ = cfg["type"]
    if cfg.get("codec") == "vrl" and typ in ("text", "file"):
        # decoding: vrl (lib/codecs/src/decoding/format/vrl.rs): frames
        # (newline lines, or whatever the file source's framing yields)
        # decode by running a program over {message: <frame>}; program
        # error / abort = decoding error, frame dropped
        from vector_spark.sources.readers import decode_vrl

        if typ == "text":
            lines = spark.read.text(cfg["path"])
        else:
            sub = {k: v for k, v in cfg.items() if k not in ("codec", "vrl")}
            lines = _build_source(spark, sub)
        return decode_vrl(lines, cfg.get("vrl", {}))
    if typ == "transcripts":
        from vector_spark.data.transcripts import transcripts_table

        return transcripts_table(spark, cfg.get("n_turns", 6000))
    if typ in ("parquet", "csv", "json"):
        from vector_spark.sources.readers import read_source

        return read_source(spark, typ, cfg["path"], cfg.get("schema"))
    if typ == "text":
        from vector_spark.sources.readers import read_text_decoded

        return read_text_decoded(
            spark, cfg["path"], cfg.get("codec", "bytes"), cfg.get("schema")
        )
    if typ == "otlp":
        # OTLP protobuf export requests, one per binary file (the HTTP
        # body model) — decoding/format/otlp.rs semantics via the
        # pure-Python wire decoder (sources/otlp.py).  flatten: true
        # (default) explodes typed LogRecord rows; flatten: false keeps
        # one schemaless JSON event per request like the reference.
        from pyspark.sql import functions as F

        from vector_spark.sources.otlp import (
            DEFAULT_SIGNALS, decode_otlp, otlp_log_records,
            otlp_metric_points, otlp_spans,
        )

        whole = spark.read.format("binaryFile").load(cfg["path"])
        if cfg.get("flatten", True):
            # flatten target follows the signal selection: metrics-only
            # sources explode typed metric points, traces-only sources
            # typed spans, otherwise LogRecords
            if cfg.get("signal_types") == ["metrics"]:
                return otlp_metric_points(whole, value_col="content")
            if cfg.get("signal_types") == ["traces"]:
                return otlp_spans(whole, value_col="content")
            return otlp_log_records(whole, value_col="content")
        signals = tuple(cfg.get("signal_types", DEFAULT_SIGNALS))
        return whole.select(
            decode_otlp(F.col("content"), signals).alias("decoded"),
            F.col("path"),
        )
    if typ == "memory":
        # memory enrichment table used as a SOURCE
        # (src/enrichment_tables/memory/source.rs): export the table's
        # items — or its TTL-expired entries — as events at an as-of
        # point (the batch rendering of the interval export)
        from vector_spark.operators.memory_table import MemoryTable

        mt = MemoryTable(
            spark, cfg["path"], cfg["key_cols"],
            ttl_sec=cfg.get("ttl", 600), ttl_col=cfg.get("ttl_col"),
        )
        as_of = cfg["as_of"]
        if cfg.get("export") == "expired":
            return mt.expired(as_of)
        return mt.state(as_of)
    if typ == "dnstap":
        # dnstap over Frame Streams files (the fstrm container the
        # reference's dnstap source reads — src/sources/dnstap +
        # src/sources/util/framestream.rs): one parsed-event JSON row
        # per data frame
        from pyspark.sql import functions as F

        from vector_spark.functions.dnstap import fstrm_frames, parse_dnstap

        whole = spark.read.format("binaryFile").load(cfg["path"])
        frames = whole.select(
            F.explode(fstrm_frames(F.col("content"))).alias("frame")
        )
        return frames.select(
            parse_dnstap(
                F.col("frame"),
                lowercase_hostnames=cfg.get("lowercase_hostnames", False),
            ).alias("value")
        )
    if typ == "avro":
        # Avro object container files, decoded jar-free
        # (decoding/format/avro.rs; sources/avro.py pure-Python reader)
        from vector_spark.sources.avro import read_avro

        return read_avro(
            spark, cfg["path"], schema_json=cfg.get("schema"),
            reader_schema=cfg.get("reader_schema"),
        )
    if typ == "protobuf":
        # one binary message per file (the HTTP-body model), decoded
        # jar-free against either descriptor surface the reference
        # supports: desc_file (binary FileDescriptorSet,
        # decoding/format/protobuf.rs:79-83) or a .proto source
        from pyspark.sql import functions as F

        from vector_spark.sources.protobuf import (
            from_protobuf_py, parse_descriptor_set, parse_proto_text,
        )

        if "desc_file" in cfg:
            with open(cfg["desc_file"], "rb") as fh:
                registry = parse_descriptor_set(fh.read())
        else:
            with open(cfg["proto_file"]) as fh:
                registry = parse_proto_text(fh.read())
        whole = spark.read.format("binaryFile").load(cfg["path"])
        return whole.select(
            from_protobuf_py(
                F.col("content"), registry, cfg["message_type"]
            ).alias("decoded"),
            F.col("path"),
        ).select("decoded.*", "path")
    if typ == "demo_logs":
        from vector_spark.sources.readers import demo_logs

        return demo_logs(spark, cfg.get("n", 1000), cfg.get("format", "shuffle"))
    if typ == "file":
        # the reference's file source with optional multiline assembly
        # and non-newline framing (decoding/framing/)
        ml = cfg.get("multiline")
        if ml:
            from vector_spark.sources.readers import read_text_multiline

            return read_text_multiline(
                spark, cfg["path"], ml["start_pattern"],
                mode=ml.get("mode", "halt_before"),
                condition_pattern=ml.get("condition_pattern"),
            )
        framing = cfg.get("framing")
        if framing and framing.get("method", "newline") != "newline":
            from pyspark.sql import functions as F

            method = framing["method"]
            max_len = framing.get("max_length")
            if method == "octet_counting":
                from vector_spark.sources.readers import octet_frames

                whole = spark.read.text(cfg["path"], wholetext=True)
                return whole.select(
                    F.explode(
                        octet_frames(F.col("value"), max_len)
                    ).alias("value")
                )
            if method == "length_delimited":
                from vector_spark.sources.readers import (
                    length_delimited_frames,
                )

                whole = spark.read.format("binaryFile").load(cfg["path"])
                # explode first, cast in a second projection — a
                # generator nested inside cast() is rejected by the
                # analyzer (UNSUPPORTED_GENERATOR.NESTED_IN_EXPRESSIONS)
                return whole.select(
                    F.explode(
                        length_delimited_frames(F.col("content"), max_len)
                    ).alias("_frame")
                ).select(F.col("_frame").cast("string").alias("value"))
            if method == "character_delimited":
                from vector_spark.sources.readers import (
                    character_delimited_frames,
                )

                whole = spark.read.text(cfg["path"], wholetext=True)
                return whole.select(
                    F.explode(
                        character_delimited_frames(
                            F.col("value"), framing["delimiter"], max_len
                        )
                    ).alias("value")
                )
            if method == "varint_length_delimited":
                from vector_spark.sources.readers import (
                    varint_length_delimited_frames,
                )

                whole = spark.read.format("binaryFile").load(cfg["path"])
                return whole.select(
                    F.explode(
                        varint_length_delimited_frames(
                            F.col("content"),
                            framing.get("max_frame_length", 8 * 1024 * 1024),
                        )
                    ).alias("_frame")
                ).select(F.col("_frame").cast("string").alias("value"))
            if method == "chunked_gelf":
                from vector_spark.sources.readers import (
                    reassemble_gelf_chunks,
                )

                whole = spark.read.format("binaryFile").load(cfg["path"])
                return reassemble_gelf_chunks(
                    whole.select(F.col("content").alias("payload")), "payload"
                ).select(F.col("message").cast("string").alias("value"))
            raise ConfigError(f"unknown framing method {method!r}")
        return spark.read.text(cfg["path"])
    raise ConfigError(f"unknown source type {typ!r}")


def _build_enrichment_tables(spark: SparkSession, config: dict) -> dict:
    """Top-level ``enrichment_tables`` section — the reference's
    enrichment_tables config block (src/enrichment_tables/): named
    tables referenced by enrich transforms.  Types: ``csv`` (typed
    file table), ``memory`` (writable TTL table), ``static`` (inline
    rows for tests)."""
    tables: dict[str, Any] = {}
    for name, cfg in config.get("enrichment_tables", {}).items():
        typ = cfg["type"]
        if typ == "csv":
            from vector_spark.enrich import load_csv_lookup

            tables[name] = load_csv_lookup(spark, cfg["path"], cfg["schema"])
        elif typ == "memory":
            from vector_spark.operators.memory_table import MemoryTable

            tables[name] = MemoryTable(
                spark, cfg["path"], cfg["key_cols"],
                ttl_sec=cfg.get("ttl", 600),
                ttl_col=cfg.get("ttl_field"),
                max_byte_size=cfg.get("max_byte_size"),
                tiebreak_cols=cfg.get("tiebreak_cols"),
            )
        elif typ == "static":
            tables[name] = spark.createDataFrame(cfg["rows"], cfg["schema"])
        elif typ in ("geoip", "mmdb"):
            # src/enrichment_tables/{geoip,mmdb}.rs: the .mmdb file is
            # read once at the driver into an (ip_lo, ip_hi, attrs)
            # range table; lookups are the distributed range join
            from vector_spark.enrich_mmdb import mmdb_range_table

            tables[name] = mmdb_range_table(
                spark, cfg["path"], cfg.get("fields")
            )
        else:
            raise ConfigError(f"unknown enrichment table type {typ!r}")
    return tables


def _build_transform(
    spark: SparkSession, cfg: dict, inp: DataFrame,
    tables: dict | None = None,
    persisted: list[DataFrame] | None = None,
) -> DataFrame | dict[str, DataFrame]:
    typ = cfg["type"]
    if typ == "remap":
        from vector_spark.functions.parse import parse_transcripts, split_errors

        parsed = parse_transcripts(inp, engine=cfg.get("engine", "jvm"))
        ok, dropped = split_errors(parsed)
        if cfg.get("flatten", True):
            keep = [c for c in inp.columns if c != "text"]
            ok = ok.select(*keep, "format", "parsed.*")
        # remap's main + dropped output ports (remap.rs:50)
        return {"__default__": ok, "dropped": dropped}
    if typ == "remap_exprs":
        from vector_spark.operators.remap import remap as generic_remap

        res = generic_remap(
            inp, cfg["assignments"],
            deletions=cfg.get("deletions", ()),
            error_when=cfg.get("error_when"),
            abort_when=cfg.get("abort_when"),
            explode_col=cfg.get("explode_col"),
        )
        return {"__default__": res.main, "dropped": res.dropped}
    if typ == "filter":
        return filter_events(inp, cfg["condition"])
    if typ == "route":
        # cache the shared upstream when several ports will each
        # trigger their own sink action (run_topology writes per port);
        # persist HERE (not inside route()) so the topology runner can
        # unpersist after the per-port actions — otherwise every
        # topology run pins another MEMORY_AND_DISK copy for the
        # session lifetime
        if cfg.get("cache", len(cfg["routes"]) > 1):
            inp = inp.persist()
            if persisted is not None:
                persisted.append(inp)
        out = route(inp, cfg["routes"],
                    reroute_unmatched=cfg.get("reroute_unmatched", True))
        return out
    if typ == "exclusive_route":
        return exclusive_route(inp, [tuple(r) for r in cfg["routes"]])
    if typ == "sample":
        return sample(inp, cfg["rate"], cfg.get("key_field"),
                      group_by=cfg.get("group_by"),
                      exclude=cfg.get("exclude"))
    if typ == "throttle":
        return throttle(inp, cfg["threshold"], cfg["window_secs"],
                        cfg.get("key_fields"), exclude=cfg.get("exclude"))
    if typ == "dedupe":
        return dedupe(inp, match=cfg.get("match"), ignore=cfg.get("ignore"))
    if typ == "reduce":
        return reduce_events(
            inp, cfg["group_by"],
            {k: tuple(v) for k, v in cfg["strategies"].items()},
            ord_col=cfg.get("ord_col", "turn_idx"),
        )
    if typ == "aggregate":
        return aggregate(
            inp, cfg.get("keys", []),
            {k: tuple(v) for k, v in cfg["specs"].items()},
            interval_sec=cfg.get("interval_secs", 60),
        )
    if typ == "window":
        return context_window(
            inp, cfg["flush_when"],
            group_by=cfg.get("group_by", ["conv_id"]),
            order_by=cfg.get("order_by", ["turn_idx"]),
            before=cfg.get("num_events_before", 100),
            after=cfg.get("num_events_after", 0),
            forward_when=cfg.get("forward_when"),
        )
    if typ == "enrich_geoip":
        # IP range enrichment against a geoip/mmdb/range table
        from vector_spark.enrich import enrich_ip_ranges

        if not tables or cfg["table"] not in tables:
            raise ConfigError(f"unknown enrichment table {cfg.get('table')!r}")
        return enrich_ip_ranges(
            inp, tables[cfg["table"]], cfg["ip_col"],
            how=cfg.get("strategy", "bucketed"),
        )
    if typ == "enrich":
        from vector_spark.enrich import enrich

        table = cfg.get("table")
        if tables and table in tables:
            obj = tables[table]
            from vector_spark.operators.memory_table import MemoryTable

            if isinstance(obj, MemoryTable):
                return obj.lookup(inp, cfg["as_of"])
            lookup = obj  # a DataFrame table
        elif table == "tool_lookup":
            from vector_spark.data.lookup import tool_lookup_df

            lookup = tool_lookup_df(spark)
        else:
            from vector_spark.enrich import load_csv_lookup

            lookup = load_csv_lookup(spark, cfg["path"], cfg["schema"])
        return enrich(inp, lookup, cfg["keys"],
                      date_col=cfg.get("date_col"),
                      strict=cfg.get("strict", False))
    if typ == "log_to_metric":
        return log_to_metric(inp, cfg["rules"])
    if typ == "metric_to_log":
        return metric_to_log(inp)
    if typ == "incremental_to_absolute":
        return incremental_to_absolute(inp, cfg.get("series_keys", ["name", "namespace"]))
    if typ == "tag_cardinality_limit":
        return tag_cardinality_limit(
            inp, cfg["tags"], cfg.get("value_limit", 500),
            action=cfg.get("action", "drop_tag"),
        )
    if typ == "sessionize":
        return sessionize(inp, cfg["group_by"], gap_sec=cfg.get("gap_secs", 30))
    if typ == "lineage":
        return add_lineage(inp, cfg.get("source", "?"), cfg.get("stage", "?"))
    raise ConfigError(f"unknown transform type {typ!r}")


def build_topology(
    spark: SparkSession, config: dict,
    persisted: list[DataFrame] | None = None,
) -> dict[str, DataFrame | dict[str, DataFrame]]:
    """Compile the config into lazy frames, keyed by component name.

    Multi-output transforms yield a dict of ports; their default port
    is addressable by the bare name.  ``persisted`` (optional out-list)
    collects frames the compiler persisted so the runner can unpersist
    them once the per-sink actions complete.
    """
    results: dict[str, Any] = {}
    tables = _build_enrichment_tables(spark, config)
    for name, cfg in config.get("sources", {}).items():
        results[name] = _build_source(spark, cfg)

    transforms = dict(config.get("transforms", {}))
    remaining = dict(transforms)
    progress = True
    while remaining and progress:
        progress = False
        for name in list(remaining):
            cfg = remaining[name]
            try:
                inp = _union_inputs(results, cfg["inputs"])
            except PortAddressError:
                raise
            except ConfigError:
                continue  # dependency not built yet
            out = _build_transform(spark, cfg, inp, tables, persisted)
            if isinstance(out, dict) and "__default__" in out:
                results[name] = out["__default__"]
                for port, df in out.items():
                    if port != "__default__":
                        results[f"{name}.{port}"] = df
            else:
                results[name] = out
            del remaining[name]
            progress = True
    if remaining:
        # distinguish cycles (inputs name a transform that never built)
        # from typos (inputs name nothing at all)
        name = sorted(remaining)[0]
        for ref in remaining[name]["inputs"]:
            base = ref.split(".", 1)[0]
            if base in transforms:
                raise ConfigError(f"cycle involving {sorted(remaining)}")
        _union_inputs(results, remaining[name]["inputs"])  # raises ConfigError
    return results


def run_topology(spark: SparkSession, config: dict) -> dict[str, int]:
    """Build + execute every sink; returns per-sink row counts
    (the per-sink count parity surface)."""
    from vector_spark.sources.sinks import blackhole, console, write_sink

    persisted: list[DataFrame] = []
    counts: dict[str, int] = {}
    try:
        # inside the try: a component that fails to BUILD after the
        # route branch persisted its input must still be unpersisted
        results = build_topology(spark, config, persisted)
        for name, cfg in config.get("sinks", {}).items():
            df = _union_inputs(results, cfg["inputs"])
            typ = cfg["type"]
            if typ == "blackhole":
                counts[name] = blackhole(df)
            elif typ == "console":
                console(df, cfg.get("n", 20))
                counts[name] = df.count()
            elif typ == "avro":
                # jar-free container-file sink (encoding/format/avro.rs)
                from vector_spark.sources.avro import read_avro, write_avro

                write_avro(df, cfg["path"], cfg["schema"],
                           codec=cfg.get("codec", "deflate"))
                counts[name] = read_avro(spark, cfg["path"]).count()
            elif typ == "file":
                # line-encoded file sink: encoding.codec picks the
                # serializer (text/raw_message/json/logfmt/csv/syslog/
                # gelf/cef — lib/codecs/src/encoding/format/)
                from vector_spark.sources.sinks import render_encoded

                enc = dict(cfg.get("encoding") or {})
                codec = enc.pop("codec", "text")
                lines = render_encoded(df, codec, enc)
                lines.write.mode(cfg.get("mode", "overwrite")).text(
                    cfg["path"]
                )
                counts[name] = spark.read.text(cfg["path"]).count()
            else:
                write_sink(df, cfg["path"], fmt=typ, mode=cfg.get("mode", "overwrite"))
                counts[name] = spark.read.format(typ).load(cfg["path"]).count()
    finally:
        for df in persisted:
            df.unpersist()
    return counts
