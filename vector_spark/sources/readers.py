"""Sources: one scan operator + per-source decoding codecs.

The reference ships 45 source modules (SURVEY §2.4); on Spark they
collapse into `spark.read.format(...)` plus a DECODER applied to the
payload column — mirroring the codec layer
(/root/reference/lib/codecs/src/decoding/format/: bytes, json, syslog,
gelf, logfmt/influx, csv, protobuf...).  Tailing-file checkpoints
(lib/file-source-common/src/checkpointer.rs:44-60) correspond to
Structured Streaming source offsets (vector_spark.streaming) and the
batch checkpoint manifest (plans.driver).

Kafka/Iceberg need their connector jars on the classpath; absent in
this container, the reader raises a clear error at call time (the plan
shape is identical once the jar is present).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from vector_spark.functions import vrl
from vector_spark.functions.parse import parse_key_value


def read_source(
    spark: SparkSession,
    fmt: str,
    path_or_options: str | dict,
    schema: str | None = None,
) -> DataFrame:
    """The single scan operator: parquet/csv/json/text/orc natively;
    kafka/iceberg if their connectors are on the classpath."""
    if fmt in ("parquet", "orc", "text"):
        reader = spark.read
        if schema:
            reader = reader.schema(schema)
        return getattr(reader, fmt)(path_or_options)
    if fmt == "csv":
        return spark.read.csv(path_or_options, header=True, schema=schema)
    if fmt == "json":
        reader = spark.read
        if schema:
            reader = reader.schema(schema)
        return reader.json(path_or_options)
    if fmt in ("kafka", "iceberg"):
        try:
            opts = path_or_options if isinstance(path_or_options, dict) else {}
            return spark.read.format(fmt).options(**opts).load()
        except Exception as exc:  # connector jar not on classpath here
            raise RuntimeError(
                f"{fmt} source requires its connector jar on the Spark "
                f"classpath (not bundled in this environment): {exc}"
            ) from exc
    raise ValueError(f"unknown source format {fmt!r}")


#: decoding codecs for text payloads (value column -> struct/map column)
def _decode_json(col: Column, schema: str) -> Column:
    return F.from_json(col, schema)


def _decode_syslog(col: Column, schema: str) -> Column:
    return vrl.parse_syslog(col)


def _decode_logfmt(col: Column, schema: str) -> Column:
    return parse_key_value(col)


def _decode_csv(col: Column, schema: str) -> Column:
    return F.from_csv(col, schema, {"sep": ","})


def _decode_gelf(col: Column, schema: str) -> Column:
    # GELF is JSON with well-known fields
    return F.from_json(
        col,
        schema
        or "version string, host string, short_message string, "
        "full_message string, timestamp double, level int",
    )


def decode_avro(spark: SparkSession, col: Column, avro_schema: str) -> Column:
    """Avro codec (lib/codecs/src/decoding/format/avro/) →
    `pyspark.sql.avro.functions.from_avro`.  The spark-avro jar is not
    bundled in this container; absence raises a clear error at call
    time (same contract as the kafka source) — on a cluster with the
    jar the identical call works unchanged."""
    from pyspark.sql.avro.functions import from_avro

    _probe_codec(
        spark, lambda c: from_avro(c, avro_schema), "avro", "spark-avro"
    )
    return from_avro(col, avro_schema)


def decode_protobuf(
    spark: SparkSession,
    col: Column,
    message_name: str,
    descriptor_set: bytes,
) -> Column:
    """Protobuf codec (lib/codecs/src/decoding/format/protobuf.rs:
    desc_file + message_type) → `from_protobuf` with a binary
    FileDescriptorSet.  Clear error without the spark-protobuf jar."""
    from pyspark.sql.protobuf.functions import from_protobuf

    _probe_codec(
        spark,
        lambda c: from_protobuf(
            c, message_name, binaryDescriptorSet=descriptor_set
        ),
        "protobuf",
        "spark-protobuf",
    )
    return from_protobuf(col, message_name, binaryDescriptorSet=descriptor_set)


def _probe_codec(spark: SparkSession, builder, codec: str, jar: str) -> None:
    try:
        spark.range(1).select(
            builder(F.lit(b"").cast("binary"))
        ).schema  # forces analysis
    except Exception as exc:
        raise RuntimeError(
            f"{codec} codec requires the {jar} package on the Spark "
            f"classpath (not bundled in this environment); the call "
            f"site is unchanged once it is present: {exc}"
        ) from exc


def _decode_influx(col: Column, schema: str) -> Column:
    """InfluxDB line protocol (the influx codec,
    lib/codecs decoding influxdb): ``measurement[,tag=v...] field=v[,...] [ts]``
    → struct(measurement, tags map, fields map, ts_ns).  Regex splits
    the three space-separated sections (escaped spaces not supported —
    documented subset), then key=value maps."""
    m = F.regexp_extract(col, r"^([^ ]+) ([^ ]+)( \d+)?$", 1)
    measurement = F.split(m, ",").getItem(0)
    tag_part = F.regexp_replace(m, r"^[^,]+,?", "")
    field_part = F.regexp_extract(col, r"^[^ ]+ ([^ ]+)", 1)
    ts = F.regexp_extract(col, r" (\d+)$", 1).try_cast("long")

    def kv_map(part: Column) -> Column:
        pairs = F.filter(F.split(part, ","), lambda p: p.contains("="))
        return F.map_from_entries(
            F.transform(
                pairs,
                lambda p: F.struct(
                    F.regexp_extract(p, "^([^=]+)=", 1).alias("key"),
                    F.regexp_extract(p, "^[^=]+=(.*)$", 1).alias("value"),
                ),
            )
        )

    return F.when(
        m != "",
        F.struct(
            measurement.alias("measurement"),
            kv_map(tag_part).alias("tags"),
            kv_map(field_part).alias("fields"),
            ts.alias("ts_ns"),
        ),
    )


def _decode_cri(col: Column, schema: str) -> Column:
    """CRI / containerd log lines
    (``2026-08-17T10:00:00.123456789Z stdout F message``): timestamp,
    stream, partial/full tag, message.  The 'P' tag marks a partial
    line (reassembled downstream with line_agg continue_through on
    tag=P)."""
    raw = F.regexp_extract(col, r"^(\S+) (stdout|stderr) ([PF]) (.*)$", 0)
    return F.when(
        raw != "",
        F.struct(
            F.to_timestamp(
                F.regexp_extract(col, r"^(\S+) ", 1)
            ).alias("timestamp"),
            F.regexp_extract(col, r"^\S+ (stdout|stderr)", 1).alias("stream"),
            (F.regexp_extract(col, r"^\S+ \S+ ([PF]) ", 1) == "P").alias(
                "partial"
            ),
            F.regexp_extract(col, r"^\S+ \S+ [PF] (.*)$", 1).alias("message"),
        ),
    )


def _decode_docker_json(col: Column, schema: str) -> Column:
    """Docker json-file driver lines:
    ``{"log": "...", "stream": "stdout", "time": "..."}``."""
    parsed = F.from_json(col, "log string, stream string, time string")
    return F.when(
        parsed.isNotNull() & parsed.getField("log").isNotNull(),
        F.struct(
            F.regexp_replace(parsed.getField("log"), r"\n$", "").alias(
                "message"
            ),
            parsed.getField("stream").alias("stream"),
            F.to_timestamp(parsed.getField("time")).alias("timestamp"),
        ),
    )


_DECODERS = {
    "bytes": lambda c, s: c,
    "json": _decode_json,
    "syslog": _decode_syslog,
    "logfmt": _decode_logfmt,
    "csv": _decode_csv,
    "gelf": _decode_gelf,
    "influxdb": _decode_influx,
    "cri": _decode_cri,
    "docker_json": _decode_docker_json,
}


def read_text_decoded(
    spark: SparkSession,
    path: str,
    codec: str,
    schema: str | None = None,
    *,
    value_col: str = "value",
    out_col: str = "decoded",
) -> DataFrame:
    """newline-framed text source + codec decode
    (decoding/framing/newline + format codecs)."""
    if codec not in _DECODERS:
        raise ValueError(f"unknown codec {codec!r}; have {sorted(_DECODERS)}")
    df = spark.read.text(path)
    return df.withColumn(out_col, _DECODERS[codec](F.col(value_col), schema))


def decode_vrl(df: DataFrame, program: dict, *, value_col: str = "value") -> DataFrame:
    """``decoding: vrl`` — decode raw frames by running a program
    (/root/reference/lib/codecs/src/decoding/format/vrl.rs:30-165):
    each frame becomes an event ``{message: <frame>}``, the program
    transforms it, and the final event is the decoding result.  A
    program error or ``abort`` is a DECODING error: the frame is
    dropped from the output (the reference skips the event and logs),
    it does not crash the stream.

    The program is the expression re-spec the remap transform uses
    (operators/remap.py): ``assignments`` (ordered, may reference
    earlier ones), ``deletions``, ``error_when``, ``abort_when``."""
    from vector_spark.operators.remap import remap

    ev = df.withColumnRenamed(value_col, "message")
    res = remap(
        ev,
        program.get("assignments", {}),
        deletions=program.get("deletions", ()),
        error_when=program.get("error_when"),
        abort_when=program.get("abort_when"),
        component="vrl_decoder",
    )
    return res.main


# ---------------------------------------------------------------------------
# Framing modes beyond newline
# (/root/reference/lib/codecs/src/decoding/framing/: octet_counting.rs,
#  length_delimited.rs, chunked_gelf.rs)


def octet_encode(col: Column) -> Column:
    """RFC6587 octet-counting encoder: ``<len> <msg>`` with len in
    BYTES (octet_length, not char length)."""
    return F.concat(
        F.octet_length(col).cast("string"), F.lit(" "), col
    )


def octet_frames(col: Column, max_length: int | None = None) -> Column:
    """Split an octet-counted payload into frames (array<string>).

    RFC6587 §3.4.1 (octet_counting.rs:39-120): each frame is
    ``<digits> SP <exactly-that-many-octets>``; when the buffer does
    not start with a digit the decoder falls back to newline framing
    for that segment (the reference's LinesCodec fallback), and frames
    longer than ``max_length`` are discarded (Discarding state).

    Frame boundaries depend on prior frames — inherently sequential per
    payload — so this is an Arrow-batched pandas UDF over whole
    payloads (one row per file/stream, NOT per line: per-payload
    Python, never per-frame-row)."""

    @F.pandas_udf("array<string>")
    def _frames(payloads: pd.Series) -> pd.Series:
        def split(payload: str | None) -> list[str] | None:
            if payload is None:
                return None
            buf = payload.encode("utf-8")
            out: list[str] = []
            while buf:
                i = 0
                while i < len(buf) and buf[i : i + 1].isdigit():
                    i += 1
                if 0 < i and buf[i : i + 1] == b" ":
                    n = int(buf[:i])
                    if len(buf) < i + 1 + n:
                        # incomplete trailing frame: the reference's
                        # framer holds it awaiting more bytes and
                        # errors at EOF — never emits a truncated
                        # fragment as if it were a complete frame
                        break
                    frame = buf[i + 1 : i + 1 + n]
                    buf = buf[i + 1 + n :]
                    if max_length is not None and n > max_length:
                        continue  # Discarding(n): skip oversized frame
                    out.append(frame.decode("utf-8", errors="replace"))
                else:
                    # not octet-framed here: newline fallback segment
                    nl = buf.find(b"\n")
                    seg, buf = (
                        (buf, b"") if nl < 0 else (buf[:nl], buf[nl + 1 :])
                    )
                    if seg == b"" and not buf:
                        continue  # trailing newline at EOF, not a frame
                    if max_length is None or len(seg) <= max_length:
                        out.append(seg.decode("utf-8", errors="replace"))
            return out

        return payloads.map(split)

    return _frames(col)


def length_delimited_encode(col: Column) -> Column:
    """4-byte big-endian length prefix + payload (binary)."""
    b = col.cast("binary")
    # u32 BE prefix = unhex of the zero-padded 8-digit hex length —
    # pure JVM expressions
    prefix = F.unhex(F.lpad(F.hex(F.octet_length(b)), 8, "0"))
    return F.concat(prefix, b)


def length_delimited_frames(col: Column, max_length: int | None = None) -> Column:
    """Split a length-delimited binary payload into frames
    (array<binary>) — framing/length_delimited.rs (tokio
    LengthDelimitedCodec defaults: u32 BE prefix)."""

    @F.pandas_udf("array<binary>")
    def _frames(payloads: pd.Series) -> pd.Series:
        def split(payload: bytes | None) -> list[bytes] | None:
            if payload is None:
                return None
            buf = bytes(payload)
            out: list[bytes] = []
            while len(buf) >= 4:
                n = int.from_bytes(buf[:4], "big")
                if len(buf) < 4 + n:
                    break  # incomplete trailing frame — see octet_frames
                frame, buf = buf[4 : 4 + n], buf[4 + n :]
                if max_length is None or n <= max_length:
                    out.append(frame)
            return out

        return payloads.map(split)

    return _frames(col)


def character_delimited_frames(
    col: Column, delimiter: str, max_length: int | None = None
) -> Column:
    """Split on an arbitrary delimiter character
    (framing/character_delimited.rs): frames longer than ``max_length``
    bytes are discarded ENTIRELY (new_with_max_length docs); a payload
    ending in the delimiter has no trailing empty frame, but interior
    empty frames are real frames.  Pure JVM — split + slice + filter,
    no UDF."""
    import re as _re

    parts = F.split(col, _re.escape(delimiter))
    # drop only the trailing "" that a final delimiter produces
    # (decode_eof emits remaining bytes as a frame only if non-empty)
    parts = F.when(
        F.element_at(parts, -1) == "",
        F.slice(parts, 1, F.size(parts) - 1),
    ).otherwise(parts)
    if max_length is not None:
        parts = F.filter(parts, lambda p: F.octet_length(p) <= max_length)
    return parts


def varint_length_delimited_encode(col: Column) -> Column:
    """Varint length prefix + payload (binary) — the encode side of
    framing/varint_length_delimited.rs, for round-trips."""

    @F.pandas_udf("binary")
    def _enc(msgs: pd.Series) -> pd.Series:
        from vector_spark.sources.otlp import _write_varint

        return msgs.map(
            lambda m: None if m is None
            else _write_varint(len(m)) + bytes(m)
        )

    return _enc(col.cast("binary"))


def varint_length_delimited_frames(
    col: Column, max_frame_length: int = 8 * 1024 * 1024
) -> Column:
    """Split a varint-length-delimited binary payload into frames
    (array<binary>) — framing/varint_length_delimited.rs.  A frame
    longer than ``max_frame_length`` (FrameTooLarge) or undecodable
    trailing bytes at EOF (TrailingData) are framing ERRORS in the
    reference, which invalidate the stream — rendered here as a NULL
    array for that payload (the repo's NULL-on-invalid convention); a
    clean incomplete tail (awaiting more bytes) never occurs at batch
    EOF, so it is TrailingData too."""

    @F.pandas_udf("array<binary>")
    def _frames(payloads: pd.Series) -> pd.Series:
        def split(payload: bytes | None) -> list[bytes] | None:
            if payload is None:
                return None
            buf = bytes(payload)
            out: list[bytes] = []
            while buf:
                # inline varint read (10-byte cap, like the reference's
                # MAX_VARINT_LENGTH guard)
                n, shift, i = 0, 0, 0
                while True:
                    if i >= len(buf) or i >= 10:
                        return None  # incomplete varint at EOF
                    b = buf[i]
                    n |= (b & 0x7F) << shift
                    i += 1
                    if not b & 0x80:
                        break
                    shift += 7
                if n > max_frame_length:
                    return None  # FrameTooLarge
                if len(buf) < i + n:
                    return None  # TrailingData at EOF
                out.append(buf[i:i + n])
                buf = buf[i + n:]
            return out

        return payloads.map(split)

    return _frames(col)


#: chunked-GELF magic prefix (chunked_gelf.rs: 0x1e 0x0f)
GELF_MAGIC = b"\x1e\x0f"


def gelf_chunk(col: Column, max_chunk_size: int = 8192) -> Column:
    """GELF native chunking — the encode side of chunked GELF
    (encoding/chunking/gelf.rs): payloads over ``max_chunk_size``
    split into up to 128 chunks of ``max_chunk_size - 12`` bytes, each
    prefixed magic(2) + message_id(8) + seq(1) + total(1).  Returns
    array<binary> (a single un-chunked element when the payload fits);
    more than 128 chunks is the reference's TooManyChunks error →
    NULL.  The reference draws a random message id; batch determinism
    derives it from xxhash64(payload) instead.  Pure JVM expressions —
    pairs with :func:`reassemble_gelf_chunks` for the round-trip."""
    if max_chunk_size < 13:
        raise ValueError("max_chunk_size must be at least 13 bytes")
    b = col.cast("binary")
    chunk_size = max_chunk_size - 12
    n = F.ceil(F.octet_length(b) / F.lit(chunk_size)).cast("int")
    msg_id = F.unhex(F.lpad(F.hex(F.xxhash64(b)), 16, "0"))
    byte = lambda c: F.unhex(F.lpad(F.hex(c), 2, "0"))  # noqa: E731
    chunks = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat(
            F.lit(GELF_MAGIC), msg_id, byte(i), byte(n),
            F.substring(b, i * chunk_size + 1, F.lit(chunk_size)),
        ),
    )
    return (
        F.when(F.octet_length(b) <= max_chunk_size, F.array(b))
        .when(n <= 128, chunks)
    )


def reassemble_gelf_chunks(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Chunked-GELF reassembly (framing/chunked_gelf.rs) as a pure
    DataFrame plan: chunk header = magic(2) + message_id(8) + seq(1) +
    total(1); chunks group by message_id, order by seq, and only
    complete groups (count == total) emit a message.  Unchunked
    payloads (no magic) pass through unchanged.  One shuffle on
    message_id."""
    p = F.col(payload_col)
    is_chunk = (F.octet_length(p) > 12) & (
        F.substring(p, 1, 2) == F.lit(GELF_MAGIC)
    )
    # seq/total are RAW BYTES (0..255, GELF allows up to 128 chunks):
    # decode numerically via hex — a binary→string cast mangles bytes
    # >= 0x80 (invalid standalone UTF-8 → U+FFFD → ascii() = 65533)
    def _byte_at(pos: int) -> Column:
        return F.conv(F.hex(F.substring(p, pos, 1)), 16, 10).cast("int")

    chunks = df.filter(is_chunk).select(
        F.hex(F.substring(p, 3, 8)).alias("_msg_id"),
        _byte_at(11).alias("_seq"),
        _byte_at(12).alias("_total"),
        F.substring(p, 13, 2_147_483_647).alias("_body"),
    )
    whole = df.filter(~is_chunk).select(p.alias("message"))
    assembled = (
        chunks.groupBy("_msg_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_seq"), F.col("_body")))
            ).alias("_parts"),
            F.max("_total").alias("_total"),
        )
        .filter(F.size("_parts") == F.col("_total"))
        .select(
            F.aggregate(
                F.col("_parts"),
                F.lit(b""),
                lambda acc, x: F.concat(acc, x["_body"]),
            ).alias("message")
        )
    )
    return whole.unionByName(assembled)


def reassemble_cri(
    df: DataFrame,
    *,
    group_by: list[str] = ("src", "stream"),
    ord_col: str = "line_no",
    decoded_col: str = "decoded",
) -> DataFrame:
    """Merge CRI partial lines (tag P) into full messages: a record is
    consecutive P lines closed by the F line — reduce's ends_when flush
    applied per (source file, stream).  Input: rows with the `cri`
    codec's decoded struct + an order column."""
    from vector_spark.operators.reduce import reduce_events, reduce_segments

    d = F.col(decoded_col)
    flat = df.select(
        *group_by,
        F.col(ord_col),
        d.getField("timestamp").alias("_ts"),
        d.getField("partial").alias("_partial"),
        d.getField("message").alias("_msg"),
    ).filter(F.col("_msg").isNotNull())
    seg = reduce_segments(
        flat, list(group_by), ord_col=ord_col,
        ends_when=~F.col("_partial"),
    )
    return (
        reduce_events(
            seg,
            group_by=list(group_by) + ["_segment"],
            strategies={"message": ("concat_raw", "_msg"),
                        "n_chunks": ("count", "_msg")},
            ord_col=ord_col,
            ts_col="_ts",
        )
        .withColumnRenamed("_ts", "timestamp")
        .drop("_segment", "_ts_end", "timestamp_end")
    )


def read_container_logs(spark: SparkSession, path: str) -> DataFrame:
    """Kubernetes container logs end to end: per-file ordered lines
    (wholetext split, same as read_text_multiline) → CRI decode →
    partial-line reassembly per (file, stream).  Output:
    (src, stream, message, n_chunks, timestamp)."""
    raw = spark.read.text(path, wholetext=True)
    lines = raw.select(
        F.input_file_name().alias("src"),
        F.posexplode(
            F.split(F.regexp_replace("value", r"\n$", ""), "\n")
        ).alias("line_no", "value"),
    )
    decoded = lines.withColumn(
        "decoded", _decode_cri(F.col("value"), None)
    ).withColumn("stream", F.col("decoded.stream"))
    return reassemble_cri(decoded)


def demo_logs(
    spark: SparkSession,
    n: int,
    fmt: str = "shuffle",
) -> DataFrame:
    """Synthetic log source — the reference's demo_logs
    (/root/reference/src/sources/demo_logs.rs:102-140; line shapes from
    lib/fakedata/src/logs.rs): formats apache_common | apache_error |
    json | logfmt ("shuffle" mixes them) | syslog (RFC 5424) |
    bsd_syslog (RFC 3164).  Deterministic (LCG-derived, no RNG), fully
    parallel `range(n)` generation; output is (ts timestamp,
    message string)."""
    from vector_spark.data.transcripts import transcripts_df

    t = transcripts_df(spark, n).select("ts", F.col("text").alias("message"))
    if fmt == "shuffle":
        return t
    if fmt == "apache_common":
        return t.filter(F.col("message").rlike(r"^\d+\."))
    if fmt == "json":
        return t.filter(F.col("message").startswith('{"'))
    if fmt == "logfmt":
        return t.filter(F.col("message").startswith("level="))
    if fmt == "apache_error":
        # apache_error_log_line (logs.rs:104-117):
        # [timestamp] [user:level] [pid P:tid] [client ip:port] message
        base = transcripts_df(spark, n)
        return base.select(
            "ts",
            F.concat(
                F.lit("["), F.date_format("ts", "EEE MMM dd HH:mm:ss yyyy"),
                F.lit("] [user"), (F.crc32("conv_id") % 1000).cast("string"),
                F.lit(":"),
                F.when(F.col("role") == "tool", "crit").otherwise("error"),
                F.lit("] [pid "), (F.crc32("conv_id") % 9000 + 100).cast("string"),
                F.lit(":tid] [client 10."),
                (F.crc32("conv_id") % 256).cast("string"), F.lit(".0."),
                F.pmod(F.col("turn_idx"), F.lit(256)).cast("string"),
                F.lit(":"), (F.pmod(F.col("turn_idx"), F.lit(60000)) + 1024)
                .cast("string"),
                F.lit("] "), F.regexp_replace(F.col("text"), r"\n", " "),
            ).alias("message"),
        )
    if fmt in ("syslog", "bsd_syslog"):
        # syslog = RFC 5424, bsd_syslog = RFC 3164 (demo_logs.rs:123-133)
        # — rendered by this repo's own encoder (encoding/format/syslog.rs
        # re-spec), derived from the same deterministic fields
        from vector_spark.functions.vrl import encode_syslog

        base = transcripts_df(spark, n)
        line = encode_syslog(
            F.regexp_replace(F.col("text"), r"\n", " "),
            rfc="rfc5424" if fmt == "syslog" else "rfc3164",
            facility=(F.crc32("conv_id") % 8 + 16).cast("int"),  # local0..7
            severity=F.lit(6),
            app_name=F.col("role"),
            proc_id=F.col("turn_idx").cast("string"),
            msg_id=F.concat(
                F.lit("ID"), (F.crc32("conv_id") % 999 + 1).cast("string")
            ),
            hostname=F.concat(
                F.lit("host"), (F.crc32("conv_id") % 100).cast("string")
            ),
            timestamp=F.col("ts"),
        )
        return base.select("ts", line.alias("message"))
    raise ValueError(f"unknown demo_logs format {fmt!r}")


def read_text_multiline(
    spark: SparkSession,
    path: str,
    start_pattern: str,
    *,
    mode: str = "halt_before",
    condition_pattern: str | None = None,
) -> DataFrame:
    """File source with multiline aggregation — the reference's file
    source `multiline` config (line_agg.rs for_legacy: marker +
    HaltBefore is the default in the wild).

    `spark.read.text` alone cannot express this: line order within a
    file is not a column, and a file may split across partitions.  So
    each file is read WHOLE (wholetext), split into ordered lines with
    posexplode, then assembled per file by :func:`line_agg` — records
    never span files, files process in parallel.  Suits log files
    (bounded per-file size); for huge single files pre-split upstream.
    """
    raw = spark.read.text(path, wholetext=True)
    lines = raw.select(
        F.input_file_name().alias("src"),
        F.posexplode(
            F.split(F.regexp_replace("value", r"\n$", ""), "\n")
        ).alias("line_no", "value"),
    )
    return line_agg(
        lines,
        start_pattern,
        group_by=["src"],
        order_by="line_no",
        mode=mode,
        condition_pattern=condition_pattern,
    )


def line_agg(
    df: DataFrame,
    start_pattern: str,
    *,
    group_by: list[str] = (),
    order_by: str = "line_no",
    line_col: str = "value",
    mode: str = "continue_through",
    condition_pattern: str | None = None,
) -> DataFrame:
    """Multiline assembly — the reference's line_agg
    (/root/reference/src/line_agg.rs:24-76, modes ContinueThrough |
    ContinuePast | HaltBefore | HaltWith).

    Batch re-expression: each line is classified as a record start via a
    lag window; record id = running count of starts within the ordered
    group; one groupBy concatenates each record in line order.  One
    shuffle on (group, record) — fully vectorized, no state machine.

    Per-mode start rules (condition ``C`` = ``condition_pattern``):

    - continue_through: record continues while lines match C; a start
      line need not match C (line_agg.rs:317-318).  Start = line does
      not match C... here expressed as line matching ``start_pattern``
      (the usual config has S and C complementary, e.g. stack traces:
      S=``^\\S``, C=``^\\s``).
    - continue_past: a C-match means the NEXT line still belongs to the
      record (line_agg.rs:321-322) → start = previous line did NOT
      match C.
    - halt_before: "all consecutive lines not matching this pattern are
      included in the group" (line_agg.rs:325-326, the legacy
      file-source default) → a line MATCHING C begins a new record.
    - halt_with: a C-match ENDS the record inclusively
      (line_agg.rs:329-330) → start = previous line matched C.

    Known divergence from the reference's streaming state machine
    (line_agg.rs:304-368), documented and covered by
    :func:`line_agg_exact`: in the VACANT state the reference emits a
    non-``start_pattern`` line as its own standalone record, while this
    path folds every line into some record.  With S matching all record
    openers (the usual config) the two agree on every mode — including
    continue_past/halt_with's first-line exemption (a buffer's first
    line is never evaluated against C, handled below by the
    alternating-run construction), which is property-tested against
    the exact state machine.
    """
    cond = condition_pattern or start_pattern
    w = W.partitionBy(*group_by).orderBy(order_by)
    cum = w.rowsBetween(W.unboundedPreceding, 0)
    prev = F.lag(F.col(line_col)).over(w)
    if mode == "continue_through":
        # every start-line begins a record; continuation lines don't match
        is_start = F.col(line_col).rlike(start_pattern)
        with_rec = df.withColumn(
            "_rec", F.sum(is_start.cast("int")).over(cum)
        )
    elif mode == "halt_before":
        # a line matching cond begins a new record; non-matching lines
        # are folded into the current one (line_agg.rs:325-326)
        is_start = prev.isNull() | F.col(line_col).rlike(cond)
        with_rec = df.withColumn(
            "_rec", F.sum(is_start.cast("int")).over(cum)
        )
    elif mode in ("continue_past", "halt_with"):
        # Decision table (line_agg.rs:321-330): while a buffer is open,
        # continue_past ENDS it (inclusive) at a line NOT matching C,
        # halt_with at a line matching C — but the buffer's FIRST line
        # is never evaluated (it was consumed by the vacant state), so
        # `start(i) = closes(i-1) AND NOT start(i-1)`; within a maximal
        # run of consecutive closes-candidates starts simply alternate.
        # Vectorized: run id = count of non-candidate rows, then parity
        # of the row position within the run.
        prev_match = F.lag(F.col(line_col).rlike(cond)).over(w)
        candidate = prev_match if mode == "halt_with" else ~prev_match
        closes = F.coalesce(candidate, F.lit(False))
        run = df.withColumn(
            "_run", F.sum((~closes).cast("int")).over(cum)
        )
        rw = W.partitionBy(*group_by, "_run").orderBy(order_by)
        rn = F.row_number().over(rw)
        is_start = F.when(F.col("_run") == 1, rn % 2 == 1).otherwise(
            (rn % 2 == 0) & (rn >= 2)
        )
        with_rec = run.withColumn(
            "_rec",
            F.sum(is_start.cast("int")).over(
                W.partitionBy(*group_by)
                .orderBy(order_by)
                .rowsBetween(W.unboundedPreceding, 0)
            ),
        ).drop("_run")
    else:
        raise ValueError(f"unknown line_agg mode {mode!r}")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(order_by).alias("o"), F.col(line_col).alias("v")))
    )
    return (
        with_rec.groupBy(*group_by, "_rec")
        .agg(
            F.array_join(
                F.transform(ordered, lambda s: s.getField("v")), "\n"
            ).alias("message"),
            F.min(order_by).alias(order_by),
        )
        .drop("_rec")
    )


def line_agg_exact(
    df: DataFrame,
    start_pattern: str,
    *,
    group_by: list[str] = (),
    order_by: str = "line_no",
    line_col: str = "value",
    mode: str = "continue_through",
    condition_pattern: str | None = None,
) -> DataFrame:
    """Bug-for-bug port of the reference line_agg state machine
    (/root/reference/src/line_agg.rs:304-368) as an ``applyInPandas``
    per-source-key scan.

    The reference processes each source key (file) sequentially; this
    does the same — groups (source keys) run in parallel across
    executors, lines within a group run through the exact
    vacant/occupied Decision table:

    - vacant + line matches start_pattern  → buffer the line
    - vacant + no match                    → emit the line standalone
    - occupied: (mode, condition_match) → Continue | EndInclude |
      EndExclude, with EndExclude re-processing the terminating line
      as if vacant (the "stash" path, line_agg.rs:247-280)
    - end-of-group drains the open buffer (line_agg.rs:206-219)

    Use :func:`line_agg` (pure window functions, no Python) for the
    scale path; this variant is the semantics oracle and the escape
    hatch for degenerate pattern configs.
    """
    import re

    import pandas as pd

    group_by = list(group_by)
    if not group_by:
        df = df.withColumn("_g", F.lit(1))
        gcols = ["_g"]
    else:
        gcols = group_by

    s_re = re.compile(start_pattern)
    c_re = re.compile(condition_pattern or start_pattern)
    if mode not in ("continue_through", "continue_past",
                    "halt_before", "halt_with"):
        raise ValueError(f"unknown line_agg mode {mode!r}")
    mode_ = mode

    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"`{c}` {fields[c]}" for c in gcols]
        + ["message string", f"`{order_by}` {fields[order_by]}"]
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by)
        lines = pdf[line_col].tolist()
        ords = pdf[order_by].tolist()
        gvals = [pdf[c].iloc[0] for c in gcols]
        out_msg: list[str] = []
        out_ord: list = []
        buf: list[str] = []
        buf_ord = None

        def flush():
            nonlocal buf, buf_ord
            if buf:
                out_msg.append("\n".join(buf))
                out_ord.append(buf_ord)
                buf, buf_ord = [], None

        def fresh(line: str, o) -> None:
            nonlocal buf, buf_ord
            if s_re.search(line):
                buf, buf_ord = [line], o
            else:
                out_msg.append(line)
                out_ord.append(o)

        for line, o in zip(lines, ords):
            if not buf:
                fresh(line, o)
                continue
            m = bool(c_re.search(line))
            if mode_ == "continue_through":
                decision = "continue" if m else "end_exclude"
            elif mode_ == "continue_past":
                decision = "continue" if m else "end_include"
            elif mode_ == "halt_before":
                decision = "end_exclude" if m else "continue"
            else:  # halt_with
                decision = "end_include" if m else "continue"
            if decision == "continue":
                buf.append(line)
            elif decision == "end_include":
                buf.append(line)
                flush()
            else:  # end_exclude: flush, then re-process line as vacant
                flush()
                fresh(line, o)
        flush()

        data = {c: [v] * len(out_msg) for c, v in zip(gcols, gvals)}
        data["message"] = out_msg
        data[order_by] = out_ord
        return pd.DataFrame(data)

    out = df.groupBy(*gcols).applyInPandas(assemble, schema=out_schema)
    return out.drop("_g") if not group_by else out
