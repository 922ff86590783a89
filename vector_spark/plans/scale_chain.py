"""The reference's own scaling-regression pipeline, re-expressed.

This is a faithful Spark-first translation of
/root/reference/regression/cases/scale_sync_only_8_cpu/vector/vector.yaml
— the 12-step sync remap chain (parse_json → parse_grok(nginx) →
parse_xml → hostname/env/static stamps → renames → ddtags filter →
service filter → per-service sample → severity classify → field
drops) that the reference runs at 1 CPU vs 8 CPU as its two-size
scaling experiment.  Having the SAME DAG here makes the scaling
comparison apples-to-apples: `bench.py` times it, `scaling_bench.py`
can run it at two core counts.

Every step is built-in Column expressions (the VRL program surface
maps 1:1 onto vector_spark.functions.vrl helpers); the whole chain is
one narrow stage — zero shuffles until a sink aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vector_spark.functions.parse import APACHE_ANCHORED, APACHE_FIELDS

_SERVICES = ["api-service", "auth-service", "internal-metrics-agent",
             "billing-service"]
_EXCLUDED_TAGS = ["filename", "container_id", "image_id", "docker_image"]


def synth_scale_events(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic stand-in for the lading HTTP load template:
    (raw_message json, message nginx line, raw_xml, host, region,
    ddtags, service, level, span_id)."""
    r = spark.range(n).select(
        "id",
        ((F.col("id") * 2654435761) % 2147483647).alias("r1"),
        ((F.col("id") * 1103515245 + 12345) % 2147483647).alias("r2"),
    )
    svc = F.element_at(
        F.array(*[F.lit(s) for s in _SERVICES]),
        (F.col("r1") % 4 + 1).cast("int"),
    )
    return r.select(
        F.col("id").alias("event_id"),
        F.concat(
            F.lit('{"app": "demo", "attempt": '),
            (F.col("r2") % 5).cast("string"), F.lit("}"),
        ).alias("raw_message"),
        F.concat(
            F.lit("10."), (F.col("r1") % 256).cast("string"),
            F.lit(".0."), (F.col("r2") % 256).cast("string"),
            F.lit(" - user"), (F.col("r1") % 1000).cast("string"),
            F.lit(' [01/Jan/2026:00:00:00 +0000] "GET /'), svc,
            F.lit('/x HTTP/1.1" '),
            F.when(F.col("r2") % 10 < 9, 200).otherwise(500).cast("string"),
            F.lit(" "), (F.col("r1") % 100000).cast("string"),
        ).alias("message"),
        F.concat(
            F.lit('<event code="'), (F.col("r1") % 100).cast("string"),
            F.lit('"><kind>sync</kind></event>'),
        ).alias("raw_xml"),
        F.concat(F.lit("host-"), (F.col("r2") % 50).cast("string")).alias("host"),
        F.lit("us-east-1").alias("region"),
        F.array(
            F.concat(F.lit("env:prod")),
            F.concat(F.lit("filename:/var/log/"), svc),
            F.concat(F.lit("team:t"), (F.col("r1") % 5).cast("string")),
            F.concat(F.lit("container_id:c"), (F.col("r2") % 9).cast("string")),
        ).alias("ddtags"),
        svc.alias("service"),
        F.lit("info").alias("level"),
        F.concat(F.lit("span-"), F.col("id").cast("string")).alias("span_id"),
    )


def scale_chain(df: DataFrame, *, portable_sample: bool = False) -> DataFrame:
    """The 12 transforms, in the reference's order.
    ``portable_sample`` swaps xxhash64 for the md5-prefix hash so the
    DuckDB oracle can replicate the sampling decision."""
    from vector_spark.functions import vrl

    # 1. parse_raw_message: JSON → nested object (kept when parseable)
    parsed_msg = F.from_json("raw_message", "app string, attempt int")
    df = df.withColumn(
        "raw_message_obj",
        F.when(parsed_msg.isNotNull(), parsed_msg),
    )
    # 2. parse_nginx_log via the grok-compiled access-log regex
    grok = vrl.parse_regex(F.col("message"), APACHE_ANCHORED, APACHE_FIELDS)
    df = df.withColumn(
        "http",
        F.when(
            grok.isNotNull(),
            F.struct(
                grok.getField("client_ip").alias("client_ip"),
                grok.getField("http_method").alias("method"),
                grok.getField("http_url").alias("url"),
                vrl.coalesce_or(
                    grok.getField("http_status").try_cast("int"), 0
                ).alias("status"),
                vrl.coalesce_or(
                    grok.getField("http_bytes").try_cast("long"), 0
                ).alias("bytes"),
            ),
        ),
    ).withColumn("log_timestamp", grok.getField("log_time"))
    # 3. parse_raw_xml
    df = df.withColumn(
        "raw_xml_obj",
        vrl.parse_xml(F.col("raw_xml"), "_code int, kind string"),
    )
    # 4-5. hostname + pipeline env (driver-resolved, like the reference)
    df = df.withColumn("hostname", vrl.get_hostname())
    df = df.withColumn("pipeline_env", vrl.get_env_var("PIPELINE_ENV", "unknown"))
    # 6. static fields
    df = df.withColumn("pipeline_stage", F.lit("ingested")).withColumn(
        "region_canonical", F.lit("us-east-1-prod")
    )
    # 7. renames (del + set)
    df = df.withColumnRenamed("host", "src_host").withColumnRenamed(
        "region", "geo_region"
    )
    # 8. ddtags noise filter (split key, excluded list)
    df = df.withColumn(
        "ddtags",
        F.filter(
            F.col("ddtags"),
            lambda tag: ~F.split(tag, ":", 2).getItem(0).isin(_EXCLUDED_TAGS),
        ),
    )
    # 9. all-pass service filter
    df = df.filter(F.col("service").isin(_SERVICES))
    # 10. sample 50% per service (hash-consistent group_by sampling)
    from vector_spark.operators.sample import sample

    df = sample(df, rate=2, key_field="event_id", group_by=["service"],
                stamp=False, portable=portable_sample)
    # 11. severity classification
    msg_low = F.lower(F.col("message"))
    df = df.withColumn(
        "severity_class",
        F.when(
            F.col("level").isin("error", "err", "fatal", "critical")
            | msg_low.contains("error") | msg_low.contains("failed"),
            "error",
        )
        .when(
            F.col("level").isin("warn", "warning")
            | msg_low.contains("deprecated"),
            "warning",
        )
        .otherwise("info"),
    ).withColumn("processed_by", F.lit("scale_sync_only"))
    # 12. field drops
    return df.drop("span_id", "region_canonical")
