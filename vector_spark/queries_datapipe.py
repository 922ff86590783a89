"""Driver-contract queries for the training-data operators
(documents/embeddings tables), each with a DuckDB oracle generated from
the SAME constants as the Spark implementation (no drift possible).

DuckDB notes encoded here:
- regexp_replace needs the 'g' flag (Spark replaces all by default);
- scalar range(n) yields a list; unnest() explodes it;
- list indexing is 1-based;
- md5-hex prefix parses to BIGINT via try_cast('0x...').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vector_spark.datapipe.dedup import (
    HASH_MOD,
    LSH_BANDS,
    MINHASH_COEFFS,
    MINHASH_P,
    SIMHASH_BITS,
    connected_components,
    dedup_incremental,
    exact_dedup,
    jaccard_pairs,
    lsh_candidates,
    minhash_signatures,
    simhash,
)
from vector_spark.datapipe.similarity import ann_topk, cosine_topk
from vector_spark.datapipe.text import (
    LANG_MARKERS,
    TOKEN_PATTERN,
    analyze_documents,
    gopher_quality_flags,
    repetition_metrics,
)
from vector_spark.registry import register

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB)

_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_H60 = "try_cast(concat('0x', substr(md5({e}), 1, 15)) AS BIGINT)"

#: duplicate-injected corpus: every 10th doc cloned exactly (id+1000000),
#: every 7th doc cloned with a textual perturbation (id+2000000)
_DUP_CTE = """
WITH dup AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, concat(text, ' zz perturbed tail') AS text
  FROM documents WHERE doc_id % 7 = 0
)"""

def _grams_sql(n: int, src: str) -> str:
    """The ONE word-n-gram unnest construction every oracle shares
    (mirrors dedup._gram_index + shingles): selects ``src``'s columns
    plus ``gram``; the greatest(...,0) clamp is the short-doc guard —
    change it here and nowhere else."""
    cols = ", ".join(f"ws[i + {j + 1}]" for j in range(n))
    return (
        f"SELECT *, unnest(list_transform(range(greatest(len(ws) - {n - 1}, 0)),"
        f" i -> concat_ws(' ', {cols}))) AS gram FROM {src}"
    )


_SHINGLE_CTE = f""",
norm AS (SELECT doc_id, {_NORM} AS t FROM dup),
w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
grams AS ({_grams_sql(3, 'w')}),
sh AS (
  SELECT DISTINCT doc_id, {_H60.format(e='gram')} % {HASH_MOD} AS h FROM grams
)"""


def _dup_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    exact = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    near = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2000000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zz perturbed tail")))
    )
    return docs.unionByName(exact).unionByName(near)


# ---------------------------------------------------------------------------
# exact dedup


@register(
    "doc_exact_dedup",
    _DUP_CTE
    + f""",
h AS (SELECT doc_id, {_H60.format(e=_NORM)} AS hh FROM dup),
rn AS (SELECT doc_id, row_number() OVER (PARTITION BY hh ORDER BY doc_id) AS rn FROM h)
SELECT doc_id FROM rn WHERE rn = 1""",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_dup_df(spark, sf_dir)).select("doc_id")


# ---------------------------------------------------------------------------
# minhash signatures + LSH candidates + verified near-dup pairs


def _sig_sql(keys: str = "doc_id") -> str:
    """The ONE minhash-aggregate rendering every oracle shares; ``keys``
    adds grouping columns (the incremental oracle groups by
    (side, doc_id)) so there is a single render site for the
    permutation constants."""
    aggs = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{j}"
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    )
    return f",\nsigs AS (SELECT {keys}, {aggs} FROM sh GROUP BY {keys})"


def _bands_sql(keys: str = "doc_id") -> str:
    """The ONE band-key rendering (same single-render-site rule)."""
    rows = len(MINHASH_COEFFS) // LSH_BANDS
    parts = []
    for b in range(LSH_BANDS):
        cols = ", ".join(f"mh{j}" for j in range(b * rows, (b + 1) * rows))
        parts.append(
            f"SELECT {keys}, concat_ws('_', '{b}', {cols}) AS band_key"
            " FROM sigs"
        )
    return ",\nbands AS (" + " UNION ALL ".join(parts) + ")"


_CAND_SQL = """,
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band_key)
  WHERE a.doc_id < b.doc_id
)"""

_JACCARD_SQL = """,
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b USING (h)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT c.id_a, c.id_b,
         round(i / (za.sz + zb.sz - i), 6) AS jaccard
  FROM cand c
  JOIN inter USING (id_a, id_b)
  JOIN sz za ON za.doc_id = c.id_a
  JOIN sz zb ON zb.doc_id = c.id_b
)"""


@register(
    "doc_minhash_lsh_pairs",
    _DUP_CTE + _SHINGLE_CTE + _sig_sql() + _bands_sql() + _CAND_SQL
    + _JACCARD_SQL
    + "\nSELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5",
)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_bucket=None: the DuckDB oracle models no bucket cap, so the
    # gated query must run the exact (uncapped) semantics — the cap is
    # the production default, not part of the verified definition
    dup = _dup_df(spark, sf_dir)
    sigs = minhash_signatures(dup)
    cand = lsh_candidates(sigs, max_bucket=None)
    return jaccard_pairs(dup, cand, threshold=0.5)


@register(
    "doc_near_dedup_corpus",
    _DUP_CTE + _SHINGLE_CTE + _sig_sql() + _bands_sql() + _CAND_SQL
    + _JACCARD_SQL
    + """,
kill AS (SELECT DISTINCT id_b AS doc_id FROM scored WHERE jaccard >= 0.8)
SELECT CAST(count(*) AS BIGINT) AS n_surviving,
       CAST(sum(d.doc_id) AS BIGINT) AS survivors_checksum
FROM dup d LEFT JOIN kill k ON d.doc_id = k.doc_id
WHERE k.doc_id IS NULL""",
)
def q_near_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data near-dedup pipeline: minhash →
    LSH candidates → exact-jaccard rescore ≥ 0.8 → kill the higher id
    of each duplicate pair → anti-join the kill list.  One checksum row
    puts the WHOLE path (not just the pair list) under the hash gate."""
    dup = _dup_df(spark, sf_dir)
    sigs = minhash_signatures(dup)
    cand = lsh_candidates(sigs, max_bucket=None)  # uncapped: see q_minhash_lsh
    pairs = jaccard_pairs(dup, cand, threshold=0.8)
    kill = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    surviving = dup.join(kill, "doc_id", "left_anti")
    return surviving.agg(
        F.count(F.lit(1)).alias("n_surviving"),
        F.sum("doc_id").alias("survivors_checksum"),
    )


@register(
    "doc_dup_clusters",
    # WITH RECURSIVE prefixes the WHOLE CTE list (Postgres/DuckDB
    # semantics: non-recursive members are unaffected); only `reach`
    # recurses.  UNION (not UNION ALL) dedups (id, root) rows, so the
    # closure terminates.
    _DUP_CTE.replace("WITH dup", "WITH RECURSIVE dup", 1)
    + _SHINGLE_CTE + _sig_sql() + _bands_sql() + _CAND_SQL + _JACCARD_SQL
    + """,
edges AS (
  SELECT id_a AS u, id_b AS v FROM scored WHERE jaccard >= 0.8
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM scored WHERE jaccard >= 0.8
),
reach AS (
  SELECT DISTINCT u AS id, u AS root FROM edges
  UNION
  SELECT e.v AS id, r.root FROM reach r JOIN edges e ON e.u = r.id
),
comps AS (SELECT id, min(root) AS cluster_id FROM reach GROUP BY id)
SELECT cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(id) AS BIGINT) AS members_checksum
FROM comps GROUP BY cluster_id""",
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate GROUPS, not just pairs: minhash → LSH → exact-jaccard
    rescore ≥ 0.8 → connected components (iterative min-label
    propagation, datapipe/dedup.py) → one row per cluster.  The oracle
    computes the same components as a recursive-CTE transitive closure,
    so the clustering itself — not only the pair list — is under the
    hash gate."""
    dup = _dup_df(spark, sf_dir)
    sigs = minhash_signatures(dup)
    cand = lsh_candidates(sigs, max_bucket=None)  # uncapped: see q_minhash_lsh
    pairs = jaccard_pairs(dup, cand, threshold=0.8)
    comp = connected_components(pairs)
    return comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("id").alias("members_checksum"),
    )


# ---------------------------------------------------------------------------
# sequence packing (concat-then-chunk pretraining layout)


@register(
    "doc_sequence_packing",
    f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
pref AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT)
           AS token_offset
  FROM toks
),
packed AS (SELECT *, token_offset // 512 AS seq_id FROM pref)
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS anchored_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM packed GROUP BY seq_id""",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing at a 512-token budget, rolled up per
    sequence.  The Spark side runs the distributed two-phase prefix
    sum (bucketed cumsum + broadcast offsets — no global window); the
    oracle is the plain global-window cumsum, which must agree
    bit-for-bit because the result is partitioning-independent."""
    from vector_spark.datapipe.packing import pack_sequences, sequence_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return sequence_stats(pack_sequences(docs, budget=512))


# ---------------------------------------------------------------------------
# incremental (cross-snapshot) dedup: snapshot vs corpus index


def _incr_sql() -> str:
    """Side-aware rendering of the exact + minhash-LSH + jaccard chain
    for the snapshot-vs-corpus case ('c' = corpus, 'n' = phase-1
    snapshot survivors).  The sig/band CTEs come from the SHARED
    renderers (keys="side, doc_id") — one render site per constant;
    only the asymmetric candidate/jaccard joins are bespoke."""
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
snap AS (
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, concat(text, ' zz perturbed tail') AS text
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         concat('fresh snapshot document number ', doc_id + 3000000,
                ' with wholly original content') AS text
  FROM documents WHERE doc_id % 13 = 0
),
ch AS (SELECT DISTINCT {_H60.format(e=_NORM)} AS text_h FROM corpus),
s1 AS (
  SELECT snap.doc_id, snap.text FROM snap
  LEFT JOIN ch ON {_H60.format(e=_NORM)} = ch.text_h
  WHERE ch.text_h IS NULL
),
all_docs AS (
  SELECT 'c' AS side, doc_id, text FROM corpus
  UNION ALL
  SELECT 'n' AS side, doc_id, text FROM s1
),
norm AS (SELECT side, doc_id, {_NORM} AS t FROM all_docs),
w AS (SELECT side, doc_id, string_split(t, ' ') AS ws FROM norm),
grams AS ({_grams_sql(3, 'w')}),
sh AS (
  SELECT DISTINCT side, doc_id, {_H60.format(e='gram')} % {HASH_MOD} AS h
  FROM grams
){_sig_sql("side, doc_id")}{_bands_sql("side, doc_id")},
cand AS (
  SELECT DISTINCT nb.doc_id AS new_id, cb.doc_id AS corpus_id
  FROM bands nb JOIN bands cb USING (band_key)
  WHERE nb.side = 'n' AND cb.side = 'c'
),
sz AS (SELECT side, doc_id, count(*) AS sz FROM sh GROUP BY 1, 2),
inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, count(*) AS i
  FROM sh a JOIN sh b USING (h)
  WHERE a.side = 'n' AND b.side = 'c'
  GROUP BY 1, 2
),
scored AS (
  SELECT c.new_id, round(i / (zn.sz + zc.sz - i), 6) AS jaccard
  FROM cand c
  JOIN inter USING (new_id, corpus_id)
  JOIN sz zn ON zn.side = 'n' AND zn.doc_id = c.new_id
  JOIN sz zc ON zc.side = 'c' AND zc.doc_id = c.corpus_id
),
kill AS (SELECT DISTINCT new_id FROM scored WHERE jaccard >= 0.8)
SELECT CAST(count(*) AS BIGINT) AS n_ingested,
       CAST(sum(s1.doc_id) AS BIGINT) AS ingested_checksum
FROM s1 LEFT JOIN kill k ON s1.doc_id = k.new_id
WHERE k.new_id IS NULL"""


def _snapshot_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic ingest snapshot: exact clones of every 10th corpus doc,
    near clones (perturbed tail) of every 7th, and genuinely new docs
    for every 13th id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    exact = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    near = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2000000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zz perturbed tail")))
    )
    fresh = (
        docs.filter(F.col("doc_id") % 13 == 0)
        .withColumn("doc_id", F.col("doc_id") + 3000000)
        .withColumn(
            "text",
            F.concat(
                F.lit("fresh snapshot document number "),
                F.col("doc_id").cast("string"),
                F.lit(" with wholly original content"),
            ),
        )
    )
    return exact.unionByName(near).unionByName(fresh)


@register("doc_incremental_dedup", _incr_sql())
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-ingest dedup against the existing corpus: exact-hash
    anti-join, then minhash-LSH candidates vs the corpus band index,
    exact cross-set jaccard rescore ≥ 0.8 — one checksum row puts the
    whole accepted-snapshot set under the hash gate."""
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    snap = _snapshot_df(spark, sf_dir)
    # uncapped: the oracle models no bucket cap (see q_minhash_lsh)
    ingested = dedup_incremental(snap, corpus, threshold=0.8, max_bucket=None)
    return ingested.agg(
        F.count(F.lit(1)).alias("n_ingested"),
        F.sum("doc_id").alias("ingested_checksum"),
    )


@register(
    "doc_minhash_signatures",
    _DUP_CTE + _SHINGLE_CTE + _sig_sql()
    + "\nSELECT doc_id, "
    + ", ".join(f"mh{j}" for j in range(len(MINHASH_COEFFS)))
    + " FROM sigs",
)
def q_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(_dup_df(spark, sf_dir))


# ---------------------------------------------------------------------------
# simhash


@register(
    "doc_simhash",
    _DUP_CTE + _SHINGLE_CTE
    + f""",
bits AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM sh CROSS JOIN (SELECT unnest(range({SIMHASH_BITS})) AS bit)
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id""",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_dup_df(spark, sf_dir))


# ---------------------------------------------------------------------------
# text analysis


def _langid_sql() -> str:
    """Nested CASE replicating text.lang_id's argmax-with-first-wins."""
    hits = {
        lang: (
            "len(list_filter(string_split({norm}, ' '), "
            f"x -> x IN ({', '.join(repr(m) for m in LANG_MARKERS[lang])})))"
        ).format(norm=_NORM)
        for lang in sorted(LANG_MARKERS)
    }
    # iterative argmax: best = lang if hits > best_hits
    expr_lang, expr_hits = "'und'", "0"
    for lang in sorted(LANG_MARKERS):
        h = hits[lang]
        expr_lang = f"CASE WHEN {h} > {expr_hits} THEN '{lang}' ELSE {expr_lang} END"
        expr_hits = f"CASE WHEN {h} > {expr_hits} THEN {h} ELSE {expr_hits} END"
    return expr_lang


@register(
    "doc_text_analysis",
    f"""
SELECT doc_id,
  len(string_split({_NORM}, ' ')) AS n_tokens,
  len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens_bpe,
  round((
    CASE WHEN length(text) >= 20 AND length(text) <= 20000 THEN 1 ELSE 0 END +
    CASE WHEN length(text) / greatest(len(string_split({_NORM}, ' ')), 1) >= 2.0
          AND length(text) / greatest(len(string_split({_NORM}, ' ')), 1) <= 12.0
         THEN 1 ELSE 0 END +
    CASE WHEN len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(length(text), 1) <= 0.2
         THEN 1 ELSE 0 END) / 3.0, 6) AS quality,
  {_langid_sql()} AS pred_lang,
  {_H60.format(e=_NORM)} AS fingerprint
FROM documents""",
)
def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return analyze_documents(docs).select(
        "doc_id", "n_tokens", "n_tokens_bpe", "quality", "pred_lang",
        "fingerprint",
    )


# ---------------------------------------------------------------------------
# embedding similarity


@register(
    "emb_cosine_topk",
    """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
v AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS vv FROM embeddings),
s AS (
  SELECT qid AS query_id, nid AS neighbor_id,
         round(list_dot_product(qv, vv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(vv, vv))), 6) AS cos
  FROM v CROSS JOIN q WHERE nid <> qid
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM s
)
SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 10""",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, k=10)


# the three approximate-ANN paths carry FULL hash oracles as of round
# 5: LSH buckets replay the LCG planes in SQL (the near-dup precedent);
# IVF/PQ use PINNED offline-trained quantizer constants (the
# deployment shape — train once, serve everywhere) so assignment /
# encode / ADC / refine are pure functions the oracle re-derives from
# the same literals.  Guard tests re-run the trainers at sf0.01 and
# assert equality with the pins; recall gates vs exact cosine remain
# in tests/test_datapipe.py.

_NEAR_DUP_PLANES = 8
_NEAR_DUP_TABLES = 8
_EMB_DIM = 64


def _plane_sql(pid: int) -> str:
    """DuckDB rendering of similarity._plane's LCG (identical doubles:
    same integer arithmetic, same correctly-rounded /, *, -)."""
    return (
        f"list_transform(range({_EMB_DIM}), d -> "
        f"((({pid} * 2654435761 + d * 1103515245 + 12345) % 2147483647)"
        " / 2147483647.0) * 2.0 - 1.0)"
    )


def _buckets_sql(src: str = "aug") -> str:
    parts = []
    for t in range(_NEAR_DUP_TABLES):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(e, {_plane_sql(t * 1000 + p)}) > 0"
            f" THEN {1 << p} ELSE 0 END)"
            for p in range(_NEAR_DUP_PLANES)
        )
        parts.append(
            f"SELECT vec_id, concat_ws(':', '{t}', CAST({bits} AS BIGINT))"
            f" AS bucket FROM {src}"
        )
    return ",\nbuckets AS (" + "\nUNION ALL\n".join(parts) + ")"


_COS6 = (
    "round(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b}))), 6)"
)
_TOPK_TAIL = """,
r AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM s
)
SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 10"""


def _ann_topk_sql() -> str:
    """Replay ann_topk: LCG hyperplane buckets (8 tables x 8 planes)
    -> bucket-collision candidates (deduped) -> exact cosine -> top-10
    by (cos DESC, neighbor_id)."""
    return (
        "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e"
        " FROM embeddings)"
        + _buckets_sql(src="v")
        + f""",
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
  FROM buckets q JOIN buckets n USING (bucket)
  WHERE q.vec_id < 5 AND n.vec_id <> q.vec_id
),
s AS (
  SELECT c.query_id, c.neighbor_id,
         {_COS6.format(a="a.e", b="b.e")} AS cos
  FROM cand c
  JOIN v a ON a.vec_id = c.query_id
  JOIN v b ON b.vec_id = c.neighbor_id
)""" + _TOPK_TAIL
    )


@register("emb_ann_topk", _ann_topk_sql())
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    return ann_topk(emb, queries, k=10)


def _pq_topk_sql() -> str:
    """Replay pq_topk from the pinned codebooks: normalize -> per-
    subspace nearest-centroid codes (round-12 L2, ties -> lowest code)
    -> round-9 ADC lookup tables -> round-6 ADC shortlist (top-50 by
    score DESC, neighbor ASC) -> exact-cosine re-rank top-10."""
    from vector_spark.data.ann_fixtures import PQ_CODEBOOKS

    pqc_rows = ", ".join(
        f"({mi}, {c}, [{', '.join(repr(x) for x in cv)}]::DOUBLE[])"
        for mi, book in enumerate(PQ_CODEBOOKS)
        for c, cv in enumerate(book)
    )
    sub_d2 = " + ".join(
        f"(nv[mi*4+{j}] - cv[{j}]) * (nv[mi*4+{j}] - cv[{j}])"
        for j in range(1, 5)
    )
    sub_dot = " + ".join(f"nv[mi*4+{j}] * cv[{j}]" for j in range(1, 5))
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
vn AS (
  SELECT vec_id, e, list_transform(e,
    x -> x / greatest(sqrt(list_dot_product(e, e)), 1e-12)) AS nv
  FROM v
),
pqc(mi, c, cv) AS (VALUES {pqc_rows}),
d2 AS (
  SELECT vec_id, mi, c, round({sub_d2}, 12) AS d
  FROM vn CROSS JOIN pqc
),
codes AS (
  SELECT vec_id, mi, c AS code FROM (
    SELECT vec_id, mi, c, row_number() OVER (
      PARTITION BY vec_id, mi ORDER BY d ASC, c ASC) AS rk
    FROM d2
  ) WHERE rk = 1
),
lut AS (
  SELECT vec_id AS qid, mi, c, round({sub_dot}, 9) AS lv
  FROM vn CROSS JOIN pqc WHERE vec_id < 5
),
adc AS (
  SELECT l.qid AS query_id, cd.vec_id AS neighbor_id,
         round(sum(l.lv), 6) AS a
  FROM codes cd JOIN lut l ON l.mi = cd.mi AND l.c = cd.code
  WHERE cd.vec_id <> l.qid
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY a DESC, neighbor_id) AS rr
    FROM adc
  ) WHERE rr <= 50
),
s AS (
  SELECT sh.query_id, sh.neighbor_id,
         {_COS6.format(a="a.e", b="b.e")} AS cos
  FROM short sh
  JOIN v a ON a.vec_id = sh.query_id
  JOIN v b ON b.vec_id = sh.neighbor_id
)""" + _TOPK_TAIL


@register("emb_pq_topk", _pq_topk_sql())
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-k with exact refine (datapipe/similarity.py:pq_topk):
    the corpus side scans 16-byte codes, the ADC top-50 re-rank
    exactly.  Pinned offline-trained codebooks (data/ann_fixtures.py)
    make the full path hash-gateable; recall gate vs brute force stays
    in tests/test_datapipe.py::test_pq_recall_vs_exact."""
    from vector_spark.data.ann_fixtures import PQ_CODEBOOKS
    from vector_spark.datapipe.similarity import pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    return pq_topk(emb, queries, k=10, codebooks=PQ_CODEBOOKS,
                   m=16, ksub=16, refine=50)


def _ivf_topk_sql() -> str:
    """Replay ivf_topk from the pinned centroids: round-9 cosine
    assignment (vectors -> 1 list, queries -> 6 probes; ties -> higher
    list id, matching reverse(array_sort)) -> equi-join on list id ->
    exact cosine top-10."""
    from vector_spark.data.ann_fixtures import IVF_CENTROIDS

    cent_rows = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in cv)}]::DOUBLE[])"
        for i, cv in enumerate(IVF_CENTROIDS)
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents(c, cv) AS (VALUES {cent_rows}),
sims AS (
  SELECT v.vec_id, cents.c,
         round(list_dot_product(e, cv) / (sqrt(list_dot_product(e, e))
               * sqrt(list_dot_product(cv, cv))), 9) AS sim
  FROM v CROSS JOIN cents
),
ranked AS (
  SELECT vec_id, c, row_number() OVER (
    PARTITION BY vec_id ORDER BY sim DESC, c DESC) AS rk
  FROM sims
),
vassign AS (SELECT vec_id, c AS ivf_list FROM ranked WHERE rk = 1),
qassign AS (
  SELECT vec_id, c AS ivf_list FROM ranked WHERE rk <= 6 AND vec_id < 5
),
s AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         {_COS6.format(a="a.e", b="b.e")} AS cos
  FROM qassign q JOIN vassign n USING (ivf_list)
  JOIN v a ON a.vec_id = q.vec_id
  JOIN v b ON b.vec_id = n.vec_id
  WHERE n.vec_id <> q.vec_id
)""" + _TOPK_TAIL


@register("emb_ivf_topk", _ivf_topk_sql())
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (second scale path next to LSH);
    pinned offline-trained centroids (data/ann_fixtures.py) make the
    assignment + probe + re-rank path hash-gateable; recall gate stays
    in tests/test_datapipe.py."""
    from vector_spark.data.ann_fixtures import IVF_CENTROIDS
    from vector_spark.datapipe.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, k=10, centroids=IVF_CENTROIDS,
                    n_probe=6)


# int8 scalar quantization: floor(x/maxabs*127 + 0.5) — floor(+0.5), not
# round(), so both engines produce bit-identical codes from identical
# doubles; the integer dot product is then exact in both.
_SQ8 = (
    "list_transform(embedding::DOUBLE[], x -> floor(x / "
    "greatest(list_aggregate(list_transform(embedding::DOUBLE[], "
    "y -> abs(y)), 'max'), 1e-30) * 127.0 + 0.5))"
)


@register(
    "emb_sq8_topk",
    f"""
WITH q AS (SELECT vec_id AS query_id, {_SQ8} AS qq FROM embeddings WHERE vec_id < 5),
v AS (SELECT vec_id AS neighbor_id, {_SQ8} AS vq FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         CAST(list_dot_product(qq, vq) AS BIGINT) AS iscore,
         list_dot_product(qq, vq) /
           (sqrt(list_dot_product(qq, qq)) * sqrt(list_dot_product(vq, vq))) AS c
  FROM v CROSS JOIN q WHERE neighbor_id <> query_id
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INT) AS rank
  FROM s
)
SELECT query_id, neighbor_id, iscore, round(c, 6) AS cos_q, rank FROM r WHERE rank <= 10""",
)
def q_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k on int8-quantized codes (4× smaller scan/shuffle footprint
    at 100 TB); the quantization arithmetic and the integer dot product
    are engine-exact, so this approximate-by-construction path still
    carries a full value-hash oracle."""
    from vector_spark.datapipe.similarity import sq8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    return sq8_topk(emb, queries, k=10)


# near-dup pairs: the corpus is augmented with deterministic perturbed
# clones (every 10th vector, elements scaled by 0.99/1.0/1.01 cyclically
# → cos ~0.9999 vs source) because the raw synthetic embeddings contain
# no true near-dups (max pairwise cos ~0.51).  Candidates come from the
# SAME deterministic hyperplane-LSH buckets on both sides — the oracle
# recomputes the planes from the LCG formula, so the bucket join, not
# just the rescoring, is under the correctness gate.  NO all-pairs
# cross join anywhere (VERDICT r1: the previous exact version was the
# scale-killer).

_AUG_SQL = """
WITH aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(range(64),
           i -> embedding[i + 1]::DOUBLE * (1.0 + ((i % 3) - 1) * 0.01)) AS e
  FROM embeddings WHERE vec_id % 10 = 0
)"""


def _aug_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    clones = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            * (F.lit(1.0) + ((i % 3) - 1) * F.lit(0.01)),
        ).alias("embedding"),
    )
    return base.unionByName(clones)


@register(
    "emb_near_dup_pairs",
    _AUG_SQL + _buckets_sql()
    + """,
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b USING (bucket)
  WHERE a.vec_id < b.vec_id
),
s AS (
  SELECT c.id_a, c.id_b,
         round(list_dot_product(va.e, vb.e) /
               (sqrt(list_dot_product(va.e, va.e)) *
                sqrt(list_dot_product(vb.e, vb.e))), 6) AS cos
  FROM cand c
  JOIN aug va ON va.vec_id = c.id_a
  JOIN aug vb ON vb.vec_id = c.id_b
)
SELECT id_a, id_b, cos FROM s WHERE cos >= 0.9""",
)
def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: LSH-bucket candidates + exact rescore
    (scale path); all-pairs exact is the test-time verifier only."""
    from vector_spark.datapipe.similarity import near_dup_pairs

    return near_dup_pairs(
        _aug_emb(spark, sf_dir),
        threshold=0.9,
        n_planes=_NEAR_DUP_PLANES,
        n_tables=_NEAR_DUP_TABLES,
        dim=_EMB_DIM,
    )


@register(
    "emb_near_dedup_corpus",
    _AUG_SQL + _buckets_sql()
    + """,
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b USING (bucket)
  WHERE a.vec_id < b.vec_id
),
s AS (
  SELECT c.id_a, c.id_b,
         round(list_dot_product(va.e, vb.e) /
               (sqrt(list_dot_product(va.e, va.e)) *
                sqrt(list_dot_product(vb.e, vb.e))), 6) AS cos
  FROM cand c
  JOIN aug va ON va.vec_id = c.id_a
  JOIN aug vb ON vb.vec_id = c.id_b
),
kill AS (SELECT DISTINCT id_b AS vec_id FROM s WHERE cos >= 0.9)
SELECT CAST(count(*) AS BIGINT) AS n_surviving,
       CAST(sum(a.vec_id) AS BIGINT) AS survivors_checksum
FROM aug a LEFT JOIN kill k ON a.vec_id = k.vec_id
WHERE k.vec_id IS NULL""",
)
def q_emb_near_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dedup end to end: LSH-bucket candidates →
    exact cosine rescore ≥ 0.9 → kill the higher id → anti-join — the
    dedup-by-embedding path a training pipeline runs, as one checksum
    row under the hash gate."""
    from vector_spark.datapipe.similarity import near_dup_pairs

    aug = _aug_emb(spark, sf_dir)
    pairs = near_dup_pairs(
        aug,
        threshold=0.9,
        n_planes=_NEAR_DUP_PLANES,
        n_tables=_NEAR_DUP_TABLES,
        dim=_EMB_DIM,
    )
    kill = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    surviving = aug.join(kill, "vec_id", "left_anti")
    return surviving.agg(
        F.count(F.lit(1)).alias("n_surviving"),
        F.sum("vec_id").alias("survivors_checksum"),
    )


@register(
    "emb_dup_clusters",
    # WITH RECURSIVE prefixes the whole CTE list; only `reach` recurses
    _AUG_SQL.replace("WITH aug", "WITH RECURSIVE aug", 1) + _buckets_sql()
    + """,
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b USING (bucket)
  WHERE a.vec_id < b.vec_id
),
s AS (
  SELECT c.id_a, c.id_b,
         round(list_dot_product(va.e, vb.e) /
               (sqrt(list_dot_product(va.e, va.e)) *
                sqrt(list_dot_product(vb.e, vb.e))), 6) AS cos
  FROM cand c
  JOIN aug va ON va.vec_id = c.id_a
  JOIN aug vb ON vb.vec_id = c.id_b
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM s WHERE cos >= 0.9
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM s WHERE cos >= 0.9
),
reach AS (
  SELECT DISTINCT u AS id, u AS root FROM edges
  UNION
  SELECT e.v AS id, r.root FROM reach r JOIN edges e ON e.u = r.id
),
comps AS (SELECT id, min(root) AS cluster_id FROM reach GROUP BY id)
SELECT cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(id) AS BIGINT) AS members_checksum
FROM comps GROUP BY cluster_id""",
)
def q_emb_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic duplicate GROUPS: hyperplane-LSH
    candidates → exact cosine rescore ≥ 0.9 → connected components —
    the embedding-space twin of doc_dup_clusters, sharing the same
    clustering operator (datapipe/dedup.py:connected_components)."""
    from vector_spark.datapipe.similarity import near_dup_pairs

    pairs = near_dup_pairs(
        _aug_emb(spark, sf_dir),
        threshold=0.9,
        n_planes=_NEAR_DUP_PLANES,
        n_tables=_NEAR_DUP_TABLES,
        dim=_EMB_DIM,
    )
    comp = connected_components(pairs)
    return comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("id").alias("members_checksum"),
    )


# ---------------------------------------------------------------------------
# repetition metrics + Gopher quality rules


def _gram_cte(name: str, n: int) -> str:
    """word n-gram explode + per-(doc, gram) counts, as two CTEs
    (built on the shared :func:`_grams_sql` construction)."""
    return f""",
g{name} AS ({_grams_sql(n, 'w')}),
c{name} AS (SELECT doc_id, gram, count(*) AS cnt FROM g{name} GROUP BY 1, 2)"""


@register(
    "doc_repetition",
    f"""
WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm)"""
    + _gram_cte("2", 2)
    + _gram_cte("5", 5)
    + """,
r2 AS (
  SELECT doc_id, cnt * length(gram) AS topchars,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn,
         sum(cnt * length(gram)) OVER (PARTITION BY doc_id) AS allchars
  FROM c2
),
t2 AS (SELECT doc_id, round(topchars / allchars, 6) AS f2 FROM r2 WHERE rn = 1),
t5 AS (
  SELECT doc_id,
         round(sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END)
               / sum(cnt * length(gram)), 6) AS f5
  FROM c5 GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(t2.f2, 0.0) AS top2gram_char_frac,
       COALESCE(t5.f5, 0.0) AS dup5gram_char_frac
FROM documents d LEFT JOIN t2 ON d.doc_id = t2.doc_id
LEFT JOIN t5 ON d.doc_id = t5.doc_id""",
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition rules: most-frequent-2-gram character
    fraction + duplicated-5-gram character fraction, per document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_metrics(docs, top_n=2, dup_n=5)


from vector_spark.datapipe.text import GOPHER_STOPWORDS

_GOPHER_STOP_SQL = ", ".join(repr(s) for s in GOPHER_STOPWORDS)

@register(
    "doc_gopher_quality",
    f"""
WITH norm AS (SELECT doc_id, text, {_NORM} AS t FROM documents),
w AS (SELECT doc_id, text, t, string_split(t, ' ') AS ws FROM norm),
m AS (
  SELECT doc_id, text, len(ws) AS n_words, greatest(len(ws), 1) AS n1,
         round((length(t) - len(ws) + 1) / greatest(len(ws), 1), 6) AS mean_word_len,
         len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS n_sym,
         len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         len(list_filter(ws, x -> x IN ({_GOPHER_STOP_SQL}))) AS n_stop
  FROM w
),
flags AS (
  SELECT doc_id, n_words, mean_word_len,
         (n_words >= 50 AND n_words <= 100000) AS words_ok,
         (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS wlen_ok,
         (n_sym / n1 <= 0.1) AS symbol_ok,
         (n_alpha / n1 >= 0.8) AS alpha_ok,
         (n_stop >= 2) AS stop_ok,
         (NOT contains(text, '{{')) AS no_braces,
         (NOT contains(lower(text), 'lorem ipsum')) AS no_lorem
  FROM m
)
SELECT doc_id, n_words, mean_word_len, words_ok, wlen_ok, symbol_ok,
       alpha_ok, stop_ok, no_braces, no_lorem,
       (words_ok AND wlen_ok AND symbol_ok AND alpha_ok AND stop_ok
        AND no_braces AND no_lorem) AS keep
FROM flags""",
)
def q_doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality flags (+ C4 brace/lorem tripwires)
    per document — the pre-model filter pass of a training pipeline."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_quality_flags(docs)


# ---------------------------------------------------------------------------
# corpus-global line dedup (C4-style pass)

_LINE_COLS = ", ".join(f"ws[8 * i + {j + 1}]" for j in range(8))


@register(
    "doc_line_dedup_global",
    _DUP_CTE
    + f""",
norm AS (SELECT doc_id, {_NORM} AS t FROM dup),
w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
ml AS (
  SELECT doc_id,
         list_transform(range((len(ws) + 7) // 8),
                        i -> concat_ws(' ', {_LINE_COLS})) AS ls
  FROM w
),
lines AS (
  SELECT doc_id, unnest(range(len(ls))) AS pos, unnest(ls) AS line FROM ml
),
rn AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM lines
),
kept AS (SELECT doc_id, pos, line FROM rn WHERE rn = 1),
reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(reb.text, '') AS text
FROM dup d LEFT JOIN reb ON d.doc_id = reb.doc_id""",
)
def q_doc_line_dedup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-global line dedup: the dup-injected corpus is
    re-chunked into 8-word lines (deterministic in both engines), then
    every distinct line survives only at its first (doc, position)
    occurrence and docs are reassembled.  Exact clones collapse to
    empty text; perturbed clones keep only their perturbed tail line."""
    from vector_spark.datapipe.dedup import dedup_lines_global, normalize_text

    dup = _dup_df(spark, sf_dir)
    w = F.split(normalize_text(F.col("text")), " ")
    chunks = F.sequence(
        F.lit(0).cast("bigint"), F.floor((F.size(w) - 1) / 8)
    )
    ml = dup.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.transform(
                chunks,
                lambda i: F.concat_ws(" ", F.slice(w, i * 8 + 1, 8)),
            ),
        ).alias("text"),
    )
    return dedup_lines_global(ml)


# ---------------------------------------------------------------------------
# benchmark decontamination + corpus stats (n-grams via the shared
# _grams_sql construction at the top of the module)


@register(
    "doc_decontamination",
    _DUP_CTE
    + f""",
norm AS (SELECT doc_id, {_NORM} AS t FROM dup),
w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
g13 AS ({_grams_sql(13, 'w')}),
sh13 AS (SELECT DISTINCT doc_id, {_H60.format(e='gram')} % {HASH_MOD} AS h FROM g13),
bnorm AS (SELECT {_NORM} AS t FROM documents WHERE doc_id % 10 = 0),
bw AS (SELECT string_split(t, ' ') AS ws FROM bnorm),
bg AS ({_grams_sql(13, 'bw')}),
bh AS (SELECT DISTINCT {_H60.format(e='gram')} % {HASH_MOD} AS h FROM bg)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_grams
FROM sh13 WHERE h IN (SELECT h FROM bh)
GROUP BY doc_id""",
)
def q_doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style benchmark decontamination: flag corpus docs sharing
    ≥1 distinct 13-gram with the held-out benchmark set (every 10th
    original doc).  The dup-injected corpus guarantees non-trivial
    hits: the benchmark docs themselves, their exact clones, and the
    shared prefixes of perturbed clones."""
    from vector_spark.datapipe.dedup import decontaminate

    corpus = _dup_df(spark, sf_dir)
    bench = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    return decontaminate(corpus, bench, n=13)


@register(
    "doc_training_mix",
    f"""
WITH lang AS (
  SELECT doc_id, {_langid_sql()} AS pred_lang FROM documents
),
rated AS (
  SELECT doc_id, pred_lang,
         CASE pred_lang WHEN 'en' THEN 1 WHEN 'und' THEN 5 ELSE 2 END AS rate
  FROM lang
)
SELECT doc_id, pred_lang FROM rated
WHERE {_H60.format(e='CAST(doc_id AS VARCHAR)')} % rate = 0""",
)
def q_doc_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction: per-language hash-consistent
    downsampling (keep all English, 1/2 of other identified
    languages, 1/5 of unidentified) — the sample operator's
    group-consistent decision composed with lang_id, fully
    deterministic and engine-portable (same docs survive on every
    run and engine)."""
    from vector_spark.datapipe.dedup import portable_hash60
    from vector_spark.datapipe.text import lang_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lang = docs.select("doc_id", lang_id(F.col("text")).alias("pred_lang"))
    rate = (
        F.when(F.col("pred_lang") == "en", 1)
        .when(F.col("pred_lang") == "und", 5)
        .otherwise(2)
    )
    keep = (
        F.pmod(portable_hash60(F.col("doc_id").cast("string")), rate) == 0
    )
    return lang.filter(keep)



@register(
    "doc_corpus_stats",
    f"""
SELECT {_langid_sql()} AS pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split({_NORM}, ' '))) AS BIGINT) AS total_tokens,
       round(avg(round((
         CASE WHEN length(text) >= 20 AND length(text) <= 20000 THEN 1 ELSE 0 END +
         CASE WHEN length(text) / greatest(len(string_split({_NORM}, ' ')), 1) >= 2.0
               AND length(text) / greatest(len(string_split({_NORM}, ' ')), 1) <= 12.0
              THEN 1 ELSE 0 END +
         CASE WHEN len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(length(text), 1) <= 0.2
              THEN 1 ELSE 0 END) / 3.0, 6)), 6) AS avg_quality
FROM documents GROUP BY 1""",
)
def q_doc_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix reporting: per-predicted-language doc and token
    totals + mean quality — the rollup a data pipeline emits per
    snapshot (one narrow pass + a tiny groupBy on language)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        analyze_documents(docs)
        .groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
    )


# ---------------------------------------------------------------------------
# training-mix sampling: temperature rebalancing + token-budget quotas

# keep-threshold table the mix oracle shares with datapipe/sampling.py:
# w_i = n_i^0.5, target_i = w_i/Σw · 0.6·N capped at n_i, thr = round(p·1000)
_TEMP_RATES_SQL = """
c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang),
t AS (SELECT sum(n) AS tot_n, sum(pow(n, 0.5)) AS tot_w FROM c),
r AS (
  SELECT lang,
         CAST(round(least(1.0, pow(n, 0.5) / tot_w * 0.6 * tot_n / n) * 1000, 0)
              AS BIGINT) AS thr
  FROM c CROSS JOIN t
)"""


@register(
    "doc_temperature_mix",
    f"""
WITH {_TEMP_RATES_SQL.lstrip()},
k AS (
  SELECT d.lang, d.doc_id
  FROM documents d JOIN r USING (lang)
  WHERE {_H60.format(e='CAST(doc_id AS VARCHAR)')} % 1000 < thr
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS ids_checksum
FROM k GROUP BY lang""",
)
def q_doc_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced training mix (alpha = 0.5, 60% of the
    corpus): per-language keep rates ∝ n^alpha flatten the dominant
    language's share; each doc's keep decision hashes on its id, so
    the sampled corpus is identical on every run/engine/cluster size.
    The big side never shuffles — one tiny rates aggregate broadcast
    back (datapipe/sampling.py:temperature_mix)."""
    from vector_spark.datapipe.sampling import temperature_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = temperature_mix(docs, "lang", alpha=0.5, target_frac=0.6)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("ids_checksum"),
    )


@register(
    "doc_quota_sample",
    f"""
WITH tk AS (
  SELECT doc_id, lang,
         CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens,
         {_H60.format(e='CAST(doc_id AS VARCHAR)')} AS h
  FROM documents
),
p AS (
  SELECT *, coalesce(sum(n_tokens) OVER (
      PARTITION BY lang ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS token_offset
  FROM tk
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
       CAST(sum(doc_id) AS BIGINT) AS ids_checksum
FROM p WHERE token_offset < 2500 GROUP BY lang""",
)
def q_doc_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget quota (2500 tokens/language): docs are
    visited in portable-hash order (deterministic shuffle) and kept
    while the exclusive token prefix sum is under budget.  The prefix
    sum is the two-phase bucketed scan (datapipe/sampling.py) — never a
    whole language through one task — while the oracle is a plain
    global window, proving the bucketing is invisible in the result."""
    from vector_spark.datapipe.sampling import quota_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = quota_sample(docs, group_col="lang", budget=2500)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.sum("doc_id").alias("ids_checksum"),
    )


# ---------------------------------------------------------------------------
# deterministic train/val/test split + corpus boilerplate detection


@register(
    "doc_train_split",
    f"""
WITH s AS (
  SELECT doc_id,
         {_H60.format(e="concat('split', ':', CAST(doc_id AS VARCHAR))")}
           % 1000000 AS h
  FROM documents
)
SELECT CASE WHEN h < 980000 THEN 'train'
            WHEN h < 990000 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS ids_checksum
FROM s GROUP BY 1""",
)
def q_doc_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic leak-free 98/1/1 split: assignment hashes on the
    doc id (with `group_col=` whole conversations/domains move
    together), so the split survives repartitioning, re-runs, and
    engine swaps — zero shuffles added
    (datapipe/sampling.py:hash_split)."""
    from vector_spark.datapipe.sampling import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hash_split(docs, {"train": 0.98, "val": 0.01, "test": 0.01})
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("ids_checksum"),
    )


@register(
    "doc_boilerplate",
    f"""
WITH norm AS (SELECT doc_id, source, {_NORM} AS t FROM documents),
w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
g AS ({_grams_sql(5, 'w')}),
gh AS (SELECT doc_id, source, {_H60.format(e='gram')} % {HASH_MOD} AS h FROM g),
freq AS (
  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS dfreq FROM gh GROUP BY h)
  WHERE dfreq >= ceil(0.01 * (SELECT count(*) FROM documents))
),
hits AS (
  SELECT doc_id, count(*) AS bh FROM gh JOIN freq USING (h) GROUP BY doc_id
),
d AS (
  SELECT doc_id, source,
         greatest(len(string_split(t, ' ')) - 4, 0) AS ng
  FROM norm
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ng) AS BIGINT) AS total_grams,
       CAST(sum(coalesce(bh, 0)) AS BIGINT) AS boiler_hits,
       CAST(sum(CASE WHEN coalesce(bh, 0) * 10 > ng * 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged
FROM d LEFT JOIN hits USING (doc_id)
GROUP BY source""",
)
def q_doc_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate report per source: 5-grams shared by
    ≥1% of documents (headers/footers/banners — cross-doc repetition
    the within-doc Gopher metrics cannot see) and how much of each
    source they cover.  The frequent set is a broadcast Zipf head;
    only matching gram positions are ever shuffled
    (datapipe/text.py:boilerplate_metrics)."""
    from vector_spark.datapipe.text import boilerplate_metrics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = boilerplate_metrics(docs, n=5, min_doc_frac=0.01, flag_frac=0.3)
    return (
        m.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_grams").alias("total_grams"),
            F.sum("boiler_hits").alias("boiler_hits"),
            F.sum(F.col("is_boilerplate").cast("long")).alias("n_flagged"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity scoring + head/middle/tail bucketing

# word-token CTE shared by the LM oracle: non-empty whitespace tokens
# of the normalized text, reduced to the portable 60-bit hash
_TOK_CTE = f"""
norm AS (SELECT doc_id, lang, {_NORM} AS t FROM documents),
tok AS (
  SELECT doc_id, lang, {_H60.format(e='w')} AS h
  FROM (SELECT doc_id, lang,
               unnest(list_filter(string_split(t, ' '), x -> x <> '')) AS w
        FROM norm)
)"""


@register(
    "doc_ccnet_buckets",
    f"""
WITH {_TOK_CTE.lstrip()},
ref AS (SELECT h FROM tok WHERE doc_id % 5 = 0),
cnt AS (SELECT h, CAST(count(*) AS DOUBLE) AS c FROM ref GROUP BY h),
tv AS (SELECT sum(c) AS t, CAST(count(*) AS DOUBLE) AS v FROM cnt),
lmv AS (SELECT h, ln((c + 0.5) / (t + 0.5 * (v + 1))) AS logp
        FROM cnt CROSS JOIN tv),
oov AS (SELECT ln(0.5 / (t + 0.5 * (v + 1))) AS oov_logp FROM tv),
sc AS (
  SELECT doc_id, count(*) AS n_tokens,
         CAST(round(-avg(coalesce(logp, oov_logp)) * 1000, 0) AS BIGINT) AS s
  FROM tok LEFT JOIN lmv USING (h) CROSS JOIN oov
  GROUP BY doc_id
),
alldocs AS (
  SELECT d.doc_id, d.lang, coalesce(sc.n_tokens, 0) AS n_tokens, sc.s
  FROM documents d LEFT JOIN sc USING (doc_id)
),
hist AS (SELECT lang, s, count(*) AS n FROM alldocs
         WHERE s IS NOT NULL GROUP BY lang, s),
cumed AS (
  SELECT lang, s,
         sum(n) OVER (PARTITION BY lang ORDER BY s) AS cum,
         sum(n) OVER (PARTITION BY lang) AS tot
  FROM hist
),
thr AS (
  SELECT lang,
         min(CASE WHEN cum >= ceil(tot * 0.3333333333333333) THEN s END) AS t1,
         min(CASE WHEN cum >= ceil(tot * 0.6666666666666666) THEN s END) AS t2
  FROM cumed GROUP BY lang
)
SELECT lang,
       CASE WHEN s IS NULL THEN NULL
            WHEN s <= t1 THEN 'head'
            WHEN s <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(doc_id) AS BIGINT) AS ids_checksum
FROM alldocs LEFT JOIN thr USING (lang)
GROUP BY lang, bucket""",
)
def q_doc_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet quality pipeline: a smoothed unigram LM trained on the
    deterministic reference slice (doc_id % 5 == 0) scores every doc
    in integer millinats, then each language splits head/middle/tail
    at its 1/3 and 2/3 score percentiles (ties to the lower bucket —
    a pure function of the score multiset, so the oracle's plain
    window reproduces it).  Zero-token docs bucket NULL
    (datapipe/lm.py)."""
    from vector_spark.datapipe.lm import (
        ccnet_buckets, perplexity_scores, unigram_lm,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = unigram_lm(docs.filter(F.col("doc_id") % 5 == 0))
    scored = perplexity_scores(docs, lm).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    b = ccnet_buckets(scored, group_col="lang", score_col="nll_milli")
    return b.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("doc_id").alias("ids_checksum"),
    )


# ---------------------------------------------------------------------------
# Model-based quality filtering: NB-log-odds linear classifier (the
# closed-form NBSVM/fastText-shaped scorer), top-k-per-source
# selection, and DSIR importance resampling

#: the classifier/DSIR oracles share the smoothed in-class log-prob
#: construction; keep ONE renderer so the smoothing constant and the
#: OOV reservation cannot drift between queries
def _lm_sql(name: str, src_filter: str) -> str:
    return f"""
{name}cnt AS (SELECT h, CAST(count(*) AS DOUBLE) AS c FROM tok{src_filter} GROUP BY h),
{name}tv AS (SELECT sum(c) AS t, CAST(count(*) AS DOUBLE) AS v FROM {name}cnt),
{name}lm AS (SELECT h, ln((c + 0.5) / (t + 0.5 * (v + 1))) AS lp
        FROM {name}cnt CROSS JOIN {name}tv),
{name}oov AS (SELECT ln(0.5 / (t + 0.5 * (v + 1))) AS lp FROM {name}tv)"""


#: NB log-odds weight CTEs: seed = even doc_ids labeled (lang = 'en');
#: weights and scores in exact integer millis
_NB_SQL = """
seedtok AS (SELECT h, (lang = 'en') AS pos FROM tok
            WHERE doc_id % 2 = 0 AND lang IS NOT NULL),
cnt AS (SELECT h,
          CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) AS cp,
          CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS DOUBLE) AS cn
        FROM seedtok GROUP BY h),
tv AS (SELECT sum(cp) AS tp, sum(cn) AS tn,
              CAST(count(*) AS DOUBLE) AS v FROM cnt),
wv AS (SELECT h,
         CAST(round((ln((cp + 0.5) / (tp + 0.5 * (v + 1)))
                   - ln((cn + 0.5) / (tn + 0.5 * (v + 1)))) * 1000, 0)
              AS BIGINT) AS w
       FROM cnt CROSS JOIN tv),
oovw AS (SELECT CAST(round((ln(0.5 / (tp + 0.5 * (v + 1)))
                          - ln(0.5 / (tn + 0.5 * (v + 1)))) * 1000, 0)
                AS BIGINT) AS w FROM tv),
sc AS (SELECT doc_id, count(*) AS n_tokens,
              sum(coalesce(wv.w, oovw.w)) AS s
       FROM tok LEFT JOIN wv USING (h) CROSS JOIN oovw
       GROUP BY doc_id)"""


def _classifier_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Spark side: train NB log-odds weights on the even-id
    seed half labeled (lang == 'en'), score every document."""
    from vector_spark.datapipe.classify import (
        classifier_scores, nb_logodds_weights,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seed = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", F.col("lang") == "en"
    )
    weights = nb_logodds_weights(seed, label_col="label")
    return classifier_scores(docs, weights).join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    )


@register(
    "doc_classifier_scores",
    f"""
WITH {_TOK_CTE.lstrip()},
{_NB_SQL.lstrip()}
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(sum(s) AS BIGINT) AS score_checksum,
       CAST(sum(CASE WHEN s > 0 THEN d.doc_id ELSE 0 END) AS BIGINT)
           AS kept_ids_checksum
FROM documents d LEFT JOIN sc USING (doc_id)
GROUP BY d.source""",
)
def q_doc_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier (datapipe/classify.py): NB
    log-odds weights trained closed-form on the deterministic seed
    half (even doc_ids, positive = lang 'en'), every doc scored as an
    exact integer milli sum, keep = score > 0.  Per-source keep
    counts + checksums under the full hash gate."""
    s = _classifier_scored(spark, sf_dir)
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
        F.sum("score_milli").alias("score_checksum"),
        F.sum(
            F.when(F.col("keep"), F.col("doc_id")).otherwise(0)
        ).alias("kept_ids_checksum"),
    )


@register(
    "doc_topk_per_source",
    f"""
WITH {_TOK_CTE.lstrip()},
{_NB_SQL.lstrip()},
scored AS (SELECT d.source, d.doc_id, CAST(sc.s AS BIGINT) AS score_milli
           FROM documents d JOIN sc USING (doc_id)
           WHERE d.source IS NOT NULL)
SELECT source, doc_id, score_milli FROM scored
QUALIFY row_number() OVER (
    PARTITION BY source ORDER BY score_milli DESC, doc_id) <= 10""",
)
def q_doc_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fineweb-edu-style selection: the 10 best classifier-scored docs
    per source by (score DESC, doc_id ASC), via the histogram-
    thresholded exact top-k (datapipe/classify.py:topk_per_group) —
    the full selected row set is under the hash gate, so the
    threshold phase provably changes nothing."""
    from vector_spark.datapipe.classify import topk_per_group

    sel = topk_per_group(
        _classifier_scored(spark, sf_dir),
        10,
        group_col="source",
        score_col="score_milli",
        id_col="doc_id",
    )
    return sel.select("source", "doc_id", "score_milli")


@register(
    "doc_dsir_selection",
    f"""
WITH {_TOK_CTE.lstrip()},
{_lm_sql('t', ' WHERE doc_id % 7 = 0').lstrip()},
{_lm_sql('r', '').lstrip()},
sc AS (SELECT doc_id,
         sum(CAST(round((coalesce(tlm.lp, toov.lp)
                       - coalesce(rlm.lp, roov.lp)) * 1000, 0)
             AS BIGINT)) AS logratio_milli
       FROM tok LEFT JOIN tlm USING (h) LEFT JOIN rlm USING (h)
            CROSS JOIN toov CROSS JOIN roov
       GROUP BY doc_id),
top AS (SELECT doc_id, logratio_milli FROM sc
        QUALIFY row_number() OVER (
            ORDER BY logratio_milli DESC, doc_id) <= 100)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(top.logratio_milli) AS BIGINT) AS lr_checksum,
       CAST(sum(d.doc_id) AS BIGINT) AS ids_checksum
FROM top JOIN documents d USING (doc_id)
GROUP BY d.lang""",
)
def q_doc_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (datapipe/lm.py:dsir_logratio): rank
    every doc by its exact-integer log importance weight against a
    target LM (the doc_id % 7 == 0 slice) relative to the raw-corpus
    LM, take the global top 100 by (weight DESC, doc_id ASC) —
    Spark's orderBy+limit compiles to TakeOrdered partial top-k, no
    global sort — and report the per-language composition."""
    from vector_spark.datapipe.lm import dsir_logratio, unigram_lm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t_lm = unigram_lm(docs.filter(F.col("doc_id") % 7 == 0))
    r_lm = unigram_lm(docs)
    sc = dsir_logratio(docs, t_lm, r_lm)
    top = (
        sc.filter(F.col("logratio_milli").isNotNull())
        .orderBy(F.col("logratio_milli").desc(), F.col("doc_id"))
        .limit(100)
    )
    return (
        top.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("logratio_milli").alias("lr_checksum"),
            F.sum("doc_id").alias("ids_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# Byte-level BPE tokenization (round 4): real subword token budgets


def _bpe_sql() -> str:
    """Hash-gateable BPE oracle: iterative merge learning + greedy
    merge application are not expressible in DuckDB SQL, so the oracle
    replays the aggregation over GOLDEN per-document counts produced by
    the INDEPENDENT naive reference implementation (the one
    tests/test_bpe.py checks training/encoding parity against), pinned
    in data/bpe_golden.py by tools/build_ann_fixtures.py.  The engine's
    distributed learn+encode must reproduce those counts exactly for
    the per-source sums to hash-match."""
    from vector_spark.data.bpe_golden import BPE_GOLDEN_COUNTS

    rows = ", ".join(
        f"({d}, {n})" for d, n in sorted(BPE_GOLDEN_COUNTS.items())
    )
    return f"""
WITH golden(doc_id, n_bpe) AS (VALUES {rows})
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(g.n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(sum(len(string_split({_NORM}, ' '))) AS BIGINT)
         AS total_ws_tokens,
       CAST(sum(d.doc_id * g.n_bpe) AS BIGINT) AS weighted_checksum
FROM documents d JOIN golden g USING (doc_id)
GROUP BY d.source"""


@register("doc_bpe_token_counts", _bpe_sql())
def q_doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real subword token budgets (datapipe/bpe.py): learn a byte-level
    BPE merge table from the corpus itself (bounded word-frequency
    sample, deterministic ties), count BPE tokens per document with the
    Arrow-batched kernel, and report per-source totals next to the
    whitespace counts they correct.

    Full hash oracle as of round 5: the driver compares the engine's
    distributed learn(48 merges)+encode against per-document GOLDEN
    counts from the independent naive reference (data/bpe_golden.py,
    valid at the sf0.01/sf0.001 gate corpus).  tests/test_bpe.py keeps
    the deeper gates: training and encoding parity on arbitrary
    corpora, lossless round-trips, Spark-kernel-vs-driver equality."""
    from vector_spark.datapipe.bpe import bpe_token_counts, learn_bpe
    from vector_spark.datapipe.text import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the synthetic corpus has a ~31-word vocabulary: a realistic merge
    # budget (512+) coalesces every word to one token and the BPE count
    # degenerates to the whitespace count.  48 merges keeps the corpus
    # PARTIALLY merged so the gate actually exercises subword splits.
    merges = learn_bpe(docs, num_merges=48, max_words=50_000)
    counted = bpe_token_counts(docs, merges)
    return counted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        F.sum(token_count(F.col("text"))).alias("total_ws_tokens"),
        F.sum(
            F.col("doc_id") * F.col("n_bpe_tokens")
        ).alias("weighted_checksum"),
    )


# ---------------------------------------------------------------------------
# Language ID over hashed char-n-gram profiles (round 4)

from vector_spark.datapipe.langid import langid_sql as _langid_sql


@register(
    "doc_lang_id",
    f"""
WITH {_langid_sql().lstrip()}
SELECT pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS ids_checksum,
       CAST(sum(score_milli) AS BIGINT) AS score_checksum
FROM pred GROUP BY pred_lang""",
)
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """28-language hashed char-n-gram profile classifier
    (datapipe/langid.py): normalize -> bounded 256-char prefix ->
    explode mixed 1/2/3-grams -> broadcast-join the embedded profile
    weights -> per-(doc, lang) integer-milli scores -> argmax with
    (score DESC, lang ASC) ties, 'und' for no-hit docs.
    Per-predicted-language counts and checksums under the full hash
    gate; the oracle re-derives every score from the same profile
    constants in pure SQL."""
    from vector_spark.datapipe.langid import predict_lang

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = predict_lang(docs)
    return p.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("ids_checksum"),
        F.sum("score_milli").alias("score_checksum"),
    )


# ---------------------------------------------------------------------------
# K-class ordinal quality grading (round 4): multiclass NB + top-k


@register(
    "doc_quality_grades",
    f"""
WITH {_TOK_CTE.lstrip()},
seed AS (SELECT doc_id, CAST((doc_id // 2) % 6 AS INT) AS label
         FROM documents WHERE doc_id % 2 = 0),
stok AS (SELECT s.label, t.h FROM tok t JOIN seed s USING (doc_id)),
kls AS (SELECT label, CAST(count(*) AS DOUBLE) AS tk FROM stok GROUP BY label),
kd AS (SELECT label, CAST(count(*) AS DOUBLE) AS nd FROM seed GROUP BY label),
tot AS (SELECT sum(nd) AS n FROM kd),
vsz AS (SELECT CAST(count(DISTINCT h) AS DOUBLE) AS v FROM stok),
klass AS (SELECT kd.label,
                 CAST(round(ln(kd.nd / tot.n) * 1000, 0) AS BIGINT) AS prior,
                 CAST(round(ln(0.5 / (kls.tk + 0.5 * (vsz.v + 1))) * 1000, 0)
                      AS BIGINT) AS oov,
                 kls.tk, vsz.v
          FROM kd JOIN kls USING (label) CROSS JOIN tot CROSS JOIN vsz),
cnt AS (SELECT h, label, CAST(count(*) AS DOUBLE) AS c
        FROM stok GROUP BY h, label),
vocab AS (SELECT DISTINCT h FROM stok),
wv AS (SELECT vocab.h, k.label,
              CAST(round(ln((coalesce(cnt.c, 0) + 0.5)
                            / (k.tk + 0.5 * (k.v + 1))) * 1000, 0)
                   AS BIGINT) AS w
       FROM vocab CROSS JOIN klass k
       LEFT JOIN cnt ON cnt.h = vocab.h AND cnt.label = k.label),
ntok AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
hits AS (SELECT t.doc_id, w.label, sum(w.w) AS s,
                CAST(count(*) AS BIGINT) AS n_in
         FROM tok t JOIN wv w USING (h) GROUP BY t.doc_id, w.label),
nohit AS (SELECT ntok.doc_id, k.label, CAST(0 AS BIGINT) AS s,
                 CAST(0 AS BIGINT) AS n_in
          FROM ntok CROSS JOIN klass k
          WHERE ntok.doc_id NOT IN (SELECT DISTINCT doc_id FROM hits)),
gsc AS (SELECT a.doc_id, a.label,
               k.prior + a.s + (ntok.n - a.n_in) * k.oov AS score
        FROM (SELECT * FROM hits UNION ALL SELECT * FROM nohit) a
        JOIN klass k USING (label) JOIN ntok USING (doc_id)),
graded AS (SELECT doc_id, label AS grade, score AS score_milli FROM gsc
           QUALIFY row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, label) = 1),
top5 AS (SELECT grade, CAST(sum(doc_id) AS BIGINT) AS top5_ids_checksum
         FROM (SELECT grade, doc_id FROM graded
               QUALIFY row_number() OVER (
                   PARTITION BY grade
                   ORDER BY score_milli DESC, doc_id) <= 5)
         GROUP BY grade)
SELECT g.grade,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(g.doc_id) AS BIGINT) AS ids_checksum,
       CAST(sum(g.score_milli) AS BIGINT) AS score_checksum,
       any_value(t.top5_ids_checksum) AS top5_ids_checksum
FROM graded g JOIN top5 t ON t.grade = g.grade
GROUP BY g.grade""",
)
def q_doc_quality_grades(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fineweb-edu-style ordinal grading (datapipe/classify.py:
    nb_multiclass_weights + grade_documents): a 6-class closed-form NB
    grader trained on the deterministic seed half (even doc_ids,
    pseudo-label (doc_id div 2) % 6), every doc argmax-graded in exact
    integer millis, composed with topk_per_group (top-5 per grade).
    Per-grade counts + checksums + top-5 id checksums under the full
    hash gate; the oracle re-derives priors, dense per-class weights,
    OOV floors, the argmax, and the top-k in pure SQL."""
    from vector_spark.datapipe.classify import (
        grade_documents, nb_multiclass_weights, topk_per_group,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seed = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", (F.expr("doc_id div 2") % 6).cast("int")
    )
    weights, classes = nb_multiclass_weights(seed)
    graded = grade_documents(docs, weights, classes)
    rollup = graded.groupBy("grade").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("ids_checksum"),
        F.sum("score_milli").alias("score_checksum"),
    )
    top5 = topk_per_group(
        graded, 5, group_col="grade", score_col="score_milli",
        id_col="doc_id",
    ).groupBy("grade").agg(F.sum("doc_id").alias("top5_ids_checksum"))
    return rollup.join(top5, "grade")


# ---------------------------------------------------------------------------
# Exact-substring (span-level) dedup (round 4)

_SPAN_K = 13


@register(
    "doc_span_dedup",
    f"""
{_DUP_CTE.lstrip()},
w AS (SELECT doc_id, string_split({_NORM}, ' ') AS ws
      FROM dup WHERE text IS NOT NULL),
base AS (SELECT doc_id, len(ws) AS n_tokens FROM w),
spans AS (
  SELECT doc_id, i AS pos,
         {_H60.format(e=f"array_to_string(ws[i+1:i+{_SPAN_K}], ' ')")}
             AS span_h
  FROM (SELECT doc_id, ws,
               unnest(range(greatest(len(ws) - {_SPAN_K - 1}, 0))) AS i
        FROM w)),
dupspan AS (SELECT span_h FROM spans GROUP BY span_h HAVING count(*) >= 2),
marked AS (SELECT s.doc_id, s.pos
           FROM spans s SEMI JOIN dupspan d ON s.span_h = d.span_h),
cov AS (
  SELECT doc_id,
         greatest(0, (pos + {_SPAN_K - 1})
           - greatest(pos, coalesce(max(pos + {_SPAN_K - 1}) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1,
               pos))
           + 1) AS c
  FROM marked),
per_doc AS (SELECT doc_id, sum(c) AS dup_tokens FROM cov GROUP BY doc_id),
stats AS (
  SELECT b.doc_id, b.n_tokens,
         coalesce(p.dup_tokens, 0) AS dup_tokens,
         CAST(floor(coalesce(p.dup_tokens, 0) * 1000
                    / greatest(b.n_tokens, 1)) AS BIGINT) AS dup_frac_milli
  FROM base b LEFT JOIN per_doc p USING (doc_id))
SELECT dup_frac_milli // 100 AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(dup_tokens) AS BIGINT) AS dup_tokens_sum,
       CAST(sum(doc_id) AS BIGINT) AS ids_checksum,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_checksum
FROM stats GROUP BY bucket""",
)
def q_doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style span-level dedup (datapipe/span_dedup.py) over
    the dup-injected corpus: rolling 13-gram repetition marks
    duplicated spans, per-doc coverage is the exact merged-interval
    union via a bounded per-doc window (never a k-times position
    explosion).  Per-coverage-decile rollup under the full hash gate;
    exact clones land in the 1000-milli bucket, perturbed clones just
    below."""
    from vector_spark.datapipe.span_dedup import span_dedup_stats

    stats = span_dedup_stats(_dup_df(spark, sf_dir), k=_SPAN_K)
    return stats.groupBy(
        F.floor(F.col("dup_frac_milli") / 100).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dup_tokens").alias("dup_tokens_sum"),
        F.sum("doc_id").alias("ids_checksum"),
        F.sum("n_tokens").alias("tokens_checksum"),
    )


@register(
    "emb_diversity_sample",
    """
WITH a AS (
  SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS av
  FROM embeddings ORDER BY vec_id LIMIT 8
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings),
s AS (
  SELECT vec_id, anchor_id,
         round(list_dot_product(vv, av) /
               (sqrt(list_dot_product(vv, vv)) * sqrt(list_dot_product(av, av))),
               6) AS cos
  FROM v CROSS JOIN a
),
asn AS (
  SELECT vec_id, anchor_id, cos FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, anchor_id ASC) AS rn
    FROM s
  ) WHERE rn = 1
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY anchor_id
    ORDER BY try_cast(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
             AS BIGINT) ASC, vec_id ASC) AS rk
  FROM asn
)
SELECT vec_id, anchor_id, cos FROM r WHERE rk <= 40""",
)
def q_emb_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sampling
    (datapipe/similarity.py:diversity_sample): stratify the corpus by
    nearest anchor (rounded-cosine argmax, anchors = 8 lowest-id
    vectors — an explicit SQL-reproducible anchor rule) and keep a
    40-row hash-spread quota per region.  The oracle re-derives the
    whole thing — anchors, assignment, quota — in pure SQL, so the
    full selected set sits under the value-hash gate."""
    from vector_spark.datapipe.similarity import diversity_sample

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return diversity_sample(emb, n_anchors=8, per_cluster=40)


@register(
    "doc_chunking",
    f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split({_NORM}, ' '),
                     x -> x <> '') AS words
  FROM documents
),
sized AS (SELECT doc_id, words, len(words) AS n FROM w),
c AS (
  SELECT doc_id, words, n,
         CASE WHEN n <= 64 THEN LEAST(n, 1)
              ELSE CAST(ceil((n - 64) / 48.0) AS INT) + 1
         END AS n_chunks
  FROM sized
),
e AS (
  SELECT c.doc_id, c.n_chunks, CAST(t.i AS INT) AS chunk_idx,
         array_to_string(c.words[t.i * 48 + 1 : t.i * 48 + 64],
                         ' ') AS chunk_text
  FROM c, UNNEST(generate_series(0, c.n_chunks - 1)) AS t(i)
  WHERE c.n_chunks > 0
)
SELECT doc_id, chunk_idx, n_chunks, chunk_text,
       len(list_filter(string_split(chunk_text, ' '), x -> x <> ''))
         AS chunk_n_tokens
FROM e""",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window chunking with overlap
    (datapipe/text.py:chunk_documents): 64-token windows, 16-token
    overlap (stride 48), tail kept.  Pure Column expressions + one
    posexplode — no shuffle; the oracle re-derives every window
    boundary with DuckDB list slicing, so off-by-one drift in the
    stride math breaks the full value hash."""
    from vector_spark.datapipe.text import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(docs, chunk_tokens=64, overlap=16)


# ---------------------------------------------------------------------------
# Composed end-to-end curation gate (round 5): the COMPOSED pipeline —
# not just its stages — under one hash gate (the datapipe analogue of
# pipeline_stats; the examples/training_mix_demo.py path).


def _curation_e2e_sql() -> str:
    """langid -> Gopher/C4 rules -> minhash/LSH near-dedup ->
    13-gram decontamination -> per-language token-budget quota, all
    replayed over the dup-injected corpus in one SQL.  Every stage
    reuses the SAME CTE builders its standalone oracle is built from
    (langid_sql, _SHINGLE_CTE/_sig_sql/_bands_sql/_CAND_SQL/
    _JACCARD_SQL, _grams_sql), so a drift in any stage red-flags both
    its standalone row and this composed row."""
    return (
        _DUP_CTE
        + ",\n"
        + _langid_sql(src="dup").lstrip()
        + _SHINGLE_CTE + _sig_sql() + _bands_sql() + _CAND_SQL
        + _JACCARD_SQL
        + f""",
kill AS (SELECT DISTINCT id_b AS doc_id FROM scored WHERE jaccard >= 0.8),
gm AS (
  SELECT d.doc_id, d.text,
         len(w.ws) AS n_words, greatest(len(w.ws), 1) AS n1,
         round((length(n.t) - len(w.ws) + 1)
               / greatest(len(w.ws), 1), 6) AS mean_word_len,
         len(regexp_extract_all(d.text, '#|\\.\\.\\.|…')) AS n_sym,
         len(list_filter(w.ws, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         len(list_filter(w.ws, x -> x IN ({_GOPHER_STOP_SQL}))) AS n_stop
  FROM dup d JOIN norm n USING (doc_id) JOIN w USING (doc_id)
),
grule AS (
  SELECT doc_id FROM gm
  WHERE n_words >= 50 AND n_words <= 100000
    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
    AND n_sym / n1 <= 0.1
    AND n_alpha / n1 >= 0.8
    AND n_stop >= 2
    AND NOT contains(text, '{{')
    AND NOT contains(lower(text), 'lorem ipsum')
),
g13 AS ({_grams_sql(13, 'w')}),
sh13 AS (SELECT DISTINCT doc_id, {_H60.format(e='gram')} % {HASH_MOD} AS h
         FROM g13),
bnorm AS (SELECT {_NORM} AS t FROM documents WHERE doc_id % 10 = 0),
bw AS (SELECT string_split(t, ' ') AS ws FROM bnorm),
bg AS ({_grams_sql(13, 'bw')}),
bh AS (SELECT DISTINCT {_H60.format(e='gram')} % {HASH_MOD} AS h FROM bg),
cont AS (SELECT DISTINCT doc_id FROM sh13 WHERE h IN (SELECT h FROM bh)),
surv AS (
  SELECT p.doc_id, p.pred_lang,
         CAST(len(w.ws) AS BIGINT) AS n_tokens,
         {_H60.format(e='CAST(p.doc_id AS VARCHAR)')} AS h
  FROM pred p
  JOIN grule USING (doc_id)
  JOIN w USING (doc_id)
  WHERE p.doc_id NOT IN (SELECT doc_id FROM kill)
    AND p.doc_id NOT IN (SELECT doc_id FROM cont)
),
qq AS (
  SELECT *, coalesce(sum(n_tokens) OVER (
      PARTITION BY pred_lang ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS token_offset
  FROM surv
)
SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
       CAST(sum(doc_id) AS BIGINT) AS ids_checksum
FROM qq WHERE token_offset < 5000 GROUP BY pred_lang"""
    )


@register("doc_curation_e2e", _curation_e2e_sql())
def q_doc_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline over the dup-injected corpus:
    language-ID (datapipe/langid.py) -> Gopher/C4 rule filter
    (text.py:gopher_quality_flags) -> minhash+LSH near-dedup kill list
    (dedup.py) -> 13-gram benchmark decontamination (dedup.py:
    decontaminate) -> per-predicted-language 5000-token quota
    (sampling.py:quota_sample).  One per-language summary row puts the
    WHOLE composed chain under the hash gate, so stage interactions
    (which docs each filter removes before the next stage sees them)
    are driver-verified, not just each stage in isolation.

    100 TB shape: every stage is the same bounded design its
    standalone query ships (LSH bucket join, broadcast benchmark
    semi-join, bucketed quota prefix sum); composition adds no new
    shuffle class."""
    from vector_spark.datapipe.dedup import (
        decontaminate,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )
    from vector_spark.datapipe.langid import predict_lang
    from vector_spark.datapipe.sampling import quota_sample
    from vector_spark.datapipe.text import gopher_quality_flags

    corpus = _dup_df(spark, sf_dir)
    pred = predict_lang(corpus).select("doc_id", "pred_lang")
    rules = (
        gopher_quality_flags(corpus).filter(F.col("keep")).select("doc_id")
    )
    sigs = minhash_signatures(corpus)
    cand = lsh_candidates(sigs, max_bucket=None)  # uncapped: see q_minhash_lsh
    pairs = jaccard_pairs(corpus, cand, threshold=0.8)
    kill = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    bench = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    cont = decontaminate(corpus, bench, n=13).select("doc_id")
    surv = (
        corpus.join(rules, "doc_id")
        .join(kill, "doc_id", "left_anti")
        .join(cont, "doc_id", "left_anti")
        .join(pred, "doc_id")
    )
    kept = quota_sample(surv, group_col="pred_lang", budget=5000)
    return kept.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.sum("doc_id").alias("ids_checksum"),
    )
