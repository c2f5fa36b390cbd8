"""Training-data pipeline staples: chunking, normalization, deterministic
content-hash sampling/splitting — each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_kinesis_data_analytics_flinktableapi_spark.operators.chunking import chunk_documents
from amazon_kinesis_data_analytics_flinktableapi_spark.queries import load, query

_DUCK_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"


@query(
    "doc_chunks",
    oracle=f"""
    WITH toked AS (
      SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents
    ), nonempty AS (
      SELECT doc_id, tk FROM toked WHERE len(tk) > 0
    ), starts AS (
      SELECT doc_id, tk,
             unnest(range(1, greatest(len(tk) - 16, 1) + 1, 48)) AS s
      FROM nonempty
    )
    SELECT doc_id,
           CAST((s - 1) / 48 AS INTEGER) AS chunk_idx,
           array_to_string(list_slice(tk, s, s + 63), ' ') AS chunk_text,
           len(list_slice(tk, s, s + 63)) AS n_tokens
    FROM starts
    """,
    doc="document chunking: 64-token windows, 16-token overlap (stride 48), exploded",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, overlap=16)


@query(
    "normalize_text",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
                               '\\s+', ' ', 'g')) AS normalized,
           length(trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
                                      '\\s+', ' ', 'g'))) AS n_chars_norm
    FROM documents
    """,
    doc="text normalization: lowercase, strip punctuation, collapse whitespace",
)
def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), "[.,!?;:]", ""), r"\s+", " ")
    )
    return docs.select("doc_id", norm.alias("normalized"), F.length(norm).alias("n_chars_norm"))


@query(
    "dedup_clusters",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             substr(text, 1, CAST(FLOOR(length(text) * 0.8) AS INT))
      FROM documents
    ),
    toks AS (SELECT doc_id, {_DUCK_TOKS} AS tk FROM corpus),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(tk) >= 3
               THEN list_transform(range(1, len(tk) - 1),
                                   i -> array_to_string(list_slice(tk, i, i + 2), ' '))
               ELSE [] END) AS shingles
      FROM toks
    ),
    sh2 AS (SELECT doc_id, shingles FROM sh WHERE len(shingles) > 0),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh2),
    hits AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh2),
    pairs AS (
      SELECT id_a, id_b FROM hits
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.5
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    closure AS (
      WITH RECURSIVE reach(node, comp) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node
      )
      SELECT node, min(comp) AS comp FROM reach GROUP BY node
    )
    SELECT c.doc_id, coalesce(cl.comp, c.doc_id) AS cluster_id
    FROM corpus c LEFT JOIN closure cl ON cl.node = c.doc_id
    """,
    doc="iterative connected components: near-dup pairs -> dedup clusters "
    "(min-label propagation; oracle = recursive-CTE transitive closure)",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.components import dedup_clusters
    from amazon_kinesis_data_analytics_flinktableapi_spark.operators.dedup import jaccard_pairs
    from amazon_kinesis_data_analytics_flinktableapi_spark.queries.llm import (
        _docs_with_neardup_copies,
    )

    corpus = _docs_with_neardup_copies(spark, sf_dir)
    pairs = jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5)
    return dedup_clusters(pairs, corpus, "doc_id")


@query(
    "rolling_fingerprint",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents)
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(tk, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
             (h, t) -> (h * 31 + t) % 2147483647
           ) AS rhash
    FROM toks
    """,
    doc="order-sensitive rolling-hash fingerprint: exact sequence-reuse key "
    "(complements the order-invariant md5 fingerprint)",
)
def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_kinesis_data_analytics_flinktableapi_spark.functions.text import rolling_hash

    (docs,) = load(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_hash("text").alias("rhash"))


@query(
    "stratified_sample",
    oracle="""
    WITH h AS (
      SELECT event_id, event_type, user_id,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket
      FROM events
    )
    SELECT event_id, event_type, user_id
    FROM h
    WHERE (event_type = 'view' AND bucket < 10)
       OR (event_type = 'click' AND bucket < 25)
       OR (event_type NOT IN ('view', 'click') AND bucket < 100)
    """,
    doc="deterministic stratified sampling: per-stratum rates via id-hash "
    "buckets (downsample dominant classes, keep rare ones) — reproducible "
    "on any engine, no RNG state",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: pure scan-side filter — no shuffle, no sort, no global state;
    # the sample follows the row's id hash so reruns/backfills select the
    # same rows.  Rates: view 10%, click 25%, everything else kept.
    (ev,) = load(spark, sf_dir, "events")
    bucket = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10).cast("long") % 100
    keep = (
        ((F.col("event_type") == "view") & (bucket < 10))
        | ((F.col("event_type") == "click") & (bucket < 25))
        | (~F.col("event_type").isin("view", "click") & (bucket < 100))
    )
    return ev.filter(keep).select("event_id", "event_type", "user_id")


@query(
    "reservoir_per_group",
    oracle="""
    SELECT event_type, event_id, user_id FROM (
      SELECT event_type, event_id, user_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
      FROM events
    ) WHERE rn <= 100
    """,
    doc="deterministic per-group reservoir: fixed-size uniform sample per "
    "stratum via hash-ordered rank (the distributed, rerun-stable "
    "equivalent of reservoir sampling)",
)
def q_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one shuffle on the stratum key; rank by content hash gives a
    # uniform, seedless, rerun-stable k-per-group sample.  For heavy
    # strata swap row_number for a per-partition top-k pre-prune
    # (TakeOrdered shape) — same result, bounded reducer memory.
    from pyspark.sql import Window

    (ev,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.md5(F.col("event_id").cast("string")), "event_id")
    return (
        ev.select("event_type", "event_id", "user_id", F.row_number().over(w).alias("__rn"))
        .filter(F.col("__rn") <= 100)
        .select("event_type", "event_id", "user_id")
    )


@query(
    "deterministic_sample",
    oracle="""
    SELECT doc_id, source,
           CASE WHEN substr(md5(text), 1, 1) IN ('0','1','2','3') THEN 'train'
                WHEN substr(md5(text), 1, 1) IN ('4','5') THEN 'eval'
                ELSE 'rest' END AS split
    FROM documents
    WHERE substr(md5(text), 1, 1) NOT IN ('f')
    """,
    doc="content-hash sampling + train/eval split: deterministic, dedup-stable, engine-portable",
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # md5-prefix bucketing: the split follows the CONTENT, so exact dups
    # always land in the same split (no train/eval leakage), any engine
    # reproduces it, and sampling needs no global state — the properties a
    # 100 TB corpus split actually requires.
    (docs,) = load(spark, sf_dir, "documents")
    h1 = F.substring(F.md5("text"), 1, 1)
    return (
        docs.filter(~h1.isin("f"))
        .select(
            "doc_id",
            "source",
            F.when(h1.isin("0", "1", "2", "3"), "train")
            .when(h1.isin("4", "5"), "eval")
            .otherwise("rest")
            .alias("split"),
        )
    )
