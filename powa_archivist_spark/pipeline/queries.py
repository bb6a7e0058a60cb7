"""Pipeline-operator query surface + DuckDB oracles (where expressible).

Hash-/engine-dependent operators (minhash, simhash, fingerprints) have no
SQL oracle — the driver records a rows-only check for them; their
correctness is covered by pytest property tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import t
from . import dedup, multimodal, similarity, textstats


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(t(spark, sf_dir, "documents"))


ORACLE_DEDUP_EXACT = r"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
"""


def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.8)


ORACLE_JACCARD = """
SELECT a_id, b_id, inter_size, union_size, jaccard
FROM (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         len(list_intersect(a.toks, b.toks)) AS inter_size,
         len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))
           AS union_size,
         CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
           / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
           AS jaccard
  FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents) a
  JOIN (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents) b
    ON a.doc_id < b.doc_id
) p
WHERE jaccard >= 0.8
"""


def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.near_dup_keep(t(spark, sf_dir, "documents"), threshold=0.8)


ORACLE_KEEP_LIST = """
SELECT doc_id FROM documents
WHERE doc_id NOT IN (
  SELECT b.doc_id
  FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents) a
  JOIN (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents) b
    ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.8
)
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No SQL oracle (xxhash64 permutations are engine-specific) — driver
    records rows-only; recall vs exact jaccard is pytest-verified."""
    return dedup.minhash_dedup_pairs(
        t(spark, sf_dir, "documents"), threshold=0.8
    ).orderBy("a_id", "b_id")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No SQL oracle (bit-vote over xxhash64) — rows-only check."""
    return dedup.simhash_near_dup_pairs(
        t(spark, sf_dir, "documents"), max_hamming=3
    ).orderBy("a_id", "b_id")


def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.knn_bruteforce(
        t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=10
    )


ORACLE_KNN = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * {similarity.QUANT}) AS BIGINT)) AS v
  FROM embeddings
)
SELECT query_id, neighbor_id, dot_q, rank
FROM (
  SELECT query_id, neighbor_id, dot_q,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dot_q DESC, neighbor_id) AS rank
  FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(list_zip(q.v, c.v),
             x -> x[1] * x[2])) AS BIGINT) AS dot_q
    FROM e q, e c
    WHERE q.vec_id IN (0, 1, 2, 3, 4) AND c.vec_id != q.vec_id
  ) s
) r
WHERE rank <= 10
"""


def knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN (rows-only; recall vs brute force pytest-verified).
    Hyperplanes are fixed pseudo-random (seeded) so results are stable."""
    import random

    rng = random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(4)]
    return similarity.knn_lsh(
        t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4],
        planes=planes, k=10,
    )


MIN_DOT_Q = 350_000_000_000  # cosine 0.35 x QUANT^2 on unit vectors


def emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dup_pairs(
        t(spark, sf_dir, "embeddings"), min_dot_q=MIN_DOT_Q
    )


ORACLE_EMB_NEAR_DUP = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * {similarity.QUANT}) AS BIGINT)) AS v
  FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       CAST(list_sum(list_transform(list_zip(a.v, b.v),
         x -> x[1] * x[2])) AS BIGINT) AS dot_q
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE CAST(list_sum(list_transform(list_zip(a.v, b.v),
  x -> x[1] * x[2])) AS BIGINT) >= {MIN_DOT_Q}
"""


def emb_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked numpy-matmul variant — identical output, the scale path."""
    return similarity.embedding_near_dup_pairs_blocked(
        t(spark, sf_dir, "embeddings"), min_dot_q=MIN_DOT_Q
    )


def knn_cosine_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact kNN (per-block local top-k, tiny final rank)."""
    return similarity.knn_bruteforce_blocked(
        t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=10
    )


def knn_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (rows-only; recall vs brute force pytest-verified)."""
    return similarity.knn_ivf(
        t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=10
    ).orderBy("query_id", "rank")


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata extraction through the Arrow/mapInPandas
    seam; the deterministic fake decode keeps it oracle-checkable.

    The decode stage is CPU-bound Python — repartition the (single-file)
    input so every core gets a batch; at scale the landing table is
    already many files and this is a no-op choice.  Only (id, payload)
    cross the Arrow seam: shipping the text/lang/source columns through
    Python would double the batch bytes for nothing (column pruning must
    be applied BEFORE a python stage — Catalyst can't prune through
    mapInPandas)."""
    docs = multimodal.with_payload(t(spark, sf_dir, "documents"))
    return multimodal.extract_meta(
        docs.select("doc_id", "payload").repartition(
            spark.sparkContext.defaultParallelism
        )
    )


ORACLE_MULTIMODAL_META = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CASE WHEN length(text) = 0 THEN 0
            ELSE ascii(text[1]) * 256 + ascii(text[-1]) END AS checksum,
       CAST(320 + octet_length(encode(text)) % 320 AS INT) AS width,
       CAST(240 + octet_length(encode(text)) % 240 AS INT) AS height,
       CASE octet_length(encode(text)) % 3
         WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS fmt
FROM documents
"""


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: multi-row-per-payload mapInPandas expansion.
    Same manual pruning as multimodal_meta: only (id, payload) enter
    the python stage."""
    docs = multimodal.with_payload(t(spark, sf_dir, "documents"))
    return multimodal.sample_frames(
        docs.select("doc_id", "payload").repartition(
            spark.sparkContext.defaultParallelism
        )
    )


ORACLE_MULTIMODAL_FRAMES = """
WITH meta AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         CASE WHEN length(text) = 0 THEN 0
              ELSE ascii(text[1]) * 256 + ascii(text[-1]) END AS checksum
  FROM documents
)
SELECT doc_id, CAST(f AS INT) AS frame_idx,
       checksum + f AS frame_checksum
FROM meta, unnest(range(n_bytes % 4 + 1)) AS u(f)
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.text_stats(t(spark, sf_dir, "documents"))


ORACLE_TEXT_QUALITY = r"""
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       len(list_distinct(string_split_regex(trim(text), '\s+')))
         AS n_distinct_tokens,
       length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         / len(string_split_regex(trim(text), '\s+')) AS mean_token_len,
       CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
         / len(string_split_regex(trim(text), '\s+')) AS distinct_ratio
FROM documents
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_count_bpe_ish(t(spark, sf_dir, "documents"))


ORACLE_TOKEN_COUNTS = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
         AS n_subword_pieces
FROM documents
"""


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.lang_id(t(spark, sf_dir, "documents"))


def _marker_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in textstats.LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), x -> x IN ({markers})))"
        f" AS n_{lang}"
    )


ORACLE_LANG_ID = f"""
SELECT doc_id, lang, n_en, n_de, n_fr, n_es,
       CASE WHEN greatest(n_en, n_de, n_fr, n_es) = 0 THEN 'unknown'
            WHEN n_en = greatest(n_en, n_de, n_fr, n_es) THEN 'en'
            WHEN n_de = greatest(n_en, n_de, n_fr, n_es) THEN 'de'
            WHEN n_fr = greatest(n_en, n_de, n_fr, n_es) THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM (
  SELECT doc_id, lang,
         {_marker_sql('en')},
         {_marker_sql('de')},
         {_marker_sql('fr')},
         {_marker_sql('es')}
  FROM documents
) c
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No SQL oracle (xxhash64) — rows-only check."""
    return textstats.doc_fingerprint(t(spark, sf_dir, "documents"))


PIPELINE_QUERIES = {
    "dedup_exact": (dedup_exact, ORACLE_DEDUP_EXACT),
    "dedup_jaccard_pairs": (dedup_jaccard_pairs, ORACLE_JACCARD),
    "dedup_keep_list": (dedup_keep_list, ORACLE_KEEP_LIST),
    "dedup_minhash_lsh": (dedup_minhash_lsh, None),
    "dedup_simhash": (dedup_simhash, None),
    "knn_cosine_topk": (knn_cosine_topk, ORACLE_KNN),
    "knn_cosine_lsh": (knn_cosine_lsh, None),
    "knn_ivf_topk": (knn_ivf_topk, None),
    "emb_near_dup": (emb_near_dup, ORACLE_EMB_NEAR_DUP),
    "emb_near_dup_blocked": (emb_near_dup_blocked, ORACLE_EMB_NEAR_DUP),
    "knn_cosine_blocked": (knn_cosine_blocked, ORACLE_KNN),
    "multimodal_meta": (multimodal_meta, ORACLE_MULTIMODAL_META),
    "multimodal_frames": (multimodal_frames, ORACLE_MULTIMODAL_FRAMES),
    "text_quality": (text_quality, ORACLE_TEXT_QUALITY),
    "token_counts": (token_counts, ORACLE_TOKEN_COUNTS),
    "lang_id": (lang_id_heuristic, ORACLE_LANG_ID),
    "doc_fingerprints": (doc_fingerprints, None),
}
