"""Document-level text operators: language ID, quality profiling,
fingerprint dedup inputs.

These compose the expression builders in ``functions.text`` into
DataFrame transforms over a ``(doc_id, text, ...)`` table.

Scale notes: language_id is explode → broadcast-join against a tiny
profile table → groupBy(doc_id) with map-side combine; the profile
side is always broadcast (a few hundred rows), so the only shuffle is
the per-document re-aggregation, partitioned by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auto_ts_spark.functions import text as TX


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document text-quality metrics (one projection, no shuffle)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        TX.char_count(t).alias("n_chars"),
        TX.token_count(t).alias("n_tokens"),
        TX.bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.round(TX.mean_word_length(t), 6).alias("mean_word_len"),
        F.round(TX.stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(TX.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(TX.digit_ratio(t), 6).alias("digit_ratio"),
        F.round(TX.quality_score(t), 6).alias("quality"),
    )


def language_profile_df(spark: SparkSession) -> DataFrame:
    rows = [
        (lang, word) for lang, words in TX.LANG_PROFILES.items() for word in words
    ]
    return spark.createDataFrame(rows, "lang string, word string")


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Predict language by stopword-profile hit count.

    Deterministic tie-break: highest hit count, then lexicographically
    smallest language code (``min_by`` over (-hits, lang)). Documents
    matching no profile word get 'und' (undetermined).
    """
    spark = df.sparkSession
    profiles = F.broadcast(language_profile_df(spark))
    toks = df.select(
        F.col(id_col), F.explode(TX.tokens(F.col(text_col))).alias("word")
    )
    hits = (
        toks.join(profiles, "word")
        .groupBy(id_col, "lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    best = hits.groupBy(id_col).agg(F.max("hits").alias("max_hits"))
    # deterministic argmax: join back and keep min(lang) among max-hit rows
    out = (
        hits.join(best, id_col)
        .filter(F.col("hits") == F.col("max_hits"))
        .groupBy(id_col)
        .agg(F.min("lang").alias("pred_lang"), F.max("max_hits").alias("hits"))
    )
    all_docs = df.select(id_col)
    return (
        all_docs.join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang"),
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
        )
    )


def corpus_vocabulary(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Corpus term statistics — the vocabulary-building step of a
    training-data pipeline: per term, total occurrences (``tf``),
    document frequency (``df``), and smoothed
    ``idf = ln((N+1)/(df+1)) + 1`` (the sklearn TfidfVectorizer
    convention).

    Scale shape: one explode + ONE shuffle on term (count and
    count-distinct-doc both partial-aggregate map-side); the corpus
    size N is a scalar broadcast into the projection. ``min_df``
    prunes the hapax tail before it is ever shuffled onward.
    """
    n_docs = df.count()
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(TX.tokens(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    stats = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("_doc").alias("df"),
    )
    return stats.filter(F.col("df") >= min_df).select(
        "term",
        "tf",
        "df",
        F.round(F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)) + 1, 6).alias(
            "idf"
        ),
    )


def add_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    *,
    minhash_k: int = 16,
    shingle_n: int = 3,
    simhash_bits: int = 32,
) -> DataFrame:
    """Append content fingerprints: exact (md5-60bit), MinHash
    signature, SimHash — one projection."""
    t = F.col(text_col)
    return df.select(
        "*",
        TX.fingerprint(t).alias("fingerprint"),
        TX.minhash_signature(t, minhash_k, shingle_n).alias("minhash"),
        F.expr(TX.simhash_sql(text_col, simhash_bits)).alias("simhash"),
    )
