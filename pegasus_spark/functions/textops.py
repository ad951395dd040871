"""Text-analysis operators over a `documents(text, ...)` table.

Everything here is pure `pyspark.sql.functions` (JVM-side, codegen'd;
no Python UDFs at all), so each operator has an exact ANSI-SQL oracle
twin in ``__spark_entry__.oracle_sql`` and scales linearly with
executors — the per-row cost is a handful of string ops, the only
shuffles are the final aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_WS = r"\s+"


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased, trimmed text (trim first so
    leading/trailing whitespace never yields empty tokens — matches the
    DuckDB oracle spec ``string_split_regex(lower(trim(text)), '\\s+')``)."""
    return F.split(F.trim(F.lower(col)), _WS)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring: token count, mean token length,
    punctuation ratio, stopword ratio — the standard cheap filters a
    training-data pipeline applies before expensive dedup."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to", "in")])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop))
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round((F.length(F.regexp_replace(t, _WS, "")) / F.greatest(n_tok, F.lit(1))), 4)
        .alias("mean_token_len"),
        F.round(punct / F.greatest(F.length(t), F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        (n_tok >= 5).alias("len_ok"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    md5 is identical across engines → exact-oracle-checkable; serves as
    the key for exact dedup."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _WS, " "))
    return df.withColumn("fp", F.md5(norm))


def langid_heuristic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tiny n-gram/stopword language-ID heuristic (en/es/fr fallback
    'other'): counts marker-word occurrences, argmax. Deterministic,
    SQL-expressible; a real pipeline swaps in fastText via mapInPandas."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))

    def occ(marker: str) -> Column:
        pat = f" {marker} "
        return (
            (F.length(t) - F.length(F.replace(t, F.lit(pat), F.lit("")))) / len(pat)
        ).cast("int")

    en = (occ("the") + occ("and") + occ("of")).alias("en_score")
    es = (occ("el") + occ("la") + occ("de")).alias("es_score")
    fr = (occ("le") + occ("et") + occ("des")).alias("fr_score")
    return df.select("doc_id", en, es, fr).withColumn(
        "pred_lang",
        F.when((F.col("en_score") >= F.col("es_score"))
               & (F.col("en_score") >= F.col("fr_score"))
               & (F.col("en_score") > 0), "en")
        .when((F.col("es_score") >= F.col("fr_score")) & (F.col("es_score") > 0), "es")
        .when(F.col("fr_score") > 0, "fr")
        .otherwise("other"),
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (built-ins only:
    split → transform over a sequence → array_distinct)."""
    toks = tokens(col)
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(sz - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(F.when(sz >= n, grams).otherwise(F.array(F.concat_ws(" ", toks))))


def _md5_int(col: Column) -> Column:
    """First 8 hex digits of md5 as a long — a 32-bit hash both Spark and
    DuckDB compute identically (the cross-engine-stable hash used for
    minhash oracles)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_signature(df: DataFrame, text_col: str = "text", num_hashes: int = 8,
                      shingle_n: int = 3) -> DataFrame:
    """MinHash signature per document: for seed i, min over shingles of
    md5-int(seed || shingle). Columns mh0..mh{k-1}. Built-ins only."""
    # explode + groupBy (not 8 array_min/transform columns): Catalyst's
    # CollapseProject would inline the shingle-building expression into
    # every mh column, recomputing split/ngrams/distinct per hash seed —
    # exploding materializes each shingle string exactly once, then the 8
    # md5-int mins reduce in a single partial-aggregating shuffle
    sh = df.select(
        "doc_id", F.explode(shingles(F.col(text_col), shingle_n)).alias("_s")
    )
    aggs = [
        F.min(_md5_int(F.concat(F.lit(f"{i}|"), F.col("_s")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return df.join(sig, "doc_id")


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", num_hashes: int = 8,
                      band_size: int = 2) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs: band the signature, self-join
    on (band_id, band_hash) buckets — the shuffle is on band buckets, so
    at scale no O(n²) pair materialization happens; only same-bucket
    pairs meet. Returns (doc_a, doc_b, n_shared_bands)."""
    sig = minhash_signature(df, text_col, num_hashes)
    n_bands = num_hashes // band_size
    bands = sig.select(
        F.col("doc_id"),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(",", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)])
                .alias("band_hash"),
            )
            for b in range(n_bands)
        ])).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", shingle_n: int = 3,
                        block_tokens: int = 4, threshold: float = 0.0) -> DataFrame:
    """Blocked n-gram Jaccard near-dup pairs: block on the md5 of the
    first ``block_tokens`` tokens (prefix blocking — candidate pairs only
    form inside a block, never O(n²)), then exact Jaccard over distinct
    shingle sets via array_intersect/array_union sizes."""
    toks = tokens(F.col(text_col))
    base = df.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(toks, 1, block_tokens))).alias("block"),
        shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    uni = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, "block")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter / F.greatest(uni, F.lit(1)), 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via hash-groupBy on the normalized-text fingerprint:
    (fp, keeper=min doc_id, n_dups)."""
    return (
        fingerprint(df, text_col)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_docs"))
    )
