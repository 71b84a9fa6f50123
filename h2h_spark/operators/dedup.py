"""Deduplication operators — exact and near-duplicate (engine extension,
SURVEY.md §2.3 E1; not present in the reference, which delegates all
relational work to the host engine).

All hot paths are built-in Spark SQL functions (JVM, codegen) — no Python
UDFs.  Scale posture for 100 TB:

- exact dedup is one hash-shuffle on the dedup key; with AQE skew handling
  on (session default) a hot text value cannot strand a task;
- MinHash-LSH banding turns the quadratic near-dup problem into b
  equi-join shuffles on (band, band_hash) — candidates only, verified
  exactly afterwards;
- candidate generation filters hub buckets (``max_bucket``) so a
  degenerate shingle cannot produce a quadratic bucket.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERSENNE = 2147483647  # 2^31-1; keeps (a*h+b) products inside long range


def tokens(col: Column | str) -> Column:
    """Lowercased alphanumeric tokens (shared with the text operators)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != F.lit(""))


def word_shingles(col: Column | str, k: int = 4) -> Column:
    """Distinct word k-grams; documents shorter than k words contribute one
    whole-document shingle."""
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= k, grams).otherwise(F.array(F.array_join(toks, " ")))
    )


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Canonical exact dedup: one row per distinct key, represented by the
    minimum id (deterministic, unlike ``dropDuplicates``)."""
    return df.groupBy(*cols).agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_copies")
    )


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Per-document MinHash signature: ``(id, sig array<bigint>)``.

    One explode + one groupBy (single shuffle keyed by id); the k hash
    functions are universal hashes ``(a*h + b) mod 2^31-1`` over a base
    ``xxhash64`` — all JVM-side, and the modulus keeps products inside
    signed-64 range so the plan is ANSI-safe.
    """
    params = _hash_params(num_hashes, seed)
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_k)).alias("shingle")
    )
    base = F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE))
    aggs = [
        F.min(F.pmod(base * F.lit(a) + F.lit(b), F.lit(_MERSENNE))).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 4,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 200,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding, exactly verified.

    Returns ``(id_a, id_b, jaccard)`` with ``id_a < id_b`` and true shingle
    Jaccard >= threshold.  Buckets larger than ``max_bucket`` are dropped
    (hub-shingle guard — at 100 TB a degenerate bucket is a quadratic bomb;
    real near-dup clusters that large are better handled by exact dedup
    first).
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, seed)

    band_entries = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("sig", j * rows + 1, rows),
                                    lambda x: x.cast("string"),
                                ),
                                "_",
                            )
                        ).alias("bucket"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

    counts = band_entries.groupBy("band", "bucket").count()
    pruned = band_entries.join(
        counts.filter(F.col("count") <= max_bucket).drop("count"),
        ["band", "bucket"],
    )
    a = pruned.alias("a")
    b = pruned.alias("b")
    cand = (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.bucket") == F.col(f"b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )

    shingle_sets = df.select(
        F.col(id_col), word_shingles(text_col, shingle_k).alias("sh")
    )
    sa = shingle_sets.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
    )
    sb = shingle_sets.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 4,
    threshold: float = 0.5,
    max_doc_freq: int = 20,
) -> DataFrame:
    """Exact shingle-Jaccard near-dup pairs with rare-shingle candidates.

    Deterministic and SQL-expressible (DuckDB oracle twin in
    ``__spark_entry__``): candidates share >=1 shingle with document
    frequency <= ``max_doc_freq``; each candidate pair is scored by exact
    Jaccard over distinct shingle sets.  The DF cap bounds the self-join:
    a shingle occurring in d docs yields at most d(d-1)/2 candidates.
    """
    sh_sets = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, shingle_k).alias("sh")
    )
    exploded = sh_sets.select("id", F.explode("sh").alias("shingle"))
    df_counts = exploded.groupBy("shingle").count()
    rare = exploded.join(
        df_counts.filter(F.col("count") <= max_doc_freq).drop("count"), "shingle"
    )
    a = rare.alias("a")
    b = rare.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sh_sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh_sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """63-bit SimHash fingerprint per document (bit 63 left clear to stay in
    signed-long range): ``(id, simhash bigint)``."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = F.xxhash64("tok")
    aggs = [
        F.sum(
            (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"b{j}")
        for j in range(63)
    ]
    sums = tok.groupBy(id_col).agg(*aggs)
    fp = None
    for j in range(63):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, j)
        fp = term if fp is None else fp + term
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``.

    Pigeonhole banding: split the 63-bit fingerprint into ``chunks`` bands
    and equi-join on any identical band (distance <= chunks-1 guarantees a
    shared band) — same shuffle shape as MinHash banding.
    """
    fps = simhash64(df, id_col, text_col)
    width = 64 // chunks
    entries = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright(F.col("simhash"), j * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for j in range(chunks)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.chunk")
    a = entries.alias("a")
    b = entries.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.withColumn("hamming", dist).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")
