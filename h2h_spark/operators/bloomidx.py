"""File-skipping secondary index: per-file zone maps + Bloom filters.

The lakehouse pruning story (Delta/Iceberg data skipping, Parquet
column-index pages) in operator form: a sidecar table with one row per
data file — ``(file, n_rows, min/max of the layout key, Bloom filter
over a point-lookup key)`` — lets a point query decide WHICH FILES TO
OPEN before any scan task launches.  At 100 TB the scan-task *launch*
is the cost; a 1-in-1000-file lookup that schedules 1000 tasks to
filter 999 of them to zero wastes the cluster, while a sidecar probe is
one small-table operation.

Build shape: one pass over the data grouped by ``input_file_name()`` —
an applyInPandas per file computes the zone map and sets the Bloom bits
in numpy (md5-salted k-hash, engine-portable and deterministic).  The
sidecar is O(files), kilobytes per file; rebuilding after append only
touches new files (the index is per-file, hence trivially incremental).

Probe shape: the probe-key set (a point-lookup list — bounded by
construction) tests against every file's Bloom in one pass over the
SIDECAR (not the data); survivors are read via an explicit path list,
then the exact predicate runs.  False positives cost one extra file
read; false negatives cannot happen (Bloom guarantee), so results are
exact — correctness never depends on the index.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pandas as pd

_K_HASHES = 7
_BITS_PER_KEY = 12  # ~0.3% false-positive rate at k=7


def _bloom_positions(key: str, m_bits: int):
    """k deterministic bit positions for a key: md5(key:salt) per salt —
    portable, no Python hash randomization."""
    for j in range(_K_HASHES):
        h = hashlib.md5(f"{key}:{j}".encode()).digest()
        yield int.from_bytes(h[:8], "big") % m_bits


def build_file_index(
    spark: SparkSession, data_dir: str, key_col: str, layout_col: str
) -> DataFrame:
    """One row per parquet file under ``data_dir``: zone map over
    ``layout_col`` + Bloom over ``key_col``.  One data pass, grouped by
    ``input_file_name()``; Bloom sized at build time from the file's
    row count."""
    df = spark.read.parquet(data_dir).select(
        F.col(key_col).cast("string").alias("__key"),
        F.col(layout_col).alias("__lay"),
        F.input_file_name().alias("file"),
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["__key"].dropna().unique()
        m_bits = max(64, 1 << math.ceil(math.log2(max(1, len(keys)) * _BITS_PER_KEY)))
        bits = bytearray(m_bits // 8)
        for k in keys:
            for pos in _bloom_positions(k, m_bits):
                bits[pos >> 3] |= 1 << (pos & 7)
        return pd.DataFrame(
            {
                "file": [pdf["file"].iloc[0]],
                "n_rows": [len(pdf)],
                "min_lay": [pdf["__lay"].min()],
                "max_lay": [pdf["__lay"].max()],
                "m_bits": [m_bits],
                "bloom": [bytes(bits)],
            }
        )

    lay_type = dict(df.dtypes)["__lay"]
    schema = (
        "file string, n_rows long, "
        f"min_lay {lay_type}, max_lay {lay_type}, m_bits int, bloom binary"
    )
    return df.groupBy("file").applyInPandas(lambda _k, p: _build(p), schema)


def prune_files(index: DataFrame, probe_keys: list) -> list[str]:
    """Files whose Bloom possibly contains ANY of ``probe_keys`` — the
    sidecar pass.  The probe set is a bounded point-lookup list (that is
    the operator's contract; range queries use the zone-map columns
    instead), so shipping it into the closure is O(|probes|)."""
    probes = [str(k) for k in probe_keys]

    def _test(batches):
        for pdf in batches:
            keep = []
            for _, row in pdf.iterrows():
                m_bits = int(row["m_bits"])
                bits = row["bloom"]
                hit = False
                for p in probes:
                    if all(
                        bits[pos >> 3] & (1 << (pos & 7))
                        for pos in _bloom_positions(p, m_bits)
                    ):
                        hit = True
                        break
                keep.append(hit)
            yield pdf.loc[keep, ["file"]]

    kept = index.select("file", "m_bits", "bloom").mapInPandas(
        _test, "file string"
    )
    return [r["file"] for r in kept.collect()]


def read_point_lookup(
    spark: SparkSession,
    index: DataFrame,
    key_col: str,
    probe_keys: list,
) -> DataFrame:
    """Exact point-lookup through the index: Bloom-prune the file list,
    read ONLY the surviving files, then apply the exact key predicate
    (Bloom false positives die here).  Returns an empty frame with the
    data schema when everything prunes."""
    files = prune_files(index, probe_keys)
    if not files:
        any_file = [r["file"] for r in index.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError(
                "bloom index is empty — no indexed files to derive the "
                "data schema from; build the index before probing it"
            )
        empty = spark.read.parquet(*any_file).limit(0)
        return empty.where(F.lit(False))
    return spark.read.parquet(*files).where(F.col(key_col).isin(probe_keys))
