"""h2h_spark — a PySpark-native analytics engine with the capabilities of
hpcc-systems/h2h (the HPCC<->HDFS connector), rebuilt Spark-first.

The reference (read-only at /root/reference) provides distributed,
record-boundary-correct scans and writes of three wire formats — fixed-width
binary (FLAT), delimited CSV with an ECL dialect, and row-tag XML — plus a
single-file merge, over HDFS/WebHDFS transports (SURVEY.md §0).  h2h_spark
re-expresses that surface as:

- a declared-layout schema DSL (:mod:`h2h_spark.layout`) mirroring ECL
  RECORD structures (``ecl/HDFSConnector.ecl:46,140``),
- DataFrame sources/sinks (:mod:`h2h_spark.sources`) for FLAT/CSV/XML with
  Spark-native split planning replacing the reference's per-node offset math
  (``libhdfsconnector.cpp:652-707``),
- a merge operator preserving partition-index order
  (``libhdfsconnector.cpp:709-831``),
- and — beyond the reference — LLM-data-pipeline operators
  (:mod:`h2h_spark.operators`): dedup, similarity search, text analysis,
  multimodal binary columns; plus structured-streaming helpers
  (:mod:`h2h_spark.streaming`).

Everything is driven through the standard DataFrame/Catalyst query surface;
there is no custom optimizer (the reference has none either — SURVEY.md §4).
"""

from h2h_spark.layout import (
    Layout,
    String,
    Unsigned,
    Integer,
    Real,
    Boolean,
    Data,
    PackedDecimal,
)
from h2h_spark.api import pipe_in, pipe_out, pipe_out_and_merge
from h2h_spark.session import get_spark
from h2h_spark.sources.csv import read_csv, write_csv
from h2h_spark.sources.flat import read_flat, write_flat
from h2h_spark.sources.xml import read_xml, write_xml
from h2h_spark.sources.merge import merge_parts, write_single_file
from h2h_spark.sources.meta import (
    file_status,
    orc_stripe_stats,
    parquet_rowgroup_stats,
)

# crawl / container / training-shard sources (lazy-heavy deps kept out of
# the hot import path are imported inside these modules as needed)
from h2h_spark.sources.warc import read_warc, read_warc_gz, read_warc_zst
from h2h_spark.sources.tar import read_tar, read_tar_gz
from h2h_spark.sources.zipsrc import read_zip
from h2h_spark.sources.arrowipc import read_arrow_ipc
from h2h_spark.sources.tfrecord import (
    read_tfrecord,
    write_tf_examples,
    write_tfrecords,
    write_tfrecords_gz,
)
from h2h_spark.sources.jsonl import read_jsonl_gz, write_jsonl_shards
from h2h_spark.sources.mbox import read_mbox
from h2h_spark.sources.sqlitesrc import read_sqlite
from h2h_spark.sources.safetensors import (
    read_safetensors,
    safetensors_index_audit,
    safetensors_meta,
    write_safetensors,
)
from h2h_spark.sources.npy import read_npy, read_npz
from h2h_spark.sources.gguf import gguf_meta, parse_gguf_meta, write_gguf
from h2h_spark.sources.zarr import read_zarr

__all__ = [
    "Layout",
    "String",
    "Unsigned",
    "Integer",
    "Real",
    "Boolean",
    "Data",
    "PackedDecimal",
    "get_spark",
    "read_csv",
    "write_csv",
    "read_flat",
    "write_flat",
    "read_xml",
    "write_xml",
    "merge_parts",
    "write_single_file",
    "file_status",
    "orc_stripe_stats",
    "parquet_rowgroup_stats",
    "pipe_in",
    "pipe_out",
    "pipe_out_and_merge",
    "read_warc",
    "read_warc_gz",
    "read_warc_zst",
    "read_tar",
    "read_tar_gz",
    "read_zip",
    "read_arrow_ipc",
    "read_tfrecord",
    "write_tf_examples",
    "write_tfrecords",
    "write_tfrecords_gz",
    "read_jsonl_gz",
    "write_jsonl_shards",
    "read_mbox",
    "read_sqlite",
    "read_safetensors",
    "safetensors_index_audit",
    "safetensors_meta",
    "write_safetensors",
    "read_npy",
    "read_npz",
    "gguf_meta",
    "parse_gguf_meta",
    "write_gguf",
    "read_zarr",
]

__version__ = "0.1.0"
