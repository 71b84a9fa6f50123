"""WAT / WET payload hardening — quarantine, never silently drop.

The WARC *framing* layer (`sources/warc.py`) is loud by design: a
record whose header block is unparseable or whose payload is shorter
than its Content-Length raises with the byte offset (the archive is
corrupt; resuming would mis-frame everything after it).  This module
covers the tier ABOVE framing, where Common Crawl's derived formats
put their real-world mess:

- **WAT** ``metadata`` records carry a JSON envelope.  Truncated or
  non-UTF-8 payloads make ``F.from_json`` return NULL, and a naive
  ``explode`` then drops the record with no trace — the silent-drop
  failure mode a 100 TB ingest must not have.  :func:`wat_links_status`
  classifies every record (``ok`` / ``no_links`` / ``corrupt``) so the
  pipeline can aggregate links AND account the quarantine, mirroring
  the PERMISSIVE-mode contract of the JSONL corrupt-feed path
  (``q_json_corrupt``).
- **WET** ``conversion`` records are *supposed* to be UTF-8 plain
  text, but real shards carry mojibake and raw binary.  A bare
  ``payload.cast("string")`` silently substitutes U+FFFD; downstream
  dedup/hash stages then disagree with the bytes on disk.
  :func:`utf8_valid` is the JVM-side round-trip check (decode →
  encode → compare) that lets the scan quarantine binary payloads
  without a Python UDF.

Everything here is Spark built-ins — whole-stage codegen, map-only,
no shuffle beyond the caller's own aggregation.

Reference parity: the reference engine surfaces malformed-record
failures from its record-oriented readers loudly per record
(hdfsconnector stream framing); the quarantine tier is this repo's
extension for crawl-scale ingest (SURVEY §2 E-family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def utf8_valid(payload: Column | str) -> Column:
    """True iff ``payload`` (binary) is valid UTF-8, via the JVM
    round-trip ``encode(decode(b)) == b`` — invalid sequences pick up
    U+FFFD on decode and fail the byte compare.  No Python UDF."""
    b = F.col(payload) if isinstance(payload, str) else payload
    return F.encode(b.cast("string"), "UTF-8") == b


def wat_links_status(
    df: DataFrame,
    payload_col: str,
    envelope_schema: StructType,
    links_path: str = "Envelope.`Payload-Metadata`"
                      ".`HTTP-Response-Metadata`.`HTML-Metadata`.Links",
) -> DataFrame:
    """Classify every WAT record instead of silently dropping parse
    failures.  Adds:

    - ``wat_status``: ``ok`` (envelope parsed, links present),
      ``no_links`` (valid envelope, no link array — e.g. non-HTML
      pages), ``corrupt`` (payload not valid UTF-8, or JSON that does
      not parse against the envelope schema);
    - ``links``: the link array (empty, never NULL, for non-ok rows so
      a downstream ``explode_outer``/``size`` never poisons on NULL).

    One map-only projection; the caller owns any aggregation shuffle.
    """
    j = F.from_json(
        F.col(payload_col).cast("string"), envelope_schema
    )
    # from_json yields NULL for malformed JSON (and for mojibake the
    # binary→string cast produced); a parsed envelope with no Links is
    # the distinct, legitimate "metadata for a non-HTML page" case.
    out = df.withColumn("__wat_j", j)
    links = F.expr(f"__wat_j.{links_path}")
    out = out.withColumn(
        "wat_status",
        F.when(links.isNotNull(), F.lit("ok"))
        .when(
            F.col("__wat_j").isNotNull()
            & F.col("__wat_j.Envelope").isNotNull(),
            F.lit("no_links"),
        )
        .otherwise(F.lit("corrupt")),
    ).withColumn(
        "links",
        F.when(links.isNotNull(), links).otherwise(
            F.array().cast(links_schema_of(envelope_schema, links_path))
        ),
    ).drop("__wat_j")
    return out


def links_schema_of(envelope_schema: StructType, links_path: str):
    """Resolve the DataType at ``links_path`` inside the envelope
    schema (so the empty-array fallback is type-identical)."""
    cur = envelope_schema
    for part in links_path.replace("`", "").split("."):
        cur = cur[part].dataType  # type: ignore[index]
    return cur


def wet_text_status(df: DataFrame, payload_col: str) -> DataFrame:
    """Classify WET ``conversion`` payloads: ``ok`` for valid UTF-8
    text, ``binary_quarantined`` otherwise.  The payload bytes are kept
    either way — quarantined rows stay addressable for audit/retry,
    matching the corrupt-column contract of the JSONL feed path."""
    return df.withColumn(
        "wet_status",
        F.when(utf8_valid(payload_col), F.lit("ok"))
        .otherwise(F.lit("binary_quarantined")),
    )
