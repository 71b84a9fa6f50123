"""CSV with the ECL dialect (the reference's PipeIn/PipeOut CSV surface).

The reference CSV scan (``streamCSVFileOffset``, ``libhdfsconnector.cpp:
385-566``) is a distributed byte-range scan with record-boundary
realignment: a split skips to the first terminator (unless at offset 0) and
reads past its end to finish the last record, with quote-parity handling of
terminators inside quotes.  Hadoop's ``LineRecordReader`` — which backs
``spark.read.csv`` — implements the *same* split-ownership contract
(SURVEY.md §2.1 O3), so the default read path here is Spark's native CSV
source with the dialect mapped onto reader options:

- SEPARATOR → ``sep`` (default ``,``; the reference parses it but leaves
  field splitting to the host engine — ``hdfsconnector.hpp:339-342``),
- TERMINATOR → ``lineSep`` (default ``\\n``; ``\\r\\n``/``\\r`` are covered
  by Hadoop's universal newline handling; other multi-char terminators use a
  Hadoop ``textinputformat.record.delimiter`` scan + ``from_csv``),
- QUOTE → ``quote`` (default ``'`` — the reference default, not ``"``:
  ``hdfsconnector.hpp:226-228``).  The reference has *no escape character*,
  only quote-parity toggling (``libhdfsconnector.cpp:437-441``); we map to
  doubled-quote escaping (``escape == quote``) which is self-consistent
  across our write→read round trips and never treats backslash specially.

Escaped option characters (``\\n``, ``\\t``, …) are expanded per
``expandEscapedChars`` (``hdfsconnector.hpp:74-129``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from h2h_spark.layout import Layout
from h2h_spark.sources.util import expand_escapes

_UNIVERSAL_TERMINATORS = ("\n", "\r\n", "\r")


def _schema_of(layout_or_schema: Layout | T.StructType) -> T.StructType:
    if isinstance(layout_or_schema, Layout):
        return layout_or_schema.to_struct_type()
    return layout_or_schema


def read_csv(
    spark: SparkSession,
    path: str,
    layout: Layout | T.StructType,
    *,
    sep: str = ",",
    terminator: str = "\\n",
    quote: str = "'",
    header: bool = False,
    embed_newlines: bool = False,
    timestamp_format: str | None = None,
    split_max_bytes: int | None = None,
    max_len: int | None = None,
) -> DataFrame:
    """PipeIn(CSV) analogue (``ecl/HDFSConnector.ecl:101-135``).

    ``embed_newlines=True`` enables Spark's ``multiLine`` mode for files
    whose quoted fields contain the terminator.  Note the scale cliff
    (SURVEY.md §4.2): multiLine disables intra-file splitting, one task per
    file — the reference's quote-parity splitter has the same hazard solved
    differently; prefer terminator-free fields at 100 TB.
    """
    sep = expand_escapes(sep)
    terminator = expand_escapes(terminator)
    quote = expand_escapes(quote)
    schema = _schema_of(layout_or_schema=layout)

    if terminator in _UNIVERSAL_TERMINATORS or len(terminator) == 1:
        reader = (
            spark.read.schema(schema)
            .option("sep", sep)
            .option("quote", quote)
            .option("escape", quote)  # quote-parity: no backslash escapes
            .option("header", str(header).lower())
            .option("mode", "PERMISSIVE")
            .option("emptyValue", "")
            # ECL strings have no null — an empty field is an empty string.
            # Reserve the explicit \N sentinel for genuine SQL nulls so
            # empty strings survive a write→read round trip.
            .option("nullValue", "\\N")
        )
        if terminator not in _UNIVERSAL_TERMINATORS:
            reader = reader.option("lineSep", terminator)
        if embed_newlines:
            reader = reader.option("multiLine", "true")
        if timestamp_format:
            reader = reader.option("timestampFormat", timestamp_format)
        if max_len is not None:
            # The reference aborts a scan that finds no terminator within
            # maxLen*10 bytes (libhdfsconnector.cpp:533-537); the univocity
            # parser's per-column cap is the equivalent runaway-record guard.
            reader = reader.option("maxCharsPerColumn", str(max_len * 10))
        return reader.csv(path)

    # Multi-char custom terminator (e.g. '~~'): the JVM text source accepts
    # a multi-char lineSep and does the distributed boundary-realigned
    # record split (Hadoop LineRecordReader with a custom delimiter — the
    # analogue of the reference's cross-buffer terminator scan,
    # libhdfsconnector.cpp:443-474); from_csv decodes fields.  Entirely
    # JVM-side — no Python in the scan path.
    if header:
        raise NotImplementedError("header with multi-char terminator")
    reader_session = spark
    if split_max_bytes is not None:
        # Forced split sizing through a child session: SQL confs are
        # per-session, so the parent session's planning is untouched while
        # this read plans records straddling every split edge.
        reader_session = spark.newSession()
        reader_session.conf.set(
            "spark.sql.files.maxPartitionBytes", str(split_max_bytes)
        )
        reader_session.conf.set("spark.sql.files.openCostInBytes", "0")
    lines = reader_session.read.option("lineSep", terminator).text(path)
    if max_len is not None:
        # True per-RECORD runaway guard on this path (the reference aborts
        # when no terminator shows up within maxLen*10 bytes,
        # libhdfsconnector.cpp:533-537): a record longer than the cap
        # means the terminator option is wrong for this file — fail the
        # scan instead of parsing garbage.
        cap = max_len * 10
        lines = lines.select(
            F.when(
                F.octet_length("value") > cap,
                F.raise_error(
                    F.concat(
                        F.lit(f"CSV record exceeds maxLen*10={cap} bytes "
                              "without a terminator: "),
                        F.substring("value", 1, 80),
                    )
                ),
            ).otherwise(F.col("value")).alias("value")
        )
    # Same empty-vs-null contract as the single-char path above: quoted
    # empty (quote*2) reads as '', the \N sentinel reads as SQL NULL.
    opts = {
        "sep": sep,
        "quote": quote,
        "escape": quote,
        "mode": "PERMISSIVE",
        "emptyValue": "",
        "nullValue": "\\N",
    }
    if timestamp_format:
        opts["timestampFormat"] = timestamp_format
    parsed = lines.filter(F.length("value") > 0).select(
        F.from_csv(F.col("value"), schema.simpleString(), opts).alias("r")
    )
    return parsed.select("r.*")


def write_csv(
    df: DataFrame,
    path: str,
    *,
    sep: str = ",",
    terminator: str = "\\n",
    quote: str = "'",
    header: bool = False,
    timestamp_format: str | None = None,
    terminate_records: bool = True,
) -> None:
    """PipeOut(CSV) analogue — one part file per partition.

    Uses Spark's native (JVM, codegen'd) CSV sink when the terminator is a
    newline; falls back to ``to_csv`` + the engine's partition-file sink for
    custom terminators.

    ``terminate_records=False`` is the reference's ``-outputterminator 0``
    (``hdfsconnector.hpp:365-368``): the terminator is not re-emitted after
    records (``libhdfsconnector.cpp:490-498`` skips the ``fprintf`` of
    ``eolseq``), so records are concatenated back-to-back.
    """
    sep = expand_escapes(sep)
    terminator = expand_escapes(terminator)
    quote = expand_escapes(quote)

    if not terminate_records:
        _write_csv_unterminated(
            df, path, sep=sep, quote=quote, header=header,
            timestamp_format=timestamp_format,
        )
        return

    if terminator == "\n":
        writer = (
            df.write.mode("overwrite")
            .option("sep", sep)
            .option("quote", quote)
            .option("escape", quote)
            .option("header", str(header).lower())
            # empty string serializes as a quoted-empty in the dialect's own
            # quote char (the default emptyValue is literally two
            # double-quote chars, wrong for quote=') — distinguishable from
            # an unquoted empty (null) field on read
            .option("emptyValue", quote * 2)
            .option("nullValue", "\\N")
        )
        if timestamp_format:
            writer = writer.option("timestampFormat", timestamp_format)
        writer.csv(path)
        return

    # Custom terminator: serialize rows with to_csv and write through the
    # JVM text sink, which accepts a multi-char lineSep (every record,
    # including the last, is terminated — the reference's
    # ``-outputterminator 1`` behavior).
    if header:
        raise NotImplementedError("header with custom terminator")
    line = F.to_csv(
        F.struct(*[F.col(c) for c in df.columns]), _to_csv_opts(sep, quote, timestamp_format)
    )
    (
        df.select(line.alias("value"))
        .write.mode("overwrite")
        .option("lineSep", terminator)
        .text(path)
    )


def _to_csv_opts(sep: str, quote: str, timestamp_format: str | None) -> dict:
    # Mirror the single-char writer's empty-vs-null contract (to_csv's
    # write default would serialize '' as two double-quote chars even when
    # the dialect quote differs, and would not emit the \N null sentinel).
    opts = {
        "sep": sep,
        "quote": quote,
        "escape": quote,
        "emptyValue": quote * 2,
        "nullValue": "\\N",
    }
    if timestamp_format:
        opts["timestampFormat"] = timestamp_format
    return opts


def _write_csv_unterminated(
    df: DataFrame,
    path: str,
    *,
    sep: str,
    quote: str,
    header: bool,
    timestamp_format: str | None,
) -> None:
    """``-outputterminator 0``: serialize records and concatenate them with
    no terminator at all, through the engine's partition sink (one
    ``part_<i>_<N>`` file per partition, task-commit protocol)."""
    if header:
        raise NotImplementedError("header with -outputterminator 0")
    from h2h_spark.sources.sink import write_partition_files

    line = F.to_csv(
        F.struct(*[F.col(c) for c in df.columns]), _to_csv_opts(sep, quote, timestamp_format)
    )

    def _serialize(batch) -> bytes:
        return "".join(batch.column(0).to_pylist()).encode("utf-8")

    write_partition_files(df.select(line.alias("value")), path, _serialize)
