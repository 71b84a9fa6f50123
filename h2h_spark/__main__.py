"""CLI — the reference's ``hdfspipe`` invocation surface on Spark.

The reference is driven as a command-line connector
(``hdfspipe <action> -flags…``, ``hdfsconnector.hpp:205-429``); this
entry point accepts the same single-dash flag names so an operator's
existing invocations translate 1:1:

  python -m h2h_spark -si  -filename F -format FLAT -layout lay.json -out D
  python -m h2h_spark -so  -in D -filename F -format "CSV(SEPARATOR('|'))" -layout lay.json
  python -m h2h_spark -sop -in D -filename F -format FLAT -layout lay.json
  python -m h2h_spark -mf  -filename F [-cleanmerge 1]

Mapping notes (SURVEY.md §2.1 O14/O15):
- ``-si`` (stream in) materializes the wire-format file and writes
  parquet to ``-out`` — the "host engine" side of the pipe is parquet
  here instead of a FIFO.
- ``-so``/``-sop`` read parquet from ``-in`` and run PipeOut /
  PipeOutAndMerge.
- ``-clustercount``/``-nodeid`` are validated exactly like the
  reference's ``validateParameters`` (``hdfsconnector.hpp:173-203``) but
  then IGNORED: Spark plans splits itself — one invocation covers all
  nodes, which is the point of the port.
- ``-separator``/``-terminator``/``-quote``/``-rowtag`` compose into the
  ECL format expression when ``-format`` is a bare ``CSV``/``XML``.
- escape sequences in delimiters expand per O17 (``expandEscapedChars``).
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_format(args) -> str:
    fmt = args.format.strip()
    bare = fmt.upper()
    if bare == "CSV":
        opts = []
        if args.separator:
            opts.append(f"SEPARATOR('{args.separator}')")
        if args.terminator:
            opts.append(f"TERMINATOR('{args.terminator}')")
        if args.quote is not None:
            opts.append(f"QUOTE('{args.quote}')")
        return "CSV(" + ",".join(opts) + ")" if opts else "CSV"
    if bare == "XML" and args.rowtag:
        return f"XML('{args.rowtag}')"
    return fmt


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="h2h_spark", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    act = p.add_mutually_exclusive_group(required=True)
    act.add_argument("-si", action="store_true", help="stream in (PipeIn)")
    act.add_argument("-so", action="store_true", help="stream out (PipeOut)")
    act.add_argument("-sop", action="store_true", help="stream out + merge")
    act.add_argument("-mf", action="store_true", help="merge parts only")
    p.add_argument("-filename", required=True)
    p.add_argument("-format", default="FLAT")
    p.add_argument("-layout", help="Layout JSON (path or inline)")
    p.add_argument("-in", dest="input", help="parquet input for -so/-sop")
    p.add_argument("-out", help="parquet output for -si")
    p.add_argument("-host", default=None)
    p.add_argument("-port", type=int, default=None)
    p.add_argument("-hdfsuser", default="")
    p.add_argument(
        "-transport", choices=("hdfs", "webhdfs"), default="hdfs",
        help="connector (the reference's build-time HDFS_CONNECTOR_TYPE "
             "as a runtime choice): hdfs:// via the Hadoop client, or "
             "webhdfs:// via the engine's REST client",
    )
    p.add_argument("-separator", default=None)
    p.add_argument("-terminator", default=None)
    p.add_argument("-quote", default=None)
    p.add_argument("-rowtag", default=None)
    p.add_argument("-cleanmerge", type=int, default=0)
    p.add_argument("-clustercount", type=int, default=1)
    p.add_argument("-nodeid", type=int, default=0)
    p.add_argument("-wuid", default=None, help="accepted for parity; unused")
    p.add_argument("-verbose", action="store_true")
    args = p.parse_args(argv)

    # validateParameters parity (hdfsconnector.hpp:173-203)
    if args.clustercount <= 0:
        p.error("-clustercount must be > 0")
    if not (0 <= args.nodeid < args.clustercount):
        p.error("-nodeid must be in [0, clustercount)")

    from h2h_spark import get_spark
    from h2h_spark.api import pipe_in, pipe_out, pipe_out_and_merge
    from h2h_spark.layout import Layout
    from h2h_spark.sources.merge import merge_parts

    def load_layout() -> Layout:
        if not args.layout:
            p.error("-layout is required for this action")
        text = args.layout
        if not text.lstrip().startswith("{") and not text.lstrip().startswith("["):
            with open(text) as f:
                text = f.read()
        return Layout.from_json(text)

    spark = get_spark("h2h_spark_cli")
    fmt = _build_format(args)
    if args.si:
        if not args.out:
            p.error("-si requires -out")
        df = pipe_in(
            spark, args.filename, load_layout(), fmt,
            args.host, args.port, args.hdfsuser, transport=args.transport,
        )
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"action": "si", "rows": n, "out": args.out}))
    elif args.so or args.sop:
        if not args.input:
            p.error("this action requires -in")
        df = spark.read.parquet(args.input)
        if args.sop:
            pipe_out_and_merge(
                df, args.filename, load_layout(), fmt,
                args.host, args.port, args.hdfsuser,
                transport=args.transport,
            )
        else:
            # PipeOut writes `<name>-parts/part_<i>_<N>` (ecl:175-209) so
            # a later -mf invocation finds them where the reference would.
            pipe_out(
                df, args.filename + "-parts", load_layout(), fmt,
                args.host, args.port, args.hdfsuser,
                transport=args.transport,
            )
        print(json.dumps({"action": "sop" if args.sop else "so",
                          "filename": args.filename}))
    else:  # -mf
        from h2h_spark.api import _resolve

        target = _resolve(
            args.filename, args.host, args.port, args.transport, args.hdfsuser
        )
        n_bytes = merge_parts(
            target + "-parts", target, clean=bool(args.cleanmerge)
        )
        print(json.dumps({"action": "mf", "bytes": n_bytes}))
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
