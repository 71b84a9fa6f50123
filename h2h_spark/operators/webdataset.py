"""WebDataset sample assembly — the tar-shard training-data convention
(public: webdataset/webdataset docs; also used by img2dataset / LAION
tooling).  A sample is the run of CONSECUTIVE tar members sharing a
key (the basename up to its first dot): ``000017.jpg  000017.cls
000017.json`` is one sample with three fields keyed by extension.

Scale shape: WebDataset's own contract is shard-level parallelism —
shards are written ~100 MB-1 GB precisely so a 100 TB corpus is
~10^5-10^6 shards, far above any executor count; samples never span
shards.  So the engine assembles one shard per task through the
existing validated ustar walker (`sources/tar.py:scan_tar_range`),
holding one sample in memory at a time and yielding bounded Arrow
batches.  Sample contiguity is VERIFIED, not assumed: a key that
reappears after its run closed is a loud error (the convention's core
guarantee — a silent regroup would mask writer bugs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from h2h_spark.sources.util import list_part_files


def split_wds_key(name: str) -> tuple[str, str]:
    """``dir/000017.seg.json`` → (``dir/000017``, ``seg.json``) — key is
    everything up to the FIRST dot of the basename (WebDataset rule:
    extensions may themselves contain dots)."""
    slash = name.rfind("/")
    dot = name.find(".", slash + 1)
    if dot < 0:
        return name, ""
    return name[:dot], name[dot + 1:]


def iter_wds_samples(path: str):
    """Yield ``(key, {ext: content_bytes})`` per sample of one tar
    shard, verifying key contiguity."""
    from h2h_spark.sources.tar import scan_tar_range
    from h2h_spark.sources.util import file_size

    seen: set[str] = set()
    cur_key: str | None = None
    cur: dict[str, bytes] = {}
    for hdr, content in scan_tar_range(path, 0, file_size(path)):
        if hdr["typeflag"] not in ("0", "\x00"):
            continue  # directories / links carry no sample fields
        key, ext = split_wds_key(hdr["name"])
        if key != cur_key:
            if cur_key is not None:
                yield cur_key, cur
                seen.add(cur_key)
            if key in seen:
                raise ValueError(
                    f"{path}: sample key {key!r} reappears after its run "
                    "closed — WebDataset samples must be contiguous"
                )
            cur_key, cur = key, {}
        if ext in cur:
            raise ValueError(
                f"{path}: duplicate field {ext!r} for sample {key!r}"
            )
        cur[ext] = content
    if cur_key is not None:
        yield cur_key, cur


def wds_samples(spark: SparkSession, path: str) -> DataFrame:
    """Assemble WebDataset samples from every ``.tar`` shard under
    ``path``: one row per sample — ``(shard, key, n_fields, exts,
    total_bytes, field_md5)`` where ``exts`` is the sorted extension
    list and ``field_md5`` maps ext → md5 of its bytes."""
    files = sorted(list_part_files(path, pattern="*.tar"))
    if not files:
        raise ValueError(f"no .tar shards under {path}")
    fdf = spark.createDataFrame(
        [(f,) for f in files], "shard string"
    ).repartition(min(len(files), 64))

    def _run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for shard in pdf["shard"]:
                for key, fields in iter_wds_samples(shard):
                    exts = sorted(fields)
                    rows.append((
                        shard, key, len(fields), exts,
                        sum(len(v) for v in fields.values()),
                        {e: hashlib.md5(fields[e]).hexdigest()
                         for e in exts},
                    ))
                if len(rows) >= 65536:
                    yield pd.DataFrame(rows, columns=[
                        "shard", "key", "n_fields", "exts",
                        "total_bytes", "field_md5",
                    ])
                    rows = []
            yield pd.DataFrame(rows, columns=[
                "shard", "key", "n_fields", "exts", "total_bytes",
                "field_md5",
            ])

    return fdf.mapInPandas(
        _run,
        "shard string, key string, n_fields int, exts array<string>, "
        "total_bytes bigint, field_md5 map<string,string>",
    )


def write_wds_shard(path: str, samples) -> None:
    """Fixture/interop writer: one tar shard from ``(key, {ext:
    bytes})`` pairs, members emitted key-contiguously in the given
    order, pinned mtime."""
    from h2h_spark.sources.tar import ustar_member_bytes

    with open(path, "wb") as f:
        for key, fields in samples:
            for ext in sorted(fields):
                f.write(ustar_member_bytes(f"{key}.{ext}", fields[ext]))
        f.write(b"\x00" * 1024)
