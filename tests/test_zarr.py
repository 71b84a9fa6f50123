"""Zarr v2 source: descriptor validation, chunk-grid reads, edge
padding, missing-chunk fill, loud failure paths."""

import json

import numpy as np
import pytest

from h2h_spark.sources.zarr import (
    read_zarr,
    read_zarray,
    write_zarr_chunk,
    write_zarray,
)


def _build_store(tmp_path, n=50, d=10, cn=16, cd=4, compressor=None,
                 seed=2):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, d)).astype("<f4")
    store = str(tmp_path / "s.zarr")
    write_zarray(store, (n, d), (cn, cd), "<f4", compressor=compressor)
    for ci in range(-(-n // cn)):
        for cj in range(-(-d // cd)):
            block = np.zeros((cn, cd), dtype="<f4")
            rows = mat[ci * cn:(ci + 1) * cn, cj * cd:(cj + 1) * cd]
            block[:rows.shape[0], :rows.shape[1]] = rows
            write_zarr_chunk(store, ci, cj, block, compressor=compressor)
    return store, mat


@pytest.mark.parametrize("compressor", [None, "zlib"])
def test_roundtrip_with_edge_chunks(spark, tmp_path, compressor):
    store, mat = _build_store(tmp_path, compressor=compressor)
    df = read_zarr(spark, store, chunk_rows_per_split=2)
    rows = {r.row_idx: r.vec for r in df.collect()}
    assert len(rows) == 50
    got = np.array([rows[i] for i in range(50)], dtype="<f4")
    assert (got == mat).all()


def test_missing_chunk_is_fill_value(spark, tmp_path):
    store, mat = _build_store(tmp_path, n=20, d=4, cn=8, cd=4)
    import os

    os.unlink(os.path.join(store, "1.0"))
    rows = {r.row_idx: r.vec for r in read_zarr(spark, store).collect()}
    assert rows[3] == mat[3].tolist()
    assert rows[9] == [0.0, 0.0, 0.0, 0.0]  # absent chunk -> fill


def test_descriptor_guards(tmp_path):
    store = str(tmp_path / "bad.zarr")
    write_zarray(store, (4, 4), (2, 2))
    z = json.load(open(store + "/.zarray"))
    for patch, msg in [
        ({"zarr_format": 3}, "zarr_format"),
        ({"order": "F"}, "order"),
        ({"compressor": {"id": "blosc"}}, "blosc"),
        ({"dtype": "<c8"}, "dtype"),
        ({"shape": [4]}, "2-D"),
    ]:
        bad = dict(z, **patch)
        json.dump(bad, open(store + "/.zarray", "w"))
        with pytest.raises(ValueError, match=msg):
            read_zarray(store)
    with pytest.raises(ValueError, match=".zarray"):
        read_zarray(str(tmp_path / "nostore"))


def test_short_chunk_is_loud(spark, tmp_path):
    store, _ = _build_store(tmp_path, n=8, d=4, cn=8, cd=4)
    with open(store + "/0.0", "wb") as f:
        f.write(b"\x00" * 12)  # not cn*cd*4
    with pytest.raises(Exception, match="full-size"):
        read_zarr(spark, store).collect()
