"""FLAT codec throughput probe — generates a ~640 MB fixed-width file and
measures full / pruned / pushdown-filtered scan rates (results in SCALE.md).

Usage: python scripts/throughput_probe.py [n_records]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from h2h_spark import get_spark, read_flat
from h2h_spark.layout import Integer, Layout, Real, String

LAY = Layout(
    [
        ("k", Integer(8)),
        ("a", Real(8)),
        ("b", Real(8)),
        ("c", Real(8)),
        ("tag", String(16)),
        ("grp", Integer(4)),
        ("pad", String(12)),
    ]
)
PATH = "/tmp/h2h_tp/big.dat"


def generate(n: int) -> None:
    os.makedirs(os.path.dirname(PATH), exist_ok=True)
    if os.path.exists(PATH) and os.path.getsize(PATH) == n * LAY.record_length:
        return
    with open(PATH, "wb") as f:
        chunk = 1_000_000
        for i in range(0, n, chunk):
            m = min(chunk, n - i)
            pdf = pd.DataFrame(
                {
                    "k": np.arange(i, i + m),
                    "a": np.random.rand(m),
                    "b": np.random.rand(m),
                    "c": np.random.rand(m),
                    "tag": ["tag%05d" % (j % 1000) for j in range(m)],
                    "grp": np.arange(i, i + m) % 100,
                    "pad": ["x" * 12] * m,
                }
            )
            f.write(LAY.pack(pdf))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    generate(n)
    sz = os.path.getsize(PATH) / 1e6
    spark = get_spark("throughput_probe")
    spark.range(10).mapInArrow(lambda it: it, "id long").collect()
    mb = 32 * 1024 * 1024
    probes = [
        ("full_scan_agg", lambda: read_flat(spark, PATH, LAY, max_partition_bytes=mb)
            .groupBy("grp").agg(F.sum("a")).count()),
        ("pruned_2col_sum", lambda: read_flat(spark, PATH, LAY, columns=["k", "a"],
            max_partition_bytes=mb).agg(F.sum("a")).count()),
        ("pushdown_filter", lambda: read_flat(spark, PATH, LAY, max_partition_bytes=mb)
            .filter(F.col("grp") == 7).count()),
    ]
    for label, fn in probes:
        fn()  # warm
        t0 = time.time()
        fn()
        dt = time.time() - t0
        print(f"{label}: {dt:.1f}s = {sz/dt:.0f} MB/s")

    xml_probe(spark, n=min(n, 2_000_000))


XML_PATH = "/tmp/h2h_tp/big.xml"


def xml_probe(spark, n: int) -> None:
    """XML scan throughput over the vectorized flat-row fast path."""
    from h2h_spark import read_xml

    if not (os.path.exists(XML_PATH) and os.path.getsize(XML_PATH) > 0):
        with open(XML_PATH, "w") as f:
            f.write("<Dataset>\n")
            for i in range(n):
                f.write(
                    f"<Row><k>{i}</k><a>{(i % 997) / 7:.4f}</a>"
                    f"<tag>tag{i % 1000:05d}</tag><grp>{i % 100}</grp></Row>\n"
                )
            f.write("</Dataset>\n")
    lay = Layout([("k", Integer(8)), ("a", Real(8)), ("tag", String(16)), ("grp", Integer(4))])
    sz = os.path.getsize(XML_PATH) / 1e6

    def scan():
        return read_xml(spark, XML_PATH, lay, max_partition_bytes=8 * 1024 * 1024) \
            .agg(F.sum("a")).count()

    scan()  # warm
    t0 = time.time()
    scan()
    dt = time.time() - t0
    print(f"xml_full_scan_agg: {dt:.1f}s = {sz/dt:.0f} MB/s ({sz:.0f} MB)")


if __name__ == "__main__":
    main()
