"""WebHDFS transport contract tests against an in-process HTTP stub.

The stub speaks the namenode+datanode REST protocol the reference's
libcurl transport consumes (``webhdfsconnector.cpp:79-167,169-238,
655-741``): GETFILESTATUS / LISTSTATUS / ranged OPEN with a 307 datanode
redirect / CREATE with the two-step redirect PUT / MKDIRS / RENAME.
Tests drive the REAL engine surface (pipe_out → pipe_in round trip,
byte-range FLAT scan) through ``webhdfs://`` URIs, asserting on the wire
conversation the stub records — ranged reads and redirect PUTs, not just
URI formatting.
"""
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from h2h_spark import Integer, Layout, String, pipe_in, pipe_out
from h2h_spark.sources.webhdfs import WebHdfsClient, WebHdfsError

from tests.conftest import SF_DIR

CUST_LAYOUT = Layout(
    [("c_custkey", Integer(8)), ("c_name", String(32)), ("c_mktsegment", String(12))]
)


class _Store:
    """Shared in-memory filesystem + request log for one stub server."""

    def __init__(self):
        self.files: dict[str, bytes] = {}
        self.dirs: set[str] = {"/"}
        self.log: list[tuple[str, str, dict]] = []
        self.fail_next: int = 0  # next N data requests answer 500
        self.lock = threading.Lock()


def _make_handler(store: _Store, port_holder: list):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def _q(self):
            u = urllib.parse.urlparse(self.path)
            q = dict(urllib.parse.parse_qsl(u.query))
            path = urllib.parse.unquote(u.path)
            assert path.startswith("/webhdfs/v1")
            return path[len("/webhdfs/v1"):] or "/", q

        def _json(self, obj, status=200):
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _redirect(self, extra="redirected=true"):
            self.send_response(307)
            self.send_header(
                "Location",
                f"http://127.0.0.1:{port_holder[0]}{self.path}&{extra}",
            )
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_GET(self):
            path, q = self._q()
            with store.lock:
                store.log.append(("GET", path, q))
            op = q.get("op")
            if op == "GETFILESTATUS":
                if path in store.files:
                    self._json({"FileStatus": {
                        "type": "FILE", "length": len(store.files[path]),
                        "modificationTime": 1700000000000, "pathSuffix": "",
                    }})
                elif path in store.dirs:
                    self._json({"FileStatus": {
                        "type": "DIRECTORY", "length": 0,
                        "modificationTime": 1700000000000, "pathSuffix": "",
                    }})
                else:
                    self._json({"RemoteException": {"message": "not found"}}, 404)
            elif op == "LISTSTATUS":
                pre = path.rstrip("/") + "/"
                entries = [
                    {"type": "FILE", "length": len(b),
                     "modificationTime": 1700000000000,
                     "pathSuffix": f[len(pre):]}
                    for f, b in store.files.items()
                    if f.startswith(pre) and "/" not in f[len(pre):]
                ]
                self._json({"FileStatuses": {"FileStatus": entries}})
            elif op == "OPEN":
                # namenode role: redirect to the "datanode" (same server)
                if "redirected" not in q:
                    self._redirect()
                    return
                with store.lock:
                    if store.fail_next > 0:
                        store.fail_next -= 1
                        self._json({"RemoteException": {"message": "boom"}}, 500)
                        return
                data = store.files.get(path)
                if data is None:
                    self._json({"RemoteException": {"message": "not found"}}, 404)
                    return
                off = int(q.get("offset", 0))
                ln = int(q["length"]) if "length" in q else len(data) - off
                chunk = data[off : off + ln]
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(chunk)))
                self.end_headers()
                self.wfile.write(chunk)
            else:
                self._json({"RemoteException": {"message": f"bad op {op}"}}, 400)

        def do_PUT(self):
            path, q = self._q()
            with store.lock:
                store.log.append(("PUT", path, q))
            op = q.get("op")
            if op == "CREATE":
                if "redirected" not in q:
                    # namenode step: MUST be dataless; answer the redirect
                    self._redirect()
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                with store.lock:
                    store.files[path] = body
                self.send_response(201)
                self.send_header("Content-Length", "0")
                self.end_headers()
            elif op == "MKDIRS":
                with store.lock:
                    store.dirs.add(path.rstrip("/") or "/")
                self._json({"boolean": True})
            elif op == "RENAME":
                dst = q["destination"]
                with store.lock:
                    ok = path in store.files
                    if ok:
                        store.files[dst] = store.files.pop(path)
                self._json({"boolean": ok})
            else:
                self._json({"RemoteException": {"message": f"bad op {op}"}}, 400)

        def do_DELETE(self):
            path, q = self._q()
            with store.lock:
                store.log.append(("DELETE", path, q))
                store.files.pop(path, None)
                if q.get("recursive") == "true":  # directory delete
                    for k in [f for f in store.files if f.startswith(path + "/")]:
                        del store.files[k]
            self._json({"boolean": True})

    return Handler


@pytest.fixture()
def whdfs():
    store = _Store()
    port_holder = [0]
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), _make_handler(store, port_holder)
    )
    port_holder[0] = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield store, srv.server_address[1]
    srv.shutdown()


def test_create_uses_two_step_redirect_put(whdfs):
    store, port = whdfs
    c = WebHdfsClient("127.0.0.1", port, user="alice")
    c.create("/data/x.bin", b"hello webhdfs")
    assert store.files["/data/x.bin"] == b"hello webhdfs"
    puts = [(p, q) for (m, p, q) in store.log if m == "PUT"]
    # namenode step (no payload, no redirected flag) then datanode step
    assert len(puts) == 2
    assert "redirected" not in puts[0][1] and "redirected" in puts[1][1]
    # -hdfsuser analogue: user.name on every request
    assert all(q.get("user.name") == "alice" for _, q in puts)


def test_ranged_open_and_status(whdfs):
    store, port = whdfs
    store.files["/d/f"] = bytes(range(256)) * 4
    c = WebHdfsClient("127.0.0.1", port)
    assert c.status("/d/f")["length"] == 1024
    assert c.open("/d/f", offset=10, length=5) == bytes(range(10, 15))
    gets = [q for (m, p, q) in store.log if m == "GET" and q.get("op") == "OPEN"]
    # namenode hop + datanode hop, both carrying the range args
    assert gets and all(g["offset"] == "10" and g["length"] == "5" for g in gets)


def test_retry_budget_on_5xx(whdfs):
    store, port = whdfs
    store.files["/r/f"] = b"payload"
    store.fail_next = 2
    # budget 1 (reference default): first 500 is fatal
    with pytest.raises(WebHdfsError):
        WebHdfsClient("127.0.0.1", port, retry_max=1).open("/r/f")
    store.fail_next = 2
    # budget 3 (the CSV macro passes 10): retries through both failures
    assert WebHdfsClient("127.0.0.1", port, retry_max=3).open("/r/f") == b"payload"


def test_4xx_never_retried(whdfs):
    store, port = whdfs
    c = WebHdfsClient("127.0.0.1", port, retry_max=5)
    with pytest.raises(WebHdfsError):
        c.status("/nope")
    n_status = len([1 for (m, p, q) in store.log if q.get("op") == "GETFILESTATUS"])
    assert n_status == 1  # a 404 is a real answer, not a transient


def test_pipe_roundtrip_over_webhdfs(spark, whdfs):
    """The full engine surface over webhdfs://: partitioned FLAT write
    (CREATE redirect PUTs + RENAME commit) then a byte-range scan back
    (GETFILESTATUS + LISTSTATUS + ranged OPENs), matching the original."""
    store, port = whdfs
    cust = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_name", "c_mktsegment")
        .repartition(3)
    )
    uri = f"webhdfs://127.0.0.1:{port}/eng/cust_flat"
    pipe_out(cust, uri, CUST_LAYOUT, hadoop_file_format="FLAT")
    names = sorted(p for p in store.files if p.startswith("/eng/cust_flat/"))
    assert [n for n in names if "part_" in n], names
    back = pipe_in(spark, uri, CUST_LAYOUT, hadoop_file_format="FLAT")
    orig = set(tuple(r) for r in cust.collect())
    got = set(tuple(r) for r in back.collect())
    assert got == orig
    # byte-range scan with forced 2 KiB ranges -> genuinely ranged reads
    from h2h_spark import read_flat

    store.log.clear()
    ranged = read_flat(spark, uri, CUST_LAYOUT, max_partition_bytes=2048)
    assert set(tuple(r) for r in ranged.collect()) == orig
    opens = [q for (m, p, q) in store.log
             if q.get("op") == "OPEN" and "redirected" in q]
    assert len(opens) >= 3
    assert any(int(q.get("offset", 0)) > 0 for q in opens)


def test_cli_so_mf_si_over_webhdfs(spark, whdfs, tmp_path):
    """The full `python -m h2h_spark` surface against the REST stub:
    -so writes part files over webhdfs:// (redirect PUTs), -mf merges
    them namenode-side in part order, -si scans the merged single file
    back (ranged OPENs) — the reference's so→mf→si operator workflow
    end-to-end over its WebHDFS wire protocol, driven through the CLI
    with -host/-port/-transport flags rather than pre-built URIs."""
    import h2h_spark.__main__ as cli

    store, port = whdfs
    cust = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_name", "c_mktsegment")
        .repartition(3)
    )
    src = str(tmp_path / "cust_src")
    cust.write.parquet(src)
    lay = str(tmp_path / "cust_layout.json")
    with open(lay, "w") as f:
        f.write(CUST_LAYOUT.to_json())

    base = [
        "-host", "127.0.0.1", "-port", str(port),
        "-transport", "webhdfs", "-hdfsuser", "svc_etl",
        "-layout", lay, "-filename", "/cli/cust.flat", "-format", "FLAT",
    ]
    assert cli.main(["-so", "-in", src] + base) == 0
    parts = sorted(p for p in store.files if "/cli/cust.flat-parts/" in p)
    assert [p for p in parts if "part_" in p], parts

    assert cli.main(["-mf", "-cleanmerge", "1"] + base) == 0
    assert "/cli/cust.flat" in store.files
    assert not [p for p in store.files if "-parts/part_" in p]  # cleaned

    out = str(tmp_path / "cust_back")
    assert cli.main(["-si", "-out", out] + base) == 0
    back = spark.read.parquet(out)
    assert set(map(tuple, back.collect())) == set(map(tuple, cust.collect()))
    # impersonation flows from -hdfsuser to user.name on the wire
    users = {q.get("user.name") for (_m, p, q) in store.log if "/cli/" in p}
    assert users == {"svc_etl"}


def test_container_sources_over_webhdfs(spark, whdfs):
    """Round-9 shard formats over the cluster transport: a splittable
    TFRecord shard and a member-framed .jsonl.zst shard served by the
    REST stub, scanned through webhdfs:// with forced small ranges —
    the datasources resolve listing/size/ranged-reads through the same
    client stack as the FLAT path."""
    import io

    from h2h_spark.sources.jsonl import read_jsonl_gz, _zst_compress
    from h2h_spark.sources.tfrecord import masked_crc32c, read_tfrecord

    store, port = whdfs
    # build a tfrecord shard in memory
    payloads = [b"wh-%04d|" % i * (i % 4 + 1) for i in range(300)]
    buf = io.BytesIO()
    import struct as _struct

    for data in payloads:
        ln = _struct.pack("<Q", len(data))
        buf.write(ln)
        buf.write(_struct.pack("<I", masked_crc32c(ln)))
        buf.write(data)
        buf.write(_struct.pack("<I", masked_crc32c(data)))
    store.files["/shards/a.tfrecord"] = buf.getvalue()
    store.dirs.add("/shards")
    uri = f"webhdfs://127.0.0.1:{port}/shards/a.tfrecord"
    df = read_tfrecord(spark, uri, max_partition_bytes=2048,
                       include_data=True)
    got = sorted(bytes(r["data"]) for r in df.collect())
    assert got == sorted(payloads)
    opens = [q for (m, p, q) in store.log
             if q.get("op") == "OPEN" and "redirected" in q]
    assert any(int(q.get("offset", 0)) > 0 for q in opens)

    # member-framed .jsonl.zst shard
    lines = ['{"i": %d}' % i for i in range(200)]
    blob = b""
    for lo in range(0, len(lines), 16):
        blob += _zst_compress(
            "".join(ln + "\n" for ln in lines[lo:lo + 16]).encode()
        )
    store.files["/shards/b.jsonl.zst"] = blob
    zuri = f"webhdfs://127.0.0.1:{port}/shards/b.jsonl.zst"
    zdf = read_jsonl_gz(spark, zuri, max_partition_bytes=512, codec="zst")
    assert sorted(r["line"] for r in zdf.collect()) == sorted(lines)
