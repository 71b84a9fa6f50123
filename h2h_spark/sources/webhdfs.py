"""WebHDFS REST transport — pure-Python client for ``webhdfs://`` URIs.

Implements the same REST conversation as the reference's hand-rolled
libcurl transport (``webhdfsconnector.cpp``):

- ``GETFILESTATUS`` → file length/type (``getFileSize``/``connect``
  probing, ``webhdfsconnector.cpp:79-167``),
- ``LISTSTATUS`` → directory entries (merge/scan part discovery),
- ``OPEN&offset=&length=`` → RANGED reads: every byte-range task asks
  the namenode for exactly its slice and follows the 307 redirect to a
  datanode (``readFileOffset``'s ``CURLOPT_FOLLOWLOCATION`` + offset
  query args, ``webhdfsconnector.cpp:169-238``),
- ``CREATE`` → the documented TWO-STEP redirect write: a dataless PUT to
  the namenode answers 307 with the datanode location, the payload PUT
  goes there (``writeFlatOffset``'s redirect handling,
  ``webhdfsconnector.cpp:655-741``).  ``MKDIRS``/``RENAME``/``DELETE``
  cover the sink's temp-file commit protocol.
- ``user.name=`` impersonation on every request (the ``-hdfsuser``
  analogue, ``webhdfsconnector.cpp:685``); retry budget per request (the
  ``-whdfsretrymax`` analogue, default 1, ``hdfsconnector.hpp:236``) with
  linear backoff on connection errors and 5xx, never on 4xx.

Scale posture: reads are streamed (``http.client`` response objects are
consumed in chunks by the byte-range scanners) and strictly ranged — a
1000-task scan issues 1000 independent slice GETs, the same access
pattern the reference's per-node offset reads produce.  Writes stage the
part payload and ship it in one redirect PUT per part file, matching the
reference's staging (``-so``) mode.
"""

from __future__ import annotations

import io
import json
import os
import time
import urllib.parse
from http import client as http_client

_RETRY_MAX_ENV = "H2H_WEBHDFS_RETRY_MAX"
_USER_ENV = "HADOOP_USER_NAME"


class WebHdfsError(IOError):
    pass


def parse_uri(uri: str) -> tuple[str, int, str]:
    """``webhdfs://[user@]host:port/path`` → (host, port, absolute path).
    Userinfo (impersonation) is read by :func:`client_for`."""
    u = urllib.parse.urlparse(uri)
    if u.scheme != "webhdfs":
        raise ValueError(f"not a webhdfs URI: {uri}")
    return u.hostname or "localhost", u.port or 9870, u.path or "/"


def uri_user(uri: str) -> str | None:
    """Impersonation user from URI userinfo (``webhdfs://user@host/…``).
    Carrying the user in the URI — not ambient process env — is what
    makes impersonation survive into executor Python workers: the URI
    travels with the serialized task, the driver's environ does not."""
    return urllib.parse.urlparse(uri).username


class WebHdfsClient:
    """One namenode endpoint + impersonation user + retry budget."""

    def __init__(
        self,
        host: str,
        port: int,
        user: str | None = None,
        retry_max: int | None = None,
        timeout: float = 30.0,
    ):
        self.host = host
        self.port = port
        self.user = user if user is not None else os.environ.get(_USER_ENV)
        self.retry_max = (
            retry_max
            if retry_max is not None
            else int(os.environ.get(_RETRY_MAX_ENV, "1"))
        )
        self.timeout = timeout

    # -- request plumbing ---------------------------------------------------

    def _url(self, path: str, op: str, **params: object) -> str:
        q = {"op": op}
        if self.user:
            q["user.name"] = self.user
        for k, v in params.items():
            if v is not None:
                q[k] = v
        return f"/webhdfs/v1{urllib.parse.quote(path)}?" + urllib.parse.urlencode(q)

    def _request(
        self,
        method: str,
        url: str,
        body: bytes | None = None,
        host: str | None = None,
        port: int | None = None,
        follow: bool = True,
    ) -> tuple[int, dict, bytes | http_client.HTTPResponse]:
        """One HTTP exchange with the retry budget; follows GET redirects.
        Returns (status, headers, body-bytes or live response for GET)."""
        attempts = max(1, self.retry_max)
        last_err: Exception | None = None
        for attempt in range(attempts):
            try:
                conn = http_client.HTTPConnection(
                    host or self.host, port or self.port, timeout=self.timeout
                )
                conn.request(method, url, body=body)
                resp = conn.getresponse()
                status = resp.status
                headers = {k.lower(): v for k, v in resp.getheaders()}
                if status in (301, 302, 303, 307) and follow and method == "GET":
                    resp.read()
                    conn.close()
                    loc = urllib.parse.urlparse(headers["location"])
                    return self._request(
                        method,
                        loc.path + ("?" + loc.query if loc.query else ""),
                        host=loc.hostname,
                        port=loc.port,
                        follow=False,
                    )
                if status >= 500:
                    data = resp.read()
                    conn.close()
                    raise WebHdfsError(f"HTTP {status}: {data[:200]!r}")
                if method == "GET" and status == 200:
                    # hand the live response back for streaming reads
                    return status, headers, resp
                data = resp.read()
                conn.close()
                if status >= 400:
                    raise _no_retry(WebHdfsError(f"HTTP {status}: {data[:200]!r}"))
                return status, headers, data
            except Exception as e:  # noqa: BLE001 - retry loop boundary
                if getattr(e, "_no_retry", False):
                    raise
                last_err = e
                if attempt + 1 < attempts:
                    time.sleep(0.1 * (attempt + 1))  # linear backoff
        raise WebHdfsError(f"webhdfs request failed after {attempts} attempts: {last_err}")

    # -- protocol operations ------------------------------------------------

    def status(self, path: str) -> dict:
        _, _, resp = self._request("GET", self._url(path, "GETFILESTATUS"))
        data = resp.read() if hasattr(resp, "read") else resp
        if hasattr(resp, "close"):
            resp.close()
        return json.loads(data)["FileStatus"]

    def list_status(self, path: str) -> list[dict]:
        _, _, resp = self._request("GET", self._url(path, "LISTSTATUS"))
        data = resp.read() if hasattr(resp, "read") else resp
        if hasattr(resp, "close"):
            resp.close()
        return json.loads(data)["FileStatuses"]["FileStatus"]

    def open(self, path: str, offset: int = 0, length: int | None = None) -> bytes:
        """Ranged read: OPEN&offset=&length= (follows the datanode 307)."""
        _, _, resp = self._request(
            "GET", self._url(path, "OPEN", offset=offset, length=length)
        )
        if hasattr(resp, "read"):
            data = resp.read()
            resp.close()
            return data
        return resp

    def create(self, path: str, data: bytes, overwrite: bool = True) -> None:
        """Two-step redirect write: dataless PUT → 307 Location → data PUT."""
        status, headers, _ = self._request(
            "PUT",
            self._url(path, "CREATE", overwrite=str(overwrite).lower()),
            follow=False,
        )
        if status != 307:
            raise WebHdfsError(f"CREATE expected 307 redirect, got {status}")
        loc = urllib.parse.urlparse(headers["location"])
        status, _, body = self._request(
            "PUT",
            loc.path + ("?" + loc.query if loc.query else ""),
            body=data,
            host=loc.hostname,
            port=loc.port,
            follow=False,
        )
        if status not in (200, 201):
            raise WebHdfsError(f"CREATE data PUT failed: HTTP {status}: {body[:200]!r}")

    def mkdirs(self, path: str) -> None:
        self._request("PUT", self._url(path, "MKDIRS"), follow=False)

    def rename(self, src: str, dst: str) -> None:
        status, _, body = self._request(
            "PUT", self._url(src, "RENAME", destination=dst), follow=False
        )
        if status != 200 or not json.loads(body).get("boolean", False):
            raise WebHdfsError(f"RENAME {src} -> {dst} failed: {body[:200]!r}")

    def delete(self, path: str, recursive: bool = False) -> None:
        self._request(
            "DELETE",
            self._url(path, "DELETE", recursive=str(recursive).lower()),
            follow=False,
        )


def _no_retry(e: Exception) -> Exception:
    e._no_retry = True  # type: ignore[attr-defined]
    return e


def client_for(uri: str) -> tuple[WebHdfsClient, str]:
    host, port, path = parse_uri(uri)
    return WebHdfsClient(host, port, user=uri_user(uri)), path


class WebHdfsInputFile(io.RawIOBase):
    """Random-access read adapter over ranged OPEN calls — the file-like
    the byte-range scanners (FLAT/XML/CSVQ) seek+read against.  Each
    ``read`` issues ONE ranged request for exactly the asked slice, so a
    scanner's read-past-range loop maps 1:1 onto REST range requests."""

    def __init__(self, client: WebHdfsClient, path: str):
        self._c = client
        self._path = path
        self._pos = 0
        self._size: int | None = None

    def seek(self, pos: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = pos
        elif whence == 1:
            self._pos += pos
        else:
            self._pos = self.size() + pos
        return self._pos

    def size(self) -> int:
        if self._size is None:
            self._size = int(self._c.status(self._path)["length"])
        return self._size

    def read(self, n: int = -1) -> bytes:  # type: ignore[override]
        if n is None or n < 0:
            length = None
        elif n == 0:
            return b""
        else:
            length = n
        data = self._c.open(self._path, offset=self._pos, length=length)
        self._pos += len(data)
        return data

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True


class WebHdfsOutputFile(io.BytesIO):
    """Staged writer: buffer the part payload locally, ship it as ONE
    redirect PUT on close — the reference's staging (``-so``) write mode
    (``hdfspipe.in:180-199`` stages stdin to a temp file before the
    transfer; here the stage is in-memory per part file)."""

    def __init__(self, client: WebHdfsClient, path: str):
        super().__init__()
        self._c = client
        self._path = path
        self._committed = False

    def close(self) -> None:
        if not self._committed:
            self._committed = True
            try:
                self._c.create(self._path, self.getvalue(), overwrite=True)
            finally:
                super().close()
        else:  # pragma: no cover - double close
            super().close()
