"""In-process S3-protocol stub — a conditional-write object store for
tests, speaking the public Amazon S3 REST shape (path-style) over plain
HTTP against an in-memory key space.

Why this exists: the WebHDFS stub (:mod:`.webhdfs_stub`) proves the
manifest protocol over a RENAME-based store — the HDFS primitive. Real
100 TB deployments land on S3-class stores, where the commit-protocol
primitive is not rename but the CONDITIONAL PUT (``If-None-Match: *`` —
AWS S3 conditional writes, GA Dec 2024; also MinIO, GCS via
``x-goog-if-generation-match: 0``, Azure via ``If-None-Match``). That
primitive has different semantics worth testing separately:

- the PUT is atomic CHECK-AND-CREATE in one request — no temp file, no
  rename window, no copy+delete fallback;
- a lost race surfaces as HTTP **412 Precondition Failed**, not a
  refused rename;
- plain PUTs are last-writer-wins with READ-COMMITTED visibility
  (readers see the old or the new object, never torn bytes) — exactly
  the contract ``write_text_atomic`` promises.

Implemented subset (what :class:`~parquetranger_spark.sources.fs.S3CondFS`
and the commit protocol use):

- ``PUT /bucket/key`` — create/replace; honors ``If-None-Match: *``
  atomically under the server lock (412 when the key exists — the CAS).
- ``GET /bucket/key`` — object bytes, 404 ``NoSuchKey`` XML otherwise.
- ``HEAD /bucket/key`` — existence + Content-Length + Last-Modified.
- ``DELETE /bucket/key`` — 204 (idempotent, absent keys tolerated).
- ``GET /bucket?list-type=2&prefix=&delimiter=&continuation-token=`` —
  ListObjectsV2: ``Contents`` (Key/LastModified/Size), ``CommonPrefixes``
  under a delimiter, 1000-key pages with continuation tokens.

One ThreadingHTTPServer; every namespace mutation takes one lock, so
concurrent committers racing the same key observe real compare-and-swap
behavior. Not a persistence layer — state dies with the server.
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse
from xml.sax.saxutils import escape

_PAGE = 1000


def _iso(ts: float) -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%S.000Z", time.gmtime(ts))


class _Obj:
    __slots__ = ("data", "mtime")

    def __init__(self, data: bytes):
        self.data = data
        self.mtime = time.time()


class S3Stub:
    """``with S3Stub() as endpoint:`` → ``http://127.0.0.1:<port>``.
    Buckets auto-create on first PUT (tests address one scratch bucket)."""

    def __init__(self):
        self._objects: dict[str, _Obj] = {}  # "bucket/key" -> _Obj
        self._lock = threading.Lock()
        stub = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            # ------------------------------------------------ helpers
            def _key(self):
                return unquote(urlparse(self.path).path.lstrip("/"))

            def _send(self, code, body=b"", headers=None, ctype="application/xml"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                if body and self.command != "HEAD":
                    self.wfile.write(body)

            def _err(self, code, s3code, msg):
                body = (
                    f"<?xml version='1.0'?><Error><Code>{s3code}</Code>"
                    f"<Message>{escape(msg)}</Message></Error>"
                ).encode()
                self._send(code, body)

            # ------------------------------------------------- verbs
            def do_PUT(self):
                key = self._key()
                n = int(self.headers.get("Content-Length") or 0)
                data = self.rfile.read(n) if n else b""
                cond = self.headers.get("If-None-Match")
                with stub._lock:
                    if cond is not None and cond.strip() == "*" and key in stub._objects:
                        # the CAS loss: atomic under the lock, one request
                        return self._err(
                            412, "PreconditionFailed",
                            "At least one of the pre-conditions you "
                            "specified did not hold",
                        )
                    stub._objects[key] = _Obj(data)
                self._send(200, b"", {"ETag": '"stub"'})

            def do_GET(self):
                u = urlparse(self.path)
                q = parse_qs(u.query)
                if "list-type" in q or ("prefix" in q and "/" not in u.path.strip("/")):
                    return self._list(u, q)
                key = self._key()
                with stub._lock:
                    o = stub._objects.get(key)
                if o is None:
                    return self._err(404, "NoSuchKey", key)
                self._send(
                    200, o.data,
                    {"Last-Modified": _iso(o.mtime), "ETag": '"stub"'},
                    ctype="binary/octet-stream",
                )

            def do_HEAD(self):
                key = self._key()
                with stub._lock:
                    o = stub._objects.get(key)
                if o is None:
                    return self._send(404)
                self._send(200, b"", {
                    "Content-Length": str(len(o.data)),
                    "Last-Modified": _iso(o.mtime),
                })

            def do_DELETE(self):
                key = self._key()
                with stub._lock:
                    stub._objects.pop(key, None)
                self._send(204)

            # ------------------------------------------------ listing
            def _list(self, u, q):
                bucket = u.path.strip("/").split("/")[0]
                prefix = q.get("prefix", [""])[0]
                delim = q.get("delimiter", [""])[0]
                token = q.get("continuation-token", [""])[0]
                full = f"{bucket}/{prefix}"
                with stub._lock:
                    keys = sorted(
                        k for k in stub._objects if k.startswith(full)
                    )
                if token:
                    keys = [k for k in keys if k > f"{bucket}/{token}"]
                contents, prefixes, count = [], [], 0
                next_token = ""
                for k in keys:
                    rel = k[len(bucket) + 1 :]
                    if delim:
                        rest = rel[len(prefix):]
                        if delim in rest:
                            p = prefix + rest.split(delim, 1)[0] + delim
                            if p not in prefixes:
                                prefixes.append(p)
                                count += 1
                            continue
                    with stub._lock:
                        o = stub._objects.get(k)
                    if o is None:
                        continue
                    contents.append((rel, o))
                    count += 1
                    if count >= _PAGE:
                        next_token = rel
                        break
                parts = [
                    "<?xml version='1.0'?>",
                    "<ListBucketResult>",
                    f"<Name>{escape(bucket)}</Name>",
                    f"<Prefix>{escape(prefix)}</Prefix>",
                    f"<KeyCount>{count}</KeyCount>",
                    f"<IsTruncated>{'true' if next_token else 'false'}</IsTruncated>",
                ]
                if next_token:
                    parts.append(
                        f"<NextContinuationToken>{escape(next_token)}"
                        "</NextContinuationToken>"
                    )
                for rel, o in contents:
                    parts.append(
                        f"<Contents><Key>{escape(rel)}</Key>"
                        f"<LastModified>{_iso(o.mtime)}</LastModified>"
                        f"<Size>{len(o.data)}</Size></Contents>"
                    )
                for p in prefixes:
                    parts.append(
                        f"<CommonPrefixes><Prefix>{escape(p)}</Prefix>"
                        "</CommonPrefixes>"
                    )
                parts.append("</ListBucketResult>")
                self._send(200, "".join(parts).encode())

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def __enter__(self) -> str:
        self._thread.start()
        host, port = self._server.server_address
        return f"http://{host}:{port}"

    def __exit__(self, *exc):
        self._server.shutdown()
        self._server.server_close()
        return False

    # test hook: direct peek at the namespace
    def keys(self) -> list[str]:
        with self._lock:
            return sorted(self._objects)
