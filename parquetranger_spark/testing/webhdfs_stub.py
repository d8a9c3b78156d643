"""In-process WebHDFS stub server — a real remote-URI object store for
tests, speaking the public WebHDFS REST protocol (hadoop.apache.org,
"WebHDFS REST API") over plain HTTP against a scratch directory.

Why this exists: the container has no object-store credentials and no
hadoop-aws jars, but ``org.apache.hadoop.hdfs.web.WebHdfsFileSystem`` ships
inside pyspark's hadoop-client-api and is service-registered for the
``webhdfs://`` scheme. Serving the protocol locally therefore exercises the
EXACT remote code paths a bare local path never touches:

- :class:`~parquetranger_spark.sources.fs.HadoopFS` resolves the scheme via
  the JVM gateway and runs its remote branches — including the rename-based
  ``create_exclusive`` CAS (``file:`` URIs short-circuit to link(2); webhdfs
  does not), the manifest protocol's correctness linchpin, here decided by
  an HTTP round-trip with genuinely atomic server-side semantics;
- Spark's own parquet scans/writes and streaming checkpoints route through
  WebHdfsFileSystem's two-step redirect dance (OPEN/CREATE 307 → data URL),
  chunked uploads and offset/length reads included.

Semantics implemented (the subset the engine + Spark committers use):
GETFILESTATUS, LISTSTATUS, GETCONTENTSUMMARY, OPEN (offset/length),
GETHOMEDIRECTORY, GETDELEGATIONTOKEN (simple-auth null), MKDIRS, CREATE
(two-step, ``overwrite`` honored atomically under the server lock), APPEND,
RENAME (posix-style refuse-if-dest-exists → returns ``{"boolean": false}``
— the CAS), SETPERMISSION/SETTIMES/SETREPLICATION/SETOWNER (accepted
no-ops), DELETE (recursive flag), TRUNCATE.

Single ThreadingHTTPServer; all namespace mutations take one lock, so
concurrent committers racing a CREATE/RENAME observe real
compare-and-swap behavior. Not a persistence layer — state is a plain
directory tree, wiped with the server.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, quote, unquote, urlparse

PREFIX = "/webhdfs/v1"
BLOCK_SIZE = 134_217_728


def _remote_exc(exc: str, msg: str) -> bytes:
    return json.dumps(
        {
            "RemoteException": {
                "exception": exc,
                "javaClassName": f"java.io.{exc}"
                if exc in ("FileNotFoundException", "IOException")
                else f"org.apache.hadoop.fs.{exc}",
                "message": msg,
            }
        }
    ).encode()


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "PqrsWebHdfsStub/1.0"

    # ------------- plumbing -------------
    def log_message(self, fmt, *args):  # quiet; flip for bring-up debugging
        if self.server.debug:  # type: ignore[attr-defined]
            super().log_message(fmt, *args)

    @property
    def _root(self) -> str:
        return self.server.root  # type: ignore[attr-defined]

    @property
    def _lock(self) -> threading.Lock:
        return self.server.lock  # type: ignore[attr-defined]

    def _parse(self):
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        # clients percent-encode path segments (e.g. '=' in partition
        # dirs); the namespace operates on decoded names, per the spec
        rel = unquote(u.path[len(PREFIX):]) if u.path.startswith(PREFIX) else None
        return u.path, rel, q

    def _fs_path(self, rel: str) -> str:
        p = os.path.normpath(os.path.join(self._root, rel.lstrip("/")))
        if not (p == self._root or p.startswith(self._root + os.sep)):
            raise PermissionError(rel)
        return p

    def _reply(self, code: int, body: bytes = b"", ctype="application/json", headers=()):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in headers:
            self.send_header(k, v)
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _json(self, obj):
        self._reply(200, json.dumps(obj).encode())

    def _not_found(self, rel):
        self._reply(404, _remote_exc("FileNotFoundException", f"File does not exist: {rel}"))

    def _redirect(self, extra="datanode=1"):
        u = urlparse(self.path)
        host = self.headers.get("Host", f"127.0.0.1:{self.server.server_port}")
        loc = f"http://{host}{u.path}?{u.query}&{extra}"
        # 307 with zero-length body — the Java client re-issues the verb
        self._reply(307, b"", headers=[("Location", loc)])

    def _read_body(self) -> bytes:
        te = (self.headers.get("Transfer-Encoding") or "").lower()
        if "chunked" in te:
            chunks = []
            while True:
                line = self.rfile.readline().strip()
                if b";" in line:
                    line = line.split(b";", 1)[0]
                size = int(line or b"0", 16)
                if size == 0:
                    # trailing CRLF after the last chunk (+ optional trailers)
                    while True:
                        t = self.rfile.readline()
                        if t in (b"\r\n", b"\n", b""):
                            break
                    break
                chunks.append(self.rfile.read(size))
                self.rfile.readline()  # chunk CRLF
            return b"".join(chunks)
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def _status_of(self, p: str, suffix: str = "") -> dict:
        st = os.stat(p)
        is_dir = os.path.isdir(p)
        return {
            "accessTime": int(st.st_atime * 1000),
            "blockSize": 0 if is_dir else BLOCK_SIZE,
            "childrenNum": len(os.listdir(p)) if is_dir else 0,
            "fileId": st.st_ino,
            "group": "supergroup",
            "length": 0 if is_dir else st.st_size,
            "modificationTime": int(st.st_mtime * 1000),
            "owner": "pqrs",
            "pathSuffix": suffix,
            "permission": "755" if is_dir else "644",
            "replication": 0 if is_dir else 1,
            "storagePolicy": 0,
            "type": "DIRECTORY" if is_dir else "FILE",
        }

    # ------------- verbs -------------
    def do_GET(self):
        path, rel, q = self._parse()
        op = (q.get("op") or "").upper()
        if rel is None:
            return self._reply(400, _remote_exc("IOException", f"bad path {path}"))
        try:
            p = self._fs_path(rel)
        except PermissionError:
            return self._reply(403, _remote_exc("IOException", "path escape"))
        if op == "GETFILESTATUS":
            if not os.path.exists(p):
                return self._not_found(rel)
            return self._json({"FileStatus": self._status_of(p)})
        if op == "LISTSTATUS":
            if not os.path.exists(p):
                return self._not_found(rel)
            if os.path.isfile(p):
                return self._json({"FileStatuses": {"FileStatus": [self._status_of(p)]}})
            names = sorted(os.listdir(p))
            sts = []
            for n in names:
                try:
                    sts.append(self._status_of(os.path.join(p, n), n))
                except OSError:
                    pass  # vanished mid-listing — same tolerance as HDFS
            return self._json({"FileStatuses": {"FileStatus": sts}})
        if op == "GETCONTENTSUMMARY":
            total = files = dirs = 0
            for base, dns, fns in os.walk(p):
                dirs += len(dns)
                for f in fns:
                    files += 1
                    total += os.path.getsize(os.path.join(base, f))
            return self._json(
                {
                    "ContentSummary": {
                        "directoryCount": dirs + 1,
                        "fileCount": files,
                        "length": total,
                        "quota": -1,
                        "spaceConsumed": total,
                        "spaceQuota": -1,
                    }
                }
            )
        if op == "OPEN":
            if not os.path.isfile(p):
                return self._not_found(rel)
            if "datanode" not in q:
                return self._redirect()
            offset = int(q.get("offset", 0) or 0)
            length = q.get("length")
            size = os.path.getsize(p)
            n = size - offset if length in (None, "null") else min(int(length), size - offset)
            n = max(n, 0)
            with open(p, "rb") as fh:
                fh.seek(offset)
                data = fh.read(n)
            return self._reply(200, data, ctype="application/octet-stream")
        if op in ("GETFILEBLOCKLOCATIONS", "GET_BLOCK_LOCATIONS"):
            # locality is meaningless on a stub — one synthetic local block
            # spanning the requested range keeps split planning working
            if not os.path.isfile(p):
                return self._not_found(rel)
            size = os.path.getsize(p)
            offset = int(q.get("offset", 0) or 0)
            length = int(q.get("length", size) or size)
            block = {
                "cachedHosts": [],
                "corrupt": False,
                "hosts": ["127.0.0.1"],
                "length": min(length, size - offset),
                "names": ["127.0.0.1:50010"],
                "offset": offset,
                "storageIds": ["pqrs-stub-0"],
                "storageTypes": ["DISK"],
                "topologyPaths": ["/default-rack/127.0.0.1:50010"],
            }
            return self._json({"BlockLocations": {"BlockLocation": [block]}})
        if op == "GETHOMEDIRECTORY":
            return self._json({"Path": "/user/pqrs"})
        if op == "GETDELEGATIONTOKEN":
            return self._json({"Token": None})
        if op == "GETTRASHROOT":
            return self._json({"Path": "/user/pqrs/.Trash"})
        if op == "CHECKACCESS":
            return self._reply(200)
        return self._reply(400, _remote_exc("IOException", f"unsupported GET op {op}"))

    def do_PUT(self):
        path, rel, q = self._parse()
        op = (q.get("op") or "").upper()
        if rel is None:
            return self._reply(400, _remote_exc("IOException", f"bad path {path}"))
        try:
            p = self._fs_path(rel)
        except PermissionError:
            return self._reply(403, _remote_exc("IOException", "path escape"))
        if op == "CREATE":
            if "datanode" not in q:
                # step 1: no body yet — hand back the "datanode" URL
                return self._redirect()
            data = self._read_body()
            overwrite = (q.get("overwrite", "false").lower()) == "true"
            with self._lock:
                if os.path.exists(p) and not overwrite:
                    return self._reply(
                        403,
                        _remote_exc(
                            "FileAlreadyExistsException", f"{rel} already exists"
                        ),
                    )
                os.makedirs(os.path.dirname(p), exist_ok=True)
                tmp = p + ".__inflight__"
                with open(tmp, "wb") as fh:
                    fh.write(data)
                os.replace(tmp, p)
            host = self.headers.get("Host", f"127.0.0.1:{self.server.server_port}")
            return self._reply(
                201, b"", headers=[("Location", f"http://{host}{PREFIX}{quote(rel)}")]
            )
        if op == "MKDIRS":
            with self._lock:
                os.makedirs(p, exist_ok=True)
            return self._json({"boolean": True})
        if op == "RENAME":
            dst_rel = q.get("destination", "")
            try:
                dst = self._fs_path(dst_rel)
            except PermissionError:
                # same 403 the source-path escape gets — a path-escaping
                # DESTINATION must not surface as an unhandled 500
                return self._reply(403, _remote_exc("IOException", "path escape"))
            overwrite = "OVERWRITE" in (q.get("renameoptions", "") or "").upper()
            with self._lock:
                if not os.path.exists(p):
                    return self._json({"boolean": False})
                if os.path.exists(dst):
                    # HDFS rename-into-directory moves the source INSIDE
                    if os.path.isdir(dst) and not os.path.isdir(p):
                        dst = os.path.join(dst, os.path.basename(p))
                        if os.path.exists(dst):
                            return self._json({"boolean": False})
                    elif overwrite and os.path.isfile(dst):
                        os.remove(dst)
                    else:
                        # the manifest CAS: destination taken → refuse
                        return self._json({"boolean": False})
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(p, dst) if os.path.isfile(p) else shutil.move(p, dst)
            return self._json({"boolean": True})
        if op in ("SETPERMISSION", "SETTIMES", "SETREPLICATION", "SETOWNER"):
            self._read_body()
            return (
                self._json({"boolean": True})
                if op == "SETREPLICATION"
                else self._reply(200)
            )
        return self._reply(400, _remote_exc("IOException", f"unsupported PUT op {op}"))

    def do_POST(self):
        path, rel, q = self._parse()
        op = (q.get("op") or "").upper()
        try:
            p = self._fs_path(rel) if rel is not None else None
        except PermissionError:
            return self._reply(403, _remote_exc("IOException", "path escape"))
        if op == "APPEND":
            if "datanode" not in q:
                return self._redirect()
            data = self._read_body()
            with self._lock:
                if not os.path.isfile(p):
                    return self._not_found(rel)
                with open(p, "ab") as fh:
                    fh.write(data)
            return self._reply(200)
        if op == "TRUNCATE":
            n = int(q.get("newlength", 0))
            with self._lock:
                if not os.path.isfile(p):
                    return self._not_found(rel)
                with open(p, "rb+") as fh:
                    fh.truncate(n)
            return self._json({"boolean": True})
        return self._reply(400, _remote_exc("IOException", f"unsupported POST op {op}"))

    def do_DELETE(self):
        path, rel, q = self._parse()
        op = (q.get("op") or "").upper()
        if op != "DELETE":
            return self._reply(400, _remote_exc("IOException", f"unsupported DELETE op {op}"))
        try:
            p = self._fs_path(rel)
        except PermissionError:
            return self._reply(403, _remote_exc("IOException", "path escape"))
        recursive = (q.get("recursive", "false").lower()) == "true"
        with self._lock:
            if not os.path.exists(p):
                return self._json({"boolean": False})
            if os.path.isdir(p):
                if os.listdir(p) and not recursive:
                    return self._reply(
                        403, _remote_exc("IOException", f"{rel} is non-empty")
                    )
                shutil.rmtree(p, ignore_errors=True)
            else:
                os.remove(p)
        return self._json({"boolean": True})


class _Server(ThreadingHTTPServer):
    # 32 executor threads open connections simultaneously; the http.server
    # default backlog of 5 RESETS the overflow and the Hadoop client sees
    # "unexpected end of file from server" mid-commit
    request_queue_size = 128
    daemon_threads = True


class WebHdfsStub:
    """Context-managed stub server: ``with WebHdfsStub(scratch) as uri:``
    yields ``webhdfs://127.0.0.1:<port>`` serving ``scratch``."""

    def __init__(self, root: str, debug: bool = False):
        os.makedirs(root, exist_ok=True)
        self._srv = _Server(("127.0.0.1", 0), _Handler)
        self._srv.root = os.path.abspath(root)  # type: ignore[attr-defined]
        self._srv.lock = threading.Lock()  # type: ignore[attr-defined]
        self._srv.debug = debug  # type: ignore[attr-defined]
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    @property
    def uri(self) -> str:
        return f"webhdfs://127.0.0.1:{self._srv.server_port}"

    def __enter__(self) -> str:
        self._thread.start()
        return self.uri

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()
