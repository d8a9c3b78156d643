"""Manifest commit protocol — atomic, object-store-safe table commits.

The default ``TableRepo`` commit (``commit_mode="files"``) makes data
visible by *where it sits*: readers list the root, so an append must
rename files into place (atomic on local/HDFS, copy+delete on S3 — the
caveat documented on ``TableRepo._two_phase_append``). This module is the
long-term answer recorded there: visibility by *manifest*. Data files are
written once into a per-commit directory under ``_pqrs_data/`` and never
moved; what readers see is decided by a versioned JSON manifest whose
publication is a single create-if-absent of ``_pqrs_manifest/v<N>.json``
(:meth:`fs.create_exclusive` — the CAS). This buys, on any store:

- **atomic commits** — a reader sees manifest vN or vN+1, never a torn
  file set; a crashed writer leaves only an unreferenced data dir;
- **optimistic concurrency** — two writers racing to vN+1: one CAS wins,
  the loser recomputes its file list against the winner's manifest and
  retries at vN+2 (appends and disjoint partition overwrites compose);
- **snapshot isolation** — a query plans against one manifest's frozen
  file list; concurrent commits cannot change a running scan;
- **time travel** — ``get_full_df(version=N)`` reads any retained
  version; ``versions()`` lists them;
- **O(1) read planning** — no recursive directory listing (the
  O(files) driver RPC object stores punish); the manifest IS the file
  index.

This is the Iceberg/Delta commit shape reduced to its core, plus the
manifest-of-manifests tier for scale: a commit listing more files than
``TableRepo(manifest_inline_files_max=…)`` spills its list to an
immutable side object under ``_pqrs_manifest/lists/`` and the version
JSON carries only the ref — list objects are written once and shared by
reference across every later version, so the CAS object stays KB-sized
on tables with millions of files and the per-commit write amplification
of the version chain is O(commits), not O(files). Mutating an entry's
files (partition prune, fence tombstoning) drops its ref (re-inlines);
vacuum sweeps list objects no retained version references. No
counterpart exists in the reference — its
per-path locks (core.py:97,111) solve single-machine concurrency; this
solves the same contract on a shared object store.

Manifest JSON::

    {"version": 3,
     "commits": [{"dir": "_pqrs_data/<uuid>",
                  "files": ["l_returnflag=A/part-0.parquet", ...]}]}

File paths stay relative (root-relocatable — env switching moves tables
wholesale); each commit keeps its own ``dir`` so readers can anchor
partition-column discovery per commit (``basePath``).
"""

from __future__ import annotations

import json
import time
from typing import Any

from .fs import join_path

MANIFEST_DIR = "_pqrs_manifest"
DATA_DIR = "_pqrs_data"


def _mpath(root: str, version: int) -> str:
    return join_path(root, MANIFEST_DIR, f"v{version:020d}.json")


def list_versions(fs, root: str) -> list[int]:
    # list_names, not list_files: the manifest dir is flat, and the
    # non-recursive single-RPC listing neither descends into the
    # .staging tmp dir nor per-entry-stats names a concurrent CAS
    # publish may rename away mid-iteration (the reader/writer race)
    out = []
    for p in fs.list_names(join_path(root, MANIFEST_DIR), ".json"):
        name = p.rsplit("/", 1)[-1]
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                pass
    return sorted(out)


# process-wide cache of resolved spilled payloads, keyed by the ref's
# absolute path. Sound because list objects are immutable by construction
# (written once under lists/<uuid>.json, never modified; a mutated entry
# DROPS its ref and re-inlines — prune_partitions) — and necessary because
# without it every load_manifest re-reads and re-parses O(files) JSON per
# spilled commit, per CAS-retry iteration and per read, eroding the spill
# tier's stated O(commits) commit amplification. Consumers must treat the
# resolved values as read-only (they do: mutation paths build new dicts).
_SPILL_CACHE: dict[str, dict] = {}
_SPILL_CACHE_MAX = 128

# process-wide cache of RESOLVED transaction outcomes (marker file →
# "committed" | "aborted"). Sound because a marker is written exactly once
# via create_exclusive and never modified — only the *absence* of a marker
# ("pending") must be re-checked per call. Bounded like the spill cache.
_TXN_CACHE: dict[str, str] = {}
_TXN_CACHE_MAX = 4096


def txn_state(marker: str) -> str:
    """Outcome of the multi-table transaction whose decision marker lives
    at ``marker``: ``"committed"`` / ``"aborted"`` once the single
    create-exclusive of the marker file has landed, ``"pending"`` before.
    The marker may sit on a different filesystem than the table (the
    transaction catalog root is caller-chosen), so the shim is resolved
    per marker path, not inherited from the table."""
    st = _TXN_CACHE.get(marker)
    if st is not None:
        return st
    from .fs import fs_for

    fs = fs_for(marker)
    if not fs.exists(marker):
        return "pending"
    st = json.loads(fs.read_text(marker)).get("state", "committed")
    while len(_TXN_CACHE) >= _TXN_CACHE_MAX:
        _TXN_CACHE.pop(next(iter(_TXN_CACHE)))
    _TXN_CACHE[marker] = st
    return st


def visible_commits(commits: list[dict]) -> list[dict]:
    """Read-side visibility gate for multi-table transactions: commits
    published under a transaction (``entry["txn"] = marker path``) are
    invisible until the transaction's single decision marker says
    committed — and stay invisible forever if it says aborted. Everything
    the table's read surface exposes (scans, counts, file listings, stats
    skipping, the change feed) filters through here, so flipping ONE
    marker file makes every gated entry across every participating table
    visible atomically. Writers (CAS loops, vacuum keep-sets) must NOT
    use this — a pending entry is still part of the chain and its files
    are still referenced."""
    if not any("txn" in c for c in commits):
        return commits
    return [
        c for c in commits if "txn" not in c or txn_state(c["txn"]) == "committed"
    ]


def _resolve_spill(fs, ref_path: str) -> dict:
    payload = _SPILL_CACHE.get(ref_path)
    if payload is None:
        payload = json.loads(fs.read_text(ref_path))
        if isinstance(payload, list):  # earliest spill format: bare list
            payload = {"files": payload}
        while len(_SPILL_CACHE) >= _SPILL_CACHE_MAX:
            _SPILL_CACHE.pop(next(iter(_SPILL_CACHE)))
        _SPILL_CACHE[ref_path] = payload
    return payload


def load_manifest(fs, root: str, version: int | None = None) -> dict[str, Any] | None:
    """The manifest at ``version`` (default: latest), or None if the table
    has no committed version (or ``version`` was vacuumed/never existed).
    Entries whose file list was spilled (``files_ref``) come back with
    ``files`` resolved inline — consumers never see the indirection (and
    resolution is served from an immutable process-wide cache, so the
    spill tier's O(files) parse cost is paid once per ref, not per load)."""
    if version is None:
        vs = list_versions(fs, root)
        if not vs:
            return None
        version = vs[-1]
    path = _mpath(root, version)
    if not fs.exists(path):
        return None
    mf = json.loads(fs.read_text(path))
    for c in mf.get("commits", []):
        if "files_ref" in c and not c.get("files"):
            payload = _resolve_spill(fs, join_path(c.get("base", root), c["files_ref"]))
            for k, v in payload.items():
                c.setdefault(k, v)
    return mf


def try_commit(fs, root: str, manifest: dict[str, Any], prev_ts: float = 0.0) -> bool:
    """CAS-publish ``manifest`` at its own version. False = lost the race
    (caller reloads the latest manifest, reapplies its delta, retries).

    Entries carrying a ``files_ref`` serialize WITHOUT their inline file
    list — the version JSON stays KB-sized however many files the table
    holds (the manifest-of-manifests tier: list objects are written once
    under ``_pqrs_manifest/lists/`` and shared by reference across every
    subsequent version; only the pointer is rewritten per commit). Any
    operation that MUTATES an entry's files must drop its ``files_ref``
    (``prune_partitions`` and the fence-tombstone path do) — serializing
    a stale ref over modified files would silently undo the mutation."""
    out = {**manifest, "commits": []}
    # stamp publish time (epoch seconds) for AS-OF timestamp travel; the
    # stamp is taken at CAS time, not manifest-build time, so a retry
    # loop's eventual winner carries the moment it actually became
    # visible — the only ordering a reader's "as of 12:00" can mean.
    # Clamped to the PREVIOUS version's stamp (callers pass it from the
    # manifest they just loaded): with committers on different hosts,
    # wall-clock skew could otherwise make ts non-monotonic with version,
    # and version_at (highest version with ts <= target) would resolve an
    # AS-OF instant to a snapshot that was never the visible one at that
    # moment. Monotone per chain, the resolver's scan is sound.
    out["ts"] = max(time.time(), float(prev_ts or 0.0))
    # stamp the schema epoch CURRENT at publish time (Iceberg's
    # snapshot↔schema binding): time travel to this version can then
    # read with the shape the table had, not whatever DDL came later.
    # Epochs are cached process-wide; tables without DDL pay one
    # exists() probe. Pre-stamp manifests fall back to the current
    # epoch on read (the pre-feature behavior).
    if "schema_v" not in out:
        from .schema_log import load_schema_log

        slog = load_schema_log(fs, root)
        if slog:
            out["schema_v"] = slog[-1]["v"]
    for c in manifest["commits"]:
        if "files_ref" in c:
            c = {k: v for k, v in c.items() if k not in SPILL_KEYS}
        out["commits"].append(c)
    return fs.create_exclusive(
        _mpath(root, int(manifest["version"])), json.dumps(out, indent=1)
    )


def version_at(fs, root: str, ts: float) -> int | None:
    """Latest committed version whose publish stamp is ≤ ``ts`` — the
    AS-OF resolver (Delta's ``timestampAsOf`` / Iceberg's
    ``snapshot_id_as_of(timestamp)`` shape). Versions predating the
    stamp (written by older engine builds) count as ts=0: always
    eligible, so old tables stay readable. None when every retained
    version is newer than ``ts`` (the caller decides whether that is an
    error or an empty table). Driver-side O(versions) reads of KB-sized
    JSONs — no data files touched."""
    best = None
    for v in list_versions(fs, root):
        path = _mpath(root, v)
        if not fs.exists(path):
            continue  # vacuumed between listing and read
        mf = json.loads(fs.read_text(path))
        if float(mf.get("ts", 0.0)) <= ts:
            best = v  # versions are sorted ascending; keep the last match
    return best


# every per-FILE map an entry can carry — all of it must move to the
# side object together, or a stats/bloom table's version JSON stays
# O(files) despite the spilled list (the whole point of the tier)
SPILL_KEYS = ("files", "stats", "rows", "blooms", "bloom_types")


def spill_entry_payload(fs, root: str, entry: dict) -> str:
    """Write a commit's per-file payload (file list + stats + rowcounts +
    blooms) as one immutable side object and return its root-relative
    ref (``_pqrs_manifest/lists/<uuid>.json``)."""
    from uuid import uuid4

    ref = f"{MANIFEST_DIR}/lists/{uuid4().hex[:16]}.json"
    payload = {k: entry[k] for k in SPILL_KEYS if k in entry}
    fs.write_text_atomic(join_path(root, ref), json.dumps(payload))
    return ref


def live_files(manifest: dict[str, Any] | None, root: str) -> list[str]:
    """Absolute paths of every live DATA file in manifest order. A commit
    carrying a ``base`` references another table's data dir (shallow
    clone) — resolution anchors there instead of ``root``. Deletion-
    vector commits (``kind='dv'``) are excluded: their files hold
    tombstone keys, not table rows (vacuum protects them through its own
    commit walk, which does not use this)."""
    if not manifest:
        return []
    out = []
    for c in manifest["commits"]:
        if c.get("kind") == "dv":
            continue
        for f in c["files"]:
            out.append(join_path(c.get("base", root), c["dir"], f))
    return sorted(out)


def partition_values_of(rel_path: str, group_cols: list[str]) -> tuple[str, ...] | None:
    """The hive ``col=value`` tuple encoded in a commit-relative file path,
    or None when any group column is absent (ungrouped table)."""
    found = {}
    for part in rel_path.split("/")[:-1]:
        if "=" in part:
            k, v = part.split("=", 1)
            found[k] = v
    try:
        return tuple(found[c] for c in group_cols)
    except KeyError:
        return None


def prune_partitions(
    commits: list[dict], group_cols: list[str], touched: set[tuple[str, ...]]
) -> list[dict]:
    """Dynamic-overwrite semantics on the manifest: drop every file whose
    partition tuple is in ``touched``; commits left empty disappear."""
    out = []
    for c in commits:
        kept = [
            f
            for f in c["files"]
            if partition_values_of(f, group_cols) not in touched
        ]
        if kept or "fence" in c:
            # preserve non-file keys (fence, spec) — a pruned-and-rebuilt
            # entry must keep its exactly-once fence and partition spec.
            # A fenced commit whose files are ALL pruned survives as an
            # empty tombstone: dropping it would erase the fence, and a
            # crashed stream replaying that epoch would re-append rows a
            # later overwrite/delete deliberately removed.
            nc = {**c, "files": kept}
            if len(kept) != len(c["files"]):
                # the entry's files changed: a spilled-list ref would
                # serialize stale content over this prune — inline again,
                # and shed the pruned files' per-file maps (stats/rows/
                # blooms), or every later version JSON carries dead
                # O(files) entries forever
                nc.pop("files_ref", None)
                keep = set(kept)
                for mkey in ("stats", "rows", "blooms"):
                    if mkey in nc:
                        nc[mkey] = {f: v for f, v in nc[mkey].items() if f in keep}
            out.append(nc)
    return out


def _apply_overwrite(commits: list[dict], ow: dict, group_cols=None) -> list[dict]:
    """Apply one overwrite spec to the commits BEFORE it: scope='all' is
    the fence-preserving truncation (_publish_entry's static branch),
    scope='groups' is prune_partitions under the spec the overwrite was
    written with — the exact effect the eager publish-time path has."""
    if ow.get("scope") == "all":
        return [
            {
                k: v
                for k, v in c.items()
                if k not in ("files_ref", "stats", "rows", "blooms", "bloom_types")
            }
            | {"files": []}
            for c in commits
            if "fence" in c
        ]
    touched = {tuple(t) for t in ow.get("touched", [])}
    return prune_partitions(commits, list(ow.get("spec") or group_cols or []), touched)


def effective_commits(commits: list[dict], group_cols=None) -> list[dict]:
    """READ-side commit list: txn visibility (:func:`visible_commits`)
    plus the deferred effect of transactional OVERWRITE entries. An entry
    carrying ``ow`` (published by ``Transaction.replace_groups`` /
    ``replace_all``) is additive at publish time — its destructive half,
    the prune of older files, cannot run then because it must become
    visible atomically with the txn's other tables. The prune is applied
    HERE instead, positionally (it masks only entries earlier in the
    list), and physically folded into the chain by the next publish
    (:func:`fold_decided_overwrites`) — the deferred mask is transient
    debt, not a permanent read tax. Cost when no ``ow`` entry is live:
    one generator scan."""
    vis = visible_commits(commits)
    if not any("ow" in c for c in vis):
        return vis
    out: list[dict] = []
    for c in vis:
        ow = c.get("ow")
        if ow:
            out = _apply_overwrite(out, ow, group_cols)
        out.append(c)
    return out


def fold_decided_overwrites(commits: list[dict]) -> list[dict]:
    """WRITER-side settle, run inside every publish CAS loop: physically
    apply each overwrite entry whose transaction has COMMITTED (its mask
    is permanent) and strip its ``ow``/``txn`` markers, so later versions
    stop re-deriving the mask and vacuum's retention walk stops keeping
    the dead files alive once pre-fold versions age out. Pending entries
    stay untouched (undecided — their mask must not apply yet); aborted
    ones stay for sweep_aborted_txns. Read-visible state is UNCHANGED by
    the fold: it applies exactly what effective_commits already shows."""
    if not any("ow" in c for c in commits):
        return commits
    out: list[dict] = []
    for c in commits:
        ow = c.get("ow")
        if ow and (c.get("txn") is None or txn_state(c["txn"]) == "committed"):
            out = _apply_overwrite(out, ow, ow.get("spec"))
            c = {k: v for k, v in c.items() if k not in ("ow", "txn")}
        out.append(c)
    return out


# ---- file-level column statistics (data skipping) ----------------------

SKIP_OPS = ("==", "<", "<=", ">", ">=", "between", "in")


def _check_value(p: tuple, v) -> None:
    # None would TypeError against stats mid-scan (and a comparison to
    # NULL matches nothing anyway); NaN satisfies no interval test but
    # Spark's NaN ordering would match rows — both rejected up front
    if v is None or (isinstance(v, float) and v != v):
        raise ValueError(f"skip predicate value must be non-null and not NaN: {p!r}")


def norm_predicates(predicates) -> list[tuple]:
    """Validate/normalize skip predicates: (col, op, value) or
    (col, 'between', lo, hi). Conjunctive (all must hold)."""
    out = []
    for p in predicates:
        p = tuple(p)
        if len(p) < 3 or p[1] not in SKIP_OPS:
            raise ValueError(f"bad skip predicate {p!r}; ops: {SKIP_OPS}")
        for v in p[2:]:
            if isinstance(v, (list, tuple, set, frozenset)):
                for vv in v:
                    _check_value(p, vv)
            else:
                _check_value(p, v)
        if p[1] == "between":
            if len(p) != 4:
                raise ValueError(f"between needs (col, 'between', lo, hi): {p!r}")
        elif p[1] == "in":
            if len(p) != 3 or not isinstance(p[2], (list, tuple, set, frozenset)):
                raise ValueError(f"in needs (col, 'in', values): {p!r}")
            if not p[2]:
                raise ValueError(f"empty 'in' list matches nothing: {p!r}")
            p = (p[0], "in", tuple(p[2]))
        elif len(p) != 3:
            raise ValueError(f"comparison needs (col, op, value): {p!r}")
        out.append(p)
    return out


def stats_may_match(stats: dict | None, preds: list[tuple]) -> bool:
    """Can a file with these per-column [min, max] stats contain a row
    satisfying ALL predicates? Missing stats (file, column, or both)
    → True (never skip what can't be proven empty). A column whose min
    is None holds NO non-null values — comparison predicates match no
    row of it, so the file is provably excluded. Sound for comparison
    semantics because SQL comparisons never match NULL."""
    if not preds:
        return True
    for p in preds:
        st = (stats or {}).get(p[0])
        if st is None:
            continue  # no stats for this column — can't exclude
        mn, mx = st[0], st[1]
        if mn is None:
            return False  # all-null column: no row can satisfy a comparison
        if any(isinstance(v, float) and v != v for v in (mn, mx)):
            # NaN bound: Spark orders NaN above every double AND lets NaN
            # satisfy ordering predicates (NaN >= x is true), so [min,max]
            # interval logic is unsound here — never skip such a file
            continue
        op = p[1]
        try:
            if op == "==" and not (mn <= p[2] <= mx):
                return False
            if op == ">=" and not (mx >= p[2]):
                return False
            if op == ">" and not (mx > p[2]):
                return False
            if op == "<=" and not (mn <= p[2]):
                return False
            if op == "<" and not (mn < p[2]):
                return False
            if op == "between" and not (mx >= p[2] and mn <= p[3]):
                return False
            if op == "in" and not any(mn <= v <= mx for v in p[2]):
                return False
        except TypeError:
            # predicate value's Python type is incomparable with the
            # recorded stat type (e.g. int predicate vs string-statted
            # hive partition column): the contract everywhere is "never
            # skip what can't be proven" — keep the file; the scan-side
            # row filter stays exact regardless
            continue
    return True


# ---- per-file Bloom filters (point-lookup skipping) --------------------

BLOOM_BITS = 4096
BLOOM_HASHES = 4


def bloom_positions(value: str, m: int = BLOOM_BITS, k: int = BLOOM_HASHES) -> list[int]:
    """Bit positions for a value — md5-derived so Python (read side) and
    Spark SQL (collection side: ``conv(substring(md5(concat(col, seed)),
    1, 8), 16, 10) % m``) compute IDENTICAL positions with no shared
    native hash library."""
    import hashlib

    return [
        int(hashlib.md5((value + f"#s{i}").encode()).hexdigest()[:8], 16) % m
        for i in range(k)
    ]


def bloom_encode(positions) -> str:
    """Base64 bitmap from an iterable of set bit positions."""
    import base64

    bits = bytearray(BLOOM_BITS // 8)
    for p in positions:
        p = int(p)
        bits[p // 8] |= 1 << (p % 8)
    return base64.b64encode(bytes(bits)).decode("ascii")


def bloom_may_contain(b64: str | None, key: str | None) -> bool:
    """False only when the bitmap PROVES the value absent; unknown/missing
    bloom OR no sound canonical probe key → True (never skip what can't
    be disproven). ``key`` must already be the canonical Spark
    ``cast(col as string)`` form (see :func:`bloom_probe_key`) — the bits
    were collected from that exact string."""
    if b64 is None or key is None:
        return True
    import base64

    bits = base64.b64decode(b64)
    for p in bloom_positions(key):
        if not (bits[p // 8] >> (p % 8)) & 1:
            return False
    return True


def bloom_probe_key(value, col_type: str | None) -> str | None:
    """Canonical ``cast(col as string)`` form of a predicate value for
    bloom probing, or None when no SOUND canonical form exists (the bloom
    is then not consulted — stats and the row filter still apply).

    Collection hashes Spark's string cast of the column; Python's
    ``str()`` differs on exactly the dangerous cases — ``str(True)`` is
    'True' not '1', ``str(4242.0)`` is '4242.0' not '4242' — so a naive
    probe would prove PRESENT values absent and silently drop matching
    files. ``col_type`` is the indexed column's Spark typeName recorded
    at collection time (``bloom_types``); legacy manifests without it
    fall back to probing only values whose str() is unambiguous across
    every indexable type (plain int / str)."""
    integral = ("byte", "short", "integer", "long")
    if col_type in integral:
        if isinstance(value, bool):
            return str(int(value))
        if isinstance(value, int):
            return str(value)
        if isinstance(value, float) and value.is_integer():
            return str(int(value))
        return None
    if col_type == "string":
        return value if isinstance(value, str) else None
    # unknown column type (legacy manifest): bools/floats are ambiguous,
    # int-vs-string columns could zero-pad — probe only the safe pair
    if isinstance(value, bool) or isinstance(value, float):
        return None
    if isinstance(value, (int, str)):
        return str(value)
    return None


def file_may_match(commit: dict, rel: str, preds: list[tuple]) -> bool:
    """Combined per-file pruning verdict: [min,max] interval logic for
    every op, sharpened by the per-file Bloom filter for point predicates
    (``==`` / ``in``) on bloom-indexed columns — the lookup range stats
    cannot serve when the file isn't clustered on that column."""
    if not stats_may_match((commit.get("stats") or {}).get(rel), preds):
        return False
    blooms = (commit.get("blooms") or {}).get(rel) or {}
    btypes = commit.get("bloom_types") or {}
    for p in preds:
        b64 = blooms.get(p[0])
        if b64 is None:
            continue
        ct = btypes.get(p[0])
        if p[1] == "==" and not bloom_may_contain(b64, bloom_probe_key(p[2], ct)):
            return False
        if p[1] == "in":
            keys = [bloom_probe_key(v, ct) for v in p[2]]
            # skip only when EVERY value is provably absent — a value
            # without a sound probe key is unprovable, so the file stays
            if all(k is not None for k in keys) and not any(
                bloom_may_contain(b64, k) for k in keys
            ):
                return False
    return True


# ---- hive partition-value encoding -------------------------------------

_HIVE_ESCAPE = set('"#%\'*/:=?\\{[]^\x7f')


def hive_value(v) -> str:
    """Render a partition VALUE exactly as Spark encodes it in hive dir
    names (ExternalCatalogUtils.escapePathName semantics): booleans
    lowercase, NULL as the default-partition token, and the reserved
    character set %XX-escaped. Python's ``str()`` differs on precisely
    these cases ('True' vs 'true', raw ':' vs '%3A') — a mismatch makes
    partition deletes/lookups silently miss the real directory."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(v, bool):
        return "true" if v else "false"
    s = str(v)
    return "".join(
        f"%{ord(ch):02X}" if (ch in _HIVE_ESCAPE or ord(ch) < 0x20) else ch
        for ch in s
    )
