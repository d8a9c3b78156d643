"""Multi-table ACID transactions over the manifest commit protocol.

The reference engine (parquetranger core.py) scopes every write to one
table root guarded by a per-path lock — there is no way to make an
append to ``facts`` and the matching upsert to ``summary`` visible
together. This module adds that contract on top of the existing
manifest CAS, the way a lakehouse catalog does (Iceberg's multi-table
catalog commit shape), without adding a second commit protocol:

- Each participating write publishes its manifest entry NOW, through the
  normal optimistic-concurrency CAS loop — ordering against concurrent
  writers is settled immediately — but the entry carries
  ``"txn": <marker path>`` and every read surface treats it as
  nonexistent while the marker is unwritten
  (:func:`..manifest.visible_commits`).
- :meth:`Transaction.commit` / :meth:`Transaction.abort` write the single
  decision marker with one ``create_exclusive`` — the ONLY atomicity
  point. However many tables and entries the txn touched, visibility
  flips for all of them in that one filesystem CAS: a reader sees either
  every gated entry or none, never a torn subset.
- A crashed coordinator leaves the marker unwritten: all entries stay
  invisible (clean), and either a later :meth:`commit`/:meth:`abort` on a
  re-created handle (same ``txn_id``) or :meth:`TableRepo.
  sweep_aborted_txns` after an explicit abort resolves them.

Additive commit kinds — plain appends and deletion-vector tombstones —
participate directly: their effect is carried entirely by their own
entry, so gating the entry gates the effect. Keyed upsert is expressible
as dv-delete + append (both gated), which is exactly what
:meth:`Transaction.replace_records` publishes. DECLARED overwrites
(``replace_groups`` / ``replace_all``) are destructive — the eager path
rewrites OTHER entries at publish time, which cannot be gated
retroactively — so their transactional flavor publishes an additive
entry carrying a deferred-overwrite spec (``entry["ow"]``): the new
files land now (gated, invisible), and the prune of the files they
replace is applied by the READ path once the txn commits
(:func:`..manifest.effective_commits`), then physically folded into the
chain by the next publish (:func:`..manifest.fold_decided_overwrites`).
The atomicity point stays the single marker CAS.

Concurrency interplay (see ``TableRepo._check_rmw_conflict``): a
non-transactional keyed rewrite conflicts loudly with any undecided
txn entry in the partitions it touches (pruning an undecided entry
would destroy data the txn may yet commit), and with any entry that
committed after the rewrite's snapshot (its rows were never read).
``replace_all`` remains declared last-writer-wins truncation and will
drop gated entries like any others — documented, as for every commit.

Scale shape: a transaction adds zero data movement — the data files are
written exactly once where a plain append would put them; the overhead
is one KB-sized marker file and one string per manifest entry. Reads pay
one ``exists()`` per *distinct undecided* txn per plan (resolved
outcomes are cached process-wide), which is O(in-flight txns), not
O(commits).
"""

from __future__ import annotations

import json
import time
import uuid
from typing import TYPE_CHECKING

from .fs import fs_for, join_path

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

    from .table_repo import TableRepo


class TransactionError(RuntimeError):
    """Raised when a transaction is used after it was decided, or when a
    commit/abort loses the decision race to the other outcome."""


class Transaction:
    """Coordinator handle for one multi-table transaction.

    ``catalog_root`` is any URI/path the participating processes can all
    reach (local dir, s3a://bucket/txns, ...); decision markers live
    there as ``txn-<id>.json``. Passing an existing ``txn_id`` re-creates
    the handle for a txn whose coordinator crashed, to decide it late::

        t = Transaction("/warehouse/_txns")
        t.extend(facts, new_rows)
        t.replace_records(summary, new_summary)   # dv-delete + append
        t.commit()                                # one CAS, both visible
    """

    def __init__(self, catalog_root: str, txn_id: str | None = None):
        self.catalog_root = catalog_root
        self.txn_id = txn_id or uuid.uuid4().hex[:16]
        self.marker = join_path(catalog_root, f"txn-{self.txn_id}.json")
        self._writes = 0

    # ------------------------------------------------------------ writes

    def extend(self, repo: "TableRepo", df: "DataFrame") -> None:
        """Gated append: full write path (alignment, constraints,
        clustering, stats) runs now; the entry publishes with the txn
        marker and stays invisible until :meth:`commit`."""
        self._check_undecided("extend")
        staged = repo.stage_extend(df)
        staged._entry["txn"] = self.marker
        staged.publish("append")
        self._writes += 1

    def delete_records_dv(self, repo: "TableRepo", keys: "DataFrame") -> None:
        """Gated merge-on-read delete: the tombstone entry publishes now,
        takes effect only when the txn commits."""
        self._check_undecided("delete_records_dv")
        repo.delete_records_dv(keys, _txn=self.marker)
        self._writes += 1

    def replace_records(self, repo: "TableRepo", df: "DataFrame") -> None:
        """Gated keyed upsert = dv-delete of ``df``'s keys + append of
        ``df``, both under this txn. The dv entry publishes BELOW the
        append in commit order, so on commit the new rows survive their
        own tombstones (the same position rule every dv read applies) and
        rows under matching keys in older commits die with them —
        atomically, alongside every other table in the txn."""
        self._check_undecided("replace_records")
        if not repo.index_cols:
            raise TypeError("replace_records needs index_cols (the match key)")
        self.delete_records_dv(repo, df.select(*repo.index_cols))
        self.extend(repo, df)

    def replace_groups(self, repo: "TableRepo", df: "DataFrame") -> None:
        """Gated dynamic partition overwrite: the partitions present in
        ``df`` are atomically replaced — alongside every other table in
        the txn — when the marker commits. Published as an additive
        entry carrying the deferred-overwrite spec (the partitions it
        replaces, computed from its OWN staged files — no extra job);
        the prune of older files in those partitions applies at read
        time once the txn commits and is folded physically by the next
        publish. Same last-writer-wins posture vs concurrent overwrites
        of the same partitions as the eager path."""
        self._check_undecided("replace_groups")
        if not repo.group_cols:
            raise TypeError("replace_groups: not a grouped table")
        from .manifest import partition_values_of

        staged = repo.stage_extend(df)
        touched = sorted(
            {
                partition_values_of(f, repo.group_cols)
                for f in staged._entry["files"]
            }
        )
        staged._entry["txn"] = self.marker
        staged._entry["ow"] = {
            "scope": "groups",
            "touched": [list(t) for t in touched],
            "spec": list(repo.group_cols),
        }
        staged.publish("append")
        self._writes += 1

    def replace_all(self, repo: "TableRepo", df: "DataFrame") -> None:
        """Gated truncate-and-load: when the marker commits, the table's
        prior contents vanish and ``df`` is the table — atomically with
        the txn's other writes. Fence tombstones survive the truncation
        (same exactly-once invariant as the eager static overwrite)."""
        self._check_undecided("replace_all")
        staged = repo.stage_extend(df)
        staged._entry["txn"] = self.marker
        staged._entry["ow"] = {"scope": "all"}
        staged.publish("append")
        self._writes += 1

    # ---------------------------------------------------------- decision

    def commit(self) -> None:
        """Make every gated entry visible, atomically, via the single
        marker CAS. Raises :class:`TransactionError` if a concurrent
        :meth:`abort` (or another coordinator's decision) won."""
        self._decide("committed")

    def abort(self) -> None:
        """Permanently hide every gated entry (their files are reclaimed
        by :meth:`TableRepo.sweep_aborted_txns` + vacuum). Raises
        :class:`TransactionError` if a concurrent commit won."""
        self._decide("aborted")

    @property
    def state(self) -> str:
        """``pending`` | ``committed`` | ``aborted`` — resolved from the
        marker, so any process can ask, not just the coordinator."""
        from .manifest import txn_state

        return txn_state(self.marker)

    def _decide(self, outcome: str) -> None:
        fs = fs_for(self.catalog_root)
        won = fs.create_exclusive(
            self.marker,
            json.dumps({"state": outcome, "txn_id": self.txn_id, "ts": time.time()}),
        )
        if not won:
            prior = self.state
            if prior != outcome:
                raise TransactionError(
                    f"transaction {self.txn_id} already {prior}; cannot {outcome}"
                )
            # idempotent re-decision with the same outcome: fine (a retry
            # after a timeout that actually landed)

    def _check_undecided(self, op: str) -> None:
        st = self.state
        if st != "pending":
            raise TransactionError(
                f"cannot {op}: transaction {self.txn_id} already {st}"
            )
