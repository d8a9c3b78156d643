"""Incrementally-maintained materialized aggregate views over the
change-data feed.

No reference counterpart — parquetranger (core.py) stores tables; every
derived aggregate is recomputed from scratch by the caller. This module
adds the lakehouse answer (the Delta Live Tables / Materialize shape,
batch-refreshed): a GROUP BY materialization whose refresh cost is
O(changed rows + touched groups), never O(source table), driven by
:meth:`TableRepo.changes_between(row_level=True)`.

Delta algebra per refresh window:

- ``count``  — fully delete-decomposable: ``Δn = Σ sign`` where sign is
  +1 for ``insert``/``update_postimage`` rows and −1 for
  ``delete``/``update_preimage`` rows.
- ``sum`` / ``avg`` — decomposable the same way over DECIMAL(38,6)
  partials (decimal addition is associative and commutative, so the
  incremental state is BIT-IDENTICAL to a one-shot aggregate however
  the history was windowed); ``avg`` rides as a (sum, non-null count)
  pair and divides only at read time, double/double, so the projected
  value matches the oracle's ``CAST(SUM AS DOUBLE)/COUNT`` exactly.
- ``min`` / ``max`` — NOT delete-decomposable (losing the current
  extremum says nothing about the next one). Insert-only groups fold
  incrementally (``least``/``greatest``); any group that saw a delete
  or update pre-image is RE-AGGREGATED from the source snapshot
  restricted to exactly those groups — a semi-join-pruned scan (and a
  partition-pruned one when the source is grouped by the view's lead
  group column), so the rescan is O(changed groups' rows), still never
  O(table).

Groups whose row count reaches zero are deleted from the view. Rows
with a NULL in any group column are dropped — the engine-wide pandas
``groupby`` convention (SURVEY.md C3); state the same ``WHERE g IS NOT
NULL`` in any SQL twin.

Each refresh publishes through ONE fenced keyed commit
(:meth:`TableRepo._apply_keyed_changes`, the sync_from primitive):
the fence is ``(mv:<source path>, source version)``, checked inside the
manifest CAS, so a crashed-and-replayed refresh no-ops before any write
job and two racing refreshes cannot double-apply a window. The view's
last-refreshed source version is read back from that fence — the view
table itself is the checkpoint; there is no side state to lose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .manifest import load_manifest
from .table_repo import TableRepo

_DEC = "decimal(38,6)"
_CNT = "__mv_cnt"


class MaterializedAggView:
    """A GROUP BY materialization of ``source`` kept fresh incrementally.

    ``sums``/``avgs``/``mins``/``maxs`` map output column → SQL
    expression over source columns; ``count_col`` names the row-count
    output. ``dest`` must be a manifest-mode :class:`TableRepo` keyed on
    ``group_cols`` (``index_cols == group_cols``); group it by the lead
    group column to make refreshes partition-pruned when group
    cardinality suits hive layout.

    Internal state columns: ``__mv_cnt`` (long row count — drives group
    death), each sum as DECIMAL(38,6) under its output name, each avg as
    ``<out>__s`` (decimal sum) + ``<out>__c`` (non-null count), min/max
    under their output names. :meth:`read` projects the public schema.
    """

    def __init__(
        self,
        source: TableRepo,
        dest: TableRepo,
        group_cols: list[str],
        count_col: str = "n",
        sums: dict[str, str] | None = None,
        avgs: dict[str, str] | None = None,
        mins: dict[str, str] | None = None,
        maxs: dict[str, str] | None = None,
    ):
        if source.commit_mode != "manifest":
            raise TypeError("MaterializedAggView needs a manifest-mode source")
        if dest.commit_mode != "manifest":
            raise TypeError("MaterializedAggView needs a manifest-mode dest")
        if list(dest.index_cols) != list(group_cols):
            raise TypeError(
                f"dest.index_cols {list(dest.index_cols)} must equal "
                f"group_cols {list(group_cols)} (the view's key)"
            )
        if not source.index_cols:
            raise TypeError(
                "row-level change feeds need source index_cols (unique keys)"
            )
        self.source = source
        self.dest = dest
        self.group_cols = list(group_cols)
        self.count_col = count_col
        self.sums = dict(sums or {})
        self.avgs = dict(avgs or {})
        self.mins = dict(mins or {})
        self.maxs = dict(maxs or {})
        outs = [count_col, *self.sums, *self.avgs, *self.mins, *self.maxs]
        if len(set(outs)) != len(outs):
            raise ValueError(f"duplicate output columns in {outs}")
        self._fid = f"mv:{source.main_path}"

    # ----------------------------------------------------------- refresh

    def last_refreshed(self) -> int:
        """Highest source version already folded into the view — read
        from the fences the refresh commits carry (the newest commit
        always holds the latest fence, so static rewrites of an
        ungrouped dest keep this sound)."""
        mf = load_manifest(self.dest._fs(), self.dest.main_path)
        vals = [
            int(c["fence"][1])
            for c in (mf or {}).get("commits", ())
            if c.get("fence") and c["fence"][0] == self._fid
        ]
        return max(vals, default=0)

    def refresh(self) -> int:
        """Fold every source version committed since the last refresh
        into the view; returns the source version the view now reflects.
        Idempotent (fenced) and snapshot-exact: after refresh the view
        equals a one-shot aggregate of the source at that version."""
        vs = self.source.versions()
        end = vs[-1] if vs else 0
        last = self.last_refreshed()
        if end <= last:
            return last
        gc = self.group_cols
        feed = self.source.changes_between(last, end, row_level=True)
        for g in gc:
            feed = feed.where(F.col(g).isNotNull())
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))

        aggs = [F.sum(sign).cast("long").alias(_CNT)]
        for out, e in self.sums.items():
            aggs.append(
                F.sum(sign.cast(_DEC) * F.expr(e).cast(_DEC)).alias(out)
            )
        for out, e in self.avgs.items():
            x = F.expr(e)
            aggs.append(F.sum(sign.cast(_DEC) * x.cast(_DEC)).alias(f"{out}__s"))
            aggs.append(
                F.sum(F.when(x.isNotNull(), sign).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"{out}__c")
            )
        for out, e in self.mins.items():
            aggs.append(F.min(F.when(sign > 0, F.expr(e))).alias(out))
        for out, e in self.maxs.items():
            aggs.append(F.max(F.when(sign > 0, F.expr(e))).alias(out))
        # any negative contribution in a group invalidates its fold-only
        # min/max (the extremum may have left) → that group rescans
        aggs.append(F.max(F.when(sign < 0, F.lit(1)).otherwise(F.lit(0))).alias("__neg"))
        delta = feed.groupBy(*gc).agg(*aggs).localCheckpoint(eager=True)

        state_cols = self._state_cols()
        old = self.dest.get_full_df() if self.dest.paths else None
        if old is not None:
            # only groups the window touched ride the merge (and, for a
            # grouped dest, the read back is partition-pruned by the
            # apply step later — this semi-join is the planning bound)
            old = old.join(delta.select(*gc), gc, "left_semi")
            # name-join: the group key columns come out coalesced, the
            # state columns stay disambiguated by the o./d. aliases
            merged = old.alias("o").join(delta.alias("d"), gc, "full_outer")
        else:
            merged = delta.alias("d")
        proj = [F.col(g) for g in gc]

        def oldc(c):
            return F.col(f"o.{c}") if old is not None else F.lit(None)

        def dc(c):
            return F.col(f"d.{c}")

        zero = F.lit(0)
        proj.append(
            (F.coalesce(oldc(_CNT), zero) + F.coalesce(dc(_CNT), zero))
            .cast("long")
            .alias(_CNT)
        )
        dzero = F.lit(0).cast(_DEC)
        for out in self.sums:
            proj.append(
                (F.coalesce(oldc(out), dzero) + F.coalesce(dc(out), dzero))
                .cast(_DEC)
                .alias(out)
            )
        for out in self.avgs:
            proj.append(
                (F.coalesce(oldc(f"{out}__s"), dzero) + F.coalesce(dc(f"{out}__s"), dzero))
                .cast(_DEC)
                .alias(f"{out}__s")
            )
            proj.append(
                (F.coalesce(oldc(f"{out}__c"), zero) + F.coalesce(dc(f"{out}__c"), zero))
                .cast("long")
                .alias(f"{out}__c")
            )
        for out in self.mins:
            proj.append(F.least(oldc(out), dc(out)).alias(out))
        for out in self.maxs:
            proj.append(F.greatest(oldc(out), dc(out)).alias(out))
        proj.append(F.coalesce(dc("__neg"), zero).alias("__neg"))
        merged = merged.select(*proj)

        # checkpoint the merged state ONLY when a rescan may consume it
        # more than once (rescan_keys probe + anti-join + semi-join);
        # a no-min/max view flows lazily into the single final
        # checkpoint below — one fewer eager job per refresh
        checkpointed = False
        need_rescan = bool(self.mins or self.maxs)
        if need_rescan:
            merged = merged.localCheckpoint(eager=True)
            checkpointed = True
            rescan_keys = merged.where(
                (F.col("__neg") == 1) & (F.col(_CNT) > 0)
            ).select(*gc)
            if rescan_keys.isEmpty():
                need_rescan = False
        if need_rescan:
            # exact re-aggregate of ONLY the invalidated groups from the
            # source snapshot this refresh reflects — semi-join-pruned
            # (partition-pruned too when the source is grouped by the
            # lead group column); decimal partials keep the replaced
            # state bit-identical to the incremental one
            # current-schema versioned read: the view's group/agg
            # expressions speak CURRENT names — a snapshot-schema frame
            # after a source rename would fail to resolve them
            base = self.source.get_full_df(version=end, bind_snapshot_schema=False)
            for g in gc:
                base = base.where(F.col(g).isNotNull())
            base = base.join(rescan_keys, gc, "left_semi")
            re_aggs = [F.count(F.lit(1)).cast("long").alias(_CNT)]
            for out, e in self.sums.items():
                re_aggs.append(F.sum(F.expr(e).cast(_DEC)).alias(out))
            for out, e in self.avgs.items():
                x = F.expr(e)
                re_aggs.append(F.sum(x.cast(_DEC)).alias(f"{out}__s"))
                re_aggs.append(F.count(x).cast("long").alias(f"{out}__c"))
            for out, e in self.mins.items():
                re_aggs.append(F.min(F.expr(e)).alias(out))
            for out, e in self.maxs.items():
                re_aggs.append(F.max(F.expr(e)).alias(out))
            re_agg = base.groupBy(*gc).agg(*re_aggs)
            merged = (
                merged.join(rescan_keys, gc, "left_anti")
                .drop("__neg")
                .unionByName(re_agg)
            )
        else:
            merged = merged.drop("__neg")

        merged = merged.select(*gc, *state_cols)
        if need_rescan or not checkpointed:
            # the union-with-rescan (or the never-checkpointed lazy
            # frame) anchors three consumers in the apply step (dead
            # filter, live filter, write); a no-rescan frame is already
            # a narrow projection over the checkpoint above
            merged = merged.localCheckpoint(eager=True)
        dead = merged.where(F.col(_CNT) <= 0).select(*gc)
        live = merged.where(F.col(_CNT) > 0)
        # live may be empty — the fence must land anyway (an empty window
        # publishes a fence-carrying empty entry, keeping later windows
        # small). dels=None ONLY on the bootstrap refresh (append-only
        # fast path); any later refresh must take the keyed-rewrite path
        # even with zero deaths, because updated groups' keys pre-exist
        # and must be DISPLACED by the fresh images, not appended beside
        self.dest._apply_keyed_changes(
            None if old is None else dead,
            live,
            fence=(self._fid, end),
        )
        return end

    # -------------------------------------------------------------- read

    def _state_cols(self) -> list[str]:
        cols = [_CNT, *self.sums]
        for out in self.avgs:
            cols += [f"{out}__s", f"{out}__c"]
        cols += [*self.mins, *self.maxs]
        return cols

    def read(self) -> DataFrame:
        """The view's public projection: group columns, the row count,
        sums as doubles (decimal state cast once — the dsum convention),
        avgs as double(sum)/double(count), min/max as stored."""
        df = self.dest.get_full_df()
        proj = [F.col(g) for g in self.group_cols]
        proj.append(F.col(_CNT).alias(self.count_col))
        for out in self.sums:
            proj.append(F.col(out).cast("double").alias(out))
        for out in self.avgs:
            proj.append(
                (
                    F.col(f"{out}__s").cast("double")
                    / F.col(f"{out}__c").cast("double")
                ).alias(out)
            )
        for out in [*self.mins, *self.maxs]:
            proj.append(F.col(out))
        return df.select(*proj)

    def refresh_stream(self, checkpoint: str, trigger: dict | None = None):
        """CONTINUOUS maintenance (the Delta Live Tables shape): pump the
        source's versions-meta feed (:meth:`TableRepo.stream_versions` —
        one metadata row per committed version, no data I/O) through
        ``foreachBatch`` and fold each batch of landed versions with
        :meth:`refresh`. All exactly-once weight stays on refresh()'s
        fences — the stream only supplies scheduling and catch-up:
        a replayed micro-batch re-invokes refresh(), which no-ops
        against the fence it already committed; a crash between stream
        checkpoint and view commit re-delivers, same answer. Default
        trigger is ``availableNow`` (catch up, then stop — the
        cron-shaped deployment); pass ``{"processingTime": "10 seconds"}``
        for an always-on view. Returns the StreamingQuery."""
        feed = self.source.stream_versions()

        def fold(batch_df, _epoch):
            # the rows are the trigger, refresh() re-derives the exact
            # window from the manifests — nothing here can double-apply
            if batch_df.take(1):
                self.refresh()

        return (
            feed.writeStream.foreachBatch(fold)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )

    def full_recompute_df(self) -> DataFrame:
        """One-shot batch aggregate of the CURRENT source in the view's
        public schema — the verification twin refresh() must equal at
        the version it returned."""
        base = self.source.get_full_df()
        for g in self.group_cols:
            base = base.where(F.col(g).isNotNull())
        aggs = [F.count(F.lit(1)).cast("long").alias(self.count_col)]
        for out, e in self.sums.items():
            aggs.append(F.sum(F.expr(e).cast(_DEC)).cast("double").alias(out))
        for out, e in self.avgs.items():
            x = F.expr(e)
            aggs.append(
                (F.sum(x.cast(_DEC)).cast("double") / F.count(x).cast("double")).alias(
                    out
                )
            )
        for out, e in self.mins.items():
            aggs.append(F.min(F.expr(e)).alias(out))
        for out, e in self.maxs.items():
            aggs.append(F.max(F.expr(e)).alias(out))
        return base.groupBy(*self.group_cols).agg(*aggs)
