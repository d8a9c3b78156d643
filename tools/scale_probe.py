"""Empirical scaling probe: run the heavyweight pipeline operators on
1x / 3x / 10x replicas of the sf0.1 corpus (id-offset unions — no disk
writes) and report wall time + the fitted scaling exponent.

A bucketed/candidate-scoped operator should scale ~linearly (exponent
≈ 1); an accidental all-pairs or quadratic-expression shape shows up as
exponent ≥ 1.5 long before it would OOM a cluster. Run:

    python tools/scale_probe.py            # default sf0.1
    SPARK_GRAFT_SF_DIR=... python tools/scale_probe.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquetranger_spark.operators.curation import budget_select, repetition_stats  # noqa: E402
from parquetranger_spark.operators.dedup import (  # noqa: E402
    connected_components_star,
    exact_dedup,
    incremental_near_dedup,
    minhash_index,
    near_dedup_minhash,
    semantic_dedup,
)
from parquetranger_spark.operators.temporal import asof_join_backward  # noqa: E402
from parquetranger_spark.queries.common import load  # noqa: E402
from parquetranger_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = [1, 3, 10]


def replicate(df, id_col: str, factor: int, offset: int = 10_000_000):
    out = df
    for i in range(1, factor):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * offset))
        )
    # replicas arrive as extra partitions, mirroring extra input splits
    return out.repartition(32)


def _fit_exponent(times):
    xs = [math.log(f) for f in FACTORS]
    ys = [math.log(t) for t in times]
    xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
    return sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sum(
        (x - xbar) ** 2 for x in xs
    )


def probe(spark):
    results = {}
    # cc_star_chain runs FIRST, before ANY heavy setup (round-9 verdict
    # #2): the op is 20+ per-round barriers of sub-second stages, so its
    # wall time is round-overhead-bound and hyper-sensitive to session
    # state — the r9 number (176 s at 10x vs r8's 53 s, code unchanged)
    # was measured AFTER the grown-index builds, whose setup-era
    # checkpoints are pinned in keep_ids for the whole probe. Clean
    # fresh-session re-measures (tools/cc_probe_standalone.py, CC_STAR_
    # r10) read 51-78 s at 10x, exponent ≈ 0.35 — matching r8. Star CC
    # on a pathological CHAIN (diameter = n — HashMin's worst case):
    # rounds grow ~log2(n) (11/15/18 at 1e3/1e4/1e5 vertices), so the
    # exponent reads ≈ 0.3-0.45 locally (per-round overhead × log n
    # rounds — NOT ≈0: each round's fixed cost never shrinks), which is
    # still the property that makes diameter irrelevant at 100 TB.
    cc_times = []
    for f in FACTORS:
        t0 = time.monotonic()
        (
            connected_components_star(
                spark.range(100_000 * f - 1).select(
                    F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
                ),
                max_iter=40,
            )
            .where(F.col("component") != 0)
            .count()
        )
        cc_times.append(round(time.monotonic() - t0, 2))
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist(False)
        spark.sparkContext._jvm.System.gc()
    results["cc_star_chain"] = {
        "times_sec": dict(zip(map(str, FACTORS), cc_times)),
        "exponent": round(_fit_exponent(cc_times), 2),
    }
    print(f"# cc_star_chain: {results['cc_star_chain']}", file=sys.stderr)

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "ts", "event_type")
    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    from parquetranger_spark.operators.similarity import (  # noqa: E402
        topk_cosine_pq,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(emb)
    pq_queries = emb.where(F.col("vec_id") < 50)

    def pq_adc(f):
        # corpus replicas shift ids; queries stay fixed — ADC scan cost
        # is corpus-linear by construction (m-byte codes per row)
        topk_cosine_pq(
            pq_queries, replicate(emb, "vec_id", f), k=5, codebooks=books
        ).count()

    def q21(f):
        lif = replicate(li, "l_orderkey", f)
        of = replicate(
            orders.where(F.col("o_orderstatus") == "F"), "o_orderkey", f
        )
        lo = lif.join(of, lif.l_orderkey == of.o_orderkey).select(
            "l_orderkey",
            "l_suppkey",
            (
                F.unix_micros(F.col("l_shipdate").cast("timestamp"))
                > F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            ).alias("late"),
        )
        per_order = lo.groupBy("l_orderkey").agg(
            F.count_distinct("l_suppkey").alias("n_supps"),
            F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
                "n_late"
            ),
        )
        (
            lo.where(F.col("late"))
            .select("l_orderkey", "l_suppkey")
            .distinct()
            .join(per_order, "l_orderkey")
            .where((F.col("n_supps") > 1) & (F.col("n_late") == 1))
            .count()
        )

    from parquetranger_spark.operators.similarity import knn_density_ivf  # noqa: E402

    ops = {
        # near-dedup: bucketed LSH; candidate count grows with injected
        # replicas (every replica set is mutually near-dup), so expect
        # slightly superlinear on this adversarial corpus
        "near_dedup_minhash": lambda f: near_dedup_minhash(
            replicate(docs, "doc_id", f)
        ).count(),
        # round 5: ANN-candidate kth-NN density (the outlier path).
        # Auto n_lists ≈ √n keeps per-query candidates at n_probe·√n —
        # the sub-quadratic IVF balance; the exact rescan is a fixed
        # rerank×|corpus| broadcast. Expect ≈ linear wall time locally
        # (job overhead amortizes the n^1.5 pair tail), never the
        # all-pairs quadratic this replaced
        "knn_density_ivf": lambda f: knn_density_ivf(
            replicate(emb, "vec_id", f), k=5, n_probe=4, rerank=50
        ).count(),
        "exact_dedup": lambda f: exact_dedup(replicate(docs, "doc_id", f)).count(),
        "repetition_stats": lambda f: replicate(docs, "doc_id", f)
        .transform(repetition_stats)
        .agg(F.sum("top_word_count"))
        .collect(),
        "asof_join": lambda f: asof_join_backward(
            replicate(ev, "event_id", f).where(F.col("event_type") == "purchase"),
            replicate(ev, "event_id", f)
            .where(F.col("event_type") == "view")
            .select("user_id", "ts"),
            ["user_id"],
            "ts",
        ).count(),
        # round 4: PQ ADC scan and the decorrelated Q21 shape — both
        # should probe ≈ linear (exponent ≈ 1)
        "pq_adc_topk": pq_adc,
        "q21_decorrelated": q21,
        # round-4 wave 2: the no-global-sort budget selection (band
        # windows — linear) and SemDeDup (cluster-scoped pairs; replicas
        # share directions so candidate growth is factor-quadratic within
        # each direction group — adversarial corpus, like minhash above)
        "budget_select": lambda f: budget_select(
            replicate(
                docs.select(
                    "doc_id",
                    F.length("text").alias("n_chars"),
                    F.size(F.split("text", " ")).cast("long").alias("n_tok"),
                ),
                "doc_id",
                f,
            ),
            order_col="n_chars",
            id_col="doc_id",
            weight_col="n_tok",
            budget_frac=0.3,
        ).count(),
        "semantic_dedup": lambda f: semantic_dedup(
            replicate(emb, "vec_id", f),
            threshold=0.99,
            n_clusters=max(8, 4 * f),
            bucket_cap=5000,
        ).count(),
        # incremental near-dedup: the BATCH stays fixed while the history
        # index replicates — the O(batch + matches) claim means growth
        # tracks only the index-probe join's build side, never a
        # re-shingling of history. Indexes are PRE-MATERIALIZED outside
        # the timed lambda (that is the whole point of persisting them —
        # a nightly refresh reads the stored index, it doesn't rebuild)
        # (cc_star_chain moved to the TOP of probe() — see the round-10
        # note there: it must run before heavy setup pins session state)
        "incremental_dedup_fixed_batch": lambda f: incremental_near_dedup(
            docs.where(F.col("doc_id") % 37 == 0).select(
                (F.col("doc_id") + 500_000_000).alias("doc_id"), "text"
            ),
            replicate(docs, "doc_id", f),
            prebuilt_idx[f],
            threshold=0.6,
        ).count(),
    }
    # round-4 wave 3: merge-on-read deletion vectors. The tombstone write
    # is O(deleted keys) — fixed here — and the DV-filtered read is one
    # broadcast anti-join over the scan, so the pair should probe ≈
    # linear in table size with a constant delete component. Tables are
    # PRE-WRITTEN outside the timed lambda (the probe times delete+read,
    # not ingest).
    import tempfile

    from parquetranger_spark.sources.table_repo import TableRepo

    dv_root = tempfile.mkdtemp(prefix="pqrs_scale_dv_")
    dv_repos = {}
    for f in FACTORS:
        r = TableRepo(
            f"{dv_root}/t{f}",
            group_cols="l_returnflag",
            index_cols=["l_orderkey", "l_linenumber"],
            commit_mode="manifest",
            spark=spark,
        )
        r.extend(
            replicate(
                load(spark, SF_DIR, "lineitem").select(
                    "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
                ),
                "l_orderkey",
                f,
            )
        )
        dv_repos[f] = r
    dv_keys = (
        load(spark, SF_DIR, "lineitem")
        .where(F.col("l_orderkey") % 97 == 0)
        .select("l_orderkey", "l_linenumber")
        .localCheckpoint(eager=True)
    )

    def dv_delete_and_read(f):
        dv_repos[f].delete_records_dv(dv_keys)
        dv_repos[f].get_full_df().count()

    ops["dv_delete_and_read"] = dv_delete_and_read

    # round 5: CDC replication refresh. Source tables grow with the
    # factor but the CHANGE per refresh is a fixed 1k-row append — the
    # O(changed files) claim means refresh time should be ~flat
    # (exponent ≈ 0; insert-only batches take sync_from's fenced-append
    # fast path, no replica read-back). Source/replica pairs and the
    # initial full sync are PRE-BUILT outside the timed lambda (a
    # steady-state subscriber refreshes increments, it does not
    # re-bootstrap).
    cdc_root = tempfile.mkdtemp(prefix="pqrs_scale_cdc_")
    cdc_pairs = {}
    ev_small = (
        load(spark, SF_DIR, "events")
        .select("event_id", "event_type", "value")
        .limit(1000)
        .localCheckpoint(eager=True)
    )
    for f in FACTORS:
        sr = TableRepo(
            f"{cdc_root}/src{f}",
            index_cols="event_id",
            commit_mode="manifest",
            spark=spark,
        )
        sr.extend(
            replicate(
                load(spark, SF_DIR, "events").select(
                    "event_id", "event_type", "value"
                ),
                "event_id",
                f,
            )
        )
        rp = TableRepo(
            f"{cdc_root}/repl{f}",
            index_cols="event_id",
            commit_mode="manifest",
            spark=spark,
        )
        rp.sync_from(sr, checkpoint=f"{cdc_root}/ck{f}")
        cdc_pairs[f] = (sr, rp)

    refresh_seq = {f: 0 for f in FACTORS}

    def cdc_sync_refresh(f):
        sr, rp = cdc_pairs[f]
        refresh_seq[f] += 1
        # fresh keys per refresh — a fixed-size append increment
        sr.extend(
            ev_small.withColumn(
                "event_id",
                F.col("event_id") + F.lit(900_000_000 + refresh_seq[f] * 1_000_000),
            )
        )
        rp.sync_from(sr, checkpoint=f"{cdc_root}/ck{f}")

    ops["cdc_sync_refresh"] = cdc_sync_refresh

    # round 5: persisted-IVF query latency. The index is PRE-BUILT per
    # factor (build is a one-time cost; the serving question is query
    # latency against a grown corpus). n_lists tracks √n via build's
    # default, so candidate volume per query is n_probe·n/√n = O(√n) —
    # expect exponent ≈ 0.5 or below (probe planning + pruned-partition
    # scan overheads dominate at these sizes).
    from parquetranger_spark.operators.ann_index import AnnIndex  # noqa: E402

    ann_root = tempfile.mkdtemp(prefix="pqrs_scale_ann_")
    ann_idx = {}
    for f in FACTORS:
        ai = AnnIndex(f"{ann_root}/idx{f}", spark=spark)
        ai.build(
            replicate(emb, "vec_id", f).withColumn(
                "bucket", (F.col("vec_id") % 10).cast("int")
            ),
            seed=42,
            attr_cols=["bucket"],
        )
        ann_idx[f] = ai
    ann_queries = emb.where(F.col("vec_id") < 50).localCheckpoint(eager=True)

    def ann_index_query(f):
        ann_idx[f].query(ann_queries, k=5, n_probe=8).count()

    ops["ann_index_query"] = ann_index_query

    # round 5 wave 2: FILTERED vector search against the same pre-built
    # indexes — the 10%-selective attribute predicate prunes inside the
    # probed partitions' scan, so per-query candidate volume is
    # selectivity·n_probe·n/√n; probe escalation only triggers when a
    # query can't fill k. Expect the same sub-√n shape as the unfiltered
    # query (exponent ≤ ~0.5), NOT a post-filter-then-rescan blowup.
    def ann_filtered_query(f):
        ann_idx[f].query(ann_queries, k=5, n_probe=8, where="bucket = 3").count()

    ops["ann_filtered_query"] = ann_filtered_query

    # round 7: IVF-PQ serving against pre-built PQ indexes — the ADC
    # candidate scan reads m-byte codes only (column-pruned), rerank
    # touches candidates' raw vectors alone, so the timed op should
    # track the unfiltered ann_index_query's sub-√n shape with a
    # SMALLER byte constant (exponent ≤ ~0.5)
    pq_root = tempfile.mkdtemp(prefix="pqrs_scale_pq_")
    pq_idx = {}
    for f in FACTORS:
        ai = AnnIndex(f"{pq_root}/idx{f}", spark=spark)
        ai.build(replicate(emb, "vec_id", f), seed=42, pq_m=8)
        pq_idx[f] = ai

    def ann_index_pq_query(f):
        pq_idx[f].query_pq(ann_queries, k=5, n_probe=8, rerank=40).count()

    ops["ann_index_pq_query"] = ann_index_pq_query

    # round 5 wave 2: schema-DDL mapped read. Repos are pre-written in
    # two commits per factor, then renamed + default-added — METADATA
    # only; the timed read pays the per-commit field-id projection
    # (alias + constant default fold). The claim: the mapping is a free
    # Catalyst projection — the read scales like a plain scan (≈ the
    # exact_dedup scan exponent), with no per-row or per-commit blowup.
    ddl_root = tempfile.mkdtemp(prefix="pqrs_scale_ddl_")
    ddl_repos = {}
    for f in FACTORS:
        r = TableRepo(
            f"{ddl_root}/t{f}",
            commit_mode="manifest",
            single_writer=True,
            spark=spark,
        )
        big = replicate(docs, "doc_id", f)
        r.extend(big.where(F.col("doc_id") % 2 == 0))
        r.extend(big.where(F.col("doc_id") % 2 == 1))
        r.rename_column("text", "body")
        r.add_column("source", "string", default="legacy")
        ddl_repos[f] = r

    def ddl_mapped_read(f):
        ddl_repos[f].get_full_df().agg(
            F.sum(F.length("body")), F.count("source")
        ).collect()

    ops["ddl_mapped_read"] = ddl_mapped_read

    # round 6: GOVERNED read. Repos are pre-written + policied per
    # factor; the timed read is the governed handle's full scan + agg.
    # The claim: masks and the row filter are plain Column expressions
    # Catalyst folds into the scan projection/filter, so a governed read
    # scales exactly like a plain scan (≈ ddl_mapped_read's exponent) —
    # governance costs a projection, never a second pass.
    gov_root = tempfile.mkdtemp(prefix="pqrs_scale_gov_")
    gov_handles = {}
    for f in FACTORS:
        r = TableRepo(
            f"{gov_root}/t{f}",
            commit_mode="manifest",
            single_writer=True,
            spark=spark,
        )
        r.extend(replicate(docs, "doc_id", f))
        r.set_policy(
            row_filter="doc_id % 10 != 0",
            column_masks={"text": "repeat('*', 8)"},
        )
        gov_handles[f] = TableRepo.open(f"{gov_root}/t{f}", spark=spark, governed=True)

    def governed_read(f):
        gov_handles[f].get_full_df().agg(
            F.sum(F.length("text")), F.count(F.lit(1))
        ).collect()

    ops["governed_read"] = governed_read

    # round 6: versions-metadata feed. Tables hold factor-scaled DATA but
    # a FIXED number of commits (6); the timed op drains stream_versions
    # availableNow. The claim: the feed derives entirely from the version
    # JSONs — zero data files opened — so drain time is flat in data size
    # (exponent ≈ 0), which is what lets the matview refresh trigger poll
    # a 100 TB table for free.
    vf_root = tempfile.mkdtemp(prefix="pqrs_scale_vf_")
    vf_repos = {}
    for f in FACTORS:
        r = TableRepo(
            f"{vf_root}/t{f}",
            index_cols="doc_id",
            commit_mode="manifest",
            single_writer=True,
            spark=spark,
        )
        big = replicate(docs, "doc_id", f)
        for i in range(6):
            r.extend(big.where(F.col("doc_id") % 6 == i))
        vf_repos[f] = r
    vf_seq = {"n": 0}

    def versions_feed(f):
        vf_seq["n"] += 1
        out = f"{vf_root}/out{f}_{vf_seq['n']}"
        q = (
            vf_repos[f]
            .stream_versions()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", out + "_ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    ops["versions_feed"] = versions_feed

    # round 8: index maintenance under DRIFT. Twin indexes per factor —
    # both absorb a skewed append stream 4x the corpus size aimed at ONE
    # region (every vector routes to the same frozen centroid); one twin
    # then runs maintain() sweeps to convergence (list splits), the
    # other is left unmaintained. Queries aimed at the drift region with
    # n_probe=1 make the probed-list scan the dominant cost: the
    # UNMAINTAINED twin scans the whole fat list (∝ n — the degradation
    # the verdict flagged), the maintained twin scans one balanced child
    # (∝ mean list size = n/√n) — expect maintained exponent ≤ ~0.5 with
    # the unmaintained one visibly above it.
    from parquetranger_spark.functions.vectors import to_double  # noqa: E402

    drift_root = tempfile.mkdtemp(prefix="pqrs_scale_drift_")

    def _drifted(df):
        return df.select(
            (F.col("vec_id") + F.lit(500_000_000)).alias("vec_id"),
            F.transform(
                to_double(F.col("embedding")),
                lambda x: F.lit(3.0) + F.lit(0.1) * x,
            ).alias("embedding"),
        )

    drift_m, drift_u = {}, {}
    for f in FACTORS:
        corpus = replicate(emb, "vec_id", f)
        drift = _drifted(replicate(emb, "vec_id", 4 * f))
        for tag, d in (("m", drift_m), ("u", drift_u)):
            ai = AnnIndex(f"{drift_root}/{tag}{f}", spark=spark)
            ai.build(corpus, seed=42)
            ai.add(drift)
            d[f] = ai
        for _ in range(6):  # sweeps converge (children re-split if fat)
            if not drift_m[f].maintain(split_factor=2.0, min_split_rows=64)[
                "split"
            ]:
                break
    drift_queries = _drifted(
        emb.where(F.col("vec_id") < 100)
    ).localCheckpoint(eager=True)

    def ann_index_drift_query(f):
        drift_m[f].query(
            drift_queries, k=5, n_probe=1, exclude_self=False
        ).count()

    ops["ann_index_drift_query"] = ann_index_drift_query

    def ann_index_drift_unmaintained(f):
        drift_u[f].query(
            drift_queries, k=5, n_probe=1, exclude_self=False
        ).count()

    ops["ann_index_drift_unmaintained"] = ann_index_drift_unmaintained

    # round 9: GROWN-from-small serving (verdict #8). Build once on the
    # 1x corpus (n_lists = √n1), then append (f)x more via add() —
    # which routes to FROZEN centroids, so without repair the routing
    # table stays √n1 and per-probe scan cost walks toward linear.
    # maintain(grow_to_sqrt=True) re-targets n_lists ≈ √(corpus) at
    # sweep time; the timed query should hold the IVF √n design point
    # (exponent ≤ ~0.5) on an index that never saw a full rebuild.
    grow_root = tempfile.mkdtemp(prefix="pqrs_scale_grow_")
    grown_idx = {}
    for f in FACTORS:
        ai = AnnIndex(f"{grow_root}/g{f}", spark=spark)
        ai.build(emb, seed=42)
        ai.add(
            replicate(emb, "vec_id", f).withColumn(
                "vec_id", F.col("vec_id") + F.lit(700_000_000)
            )
        )
        for _ in range(6):  # growth sweeps converge like drift sweeps
            if not ai.maintain(split_factor=4.0, min_split_rows=64)["split"]:
                break
        grown_idx[f] = ai

    def ann_index_grown_query(f):
        grown_idx[f].query(ann_queries, k=5, n_probe=8).count()

    ops["ann_index_grown_query"] = ann_index_grown_query
    prebuilt_idx = {
        f: minhash_index(replicate(docs, "doc_id", f)).localCheckpoint(eager=True)
        for f in FACTORS
    }
    # (results was seeded with cc_star_chain at the top of probe())
    # RDDs that must SURVIVE between probes: the pre-materialized index /
    # key localCheckpoints above — everything else a probed op persists
    # is swept after its run (same hygiene as bench.py: clearCache misses
    # eager localCheckpoint blocks; left behind they pile old-gen
    # pressure that makes LATER ops at the BIG factor read superlinear —
    # a measurement artifact, not a scaling property)
    keep_ids = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    for name, fn in ops.items():
        times = []
        for f in FACTORS:
            t0 = time.monotonic()
            fn(f)
            dt = time.monotonic() - t0
            times.append(round(dt, 2))
            spark.catalog.clearCache()
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet().toArray()):
                if rid not in keep_ids:
                    jmap.get(rid).unpersist(False)
            spark.sparkContext._jvm.System.gc()
        # fit t = c * n^k over the probed factors (least squares in logs)
        k = _fit_exponent(times)
        results[name] = {"times_sec": dict(zip(map(str, FACTORS), times)), "exponent": round(k, 2)}
        print(f"# {name}: {results[name]}", file=sys.stderr)
    return results


if __name__ == "__main__":
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    spark.sql("select count(*) from range(1000000)").collect()
    print(json.dumps({"sf_dir": SF_DIR, "factors": FACTORS, "ops": probe(spark)}))
