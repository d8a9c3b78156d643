"""Exercise the REAL transformWithStateInPandas branch of
streaming_profile_tws (streaming/sessions.py) — not just its
applyInPandasWithState fallback — and assert both branches emit the
identical per-key profile.

This container ships no ``google.protobuf`` wheel, but a pure runtime
lives in the system Cloud SDK (google_appengine platform dir). Its
runtime version trails pyspark's generated-code stamp by one minor
(6.32 vs 6.33), so a TEST-ONLY shim relaxes protobuf's gencode/runtime
version gate; wire behavior is then proven by the test itself — the TWS
branch must produce identical aggregates to the (protobuf-free)
fallback on the same input. The TWS run happens in a SUBPROCESS with
the shim on PYTHONPATH *before* the JVM starts (python workers inherit
the JVM's env, so patching after session launch is too late) — which
also keeps the shared test session protobuf-free for every other test.
Production deployments install a matching protobuf; the shim never
ships outside this test."""

import json
import os
import subprocess
import sys
import textwrap

import pytest

from parquetranger_spark.queries.common import load

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"

TWS_SCRIPT = textwrap.dedent(
    """
    import json, sys, uuid
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {gae!r})
    import google.protobuf.runtime_version as rv
    rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None

    from parquetranger_spark.session import get_spark
    from parquetranger_spark.streaming.ingest import (
        rocksdb_state_store, state_partitions,
    )
    from parquetranger_spark.streaming import sessions as S
    from pyspark.sql import functions as F

    src = sys.argv[1]
    spark = get_spark("tws-real")
    spark.sparkContext.setLogLevel("ERROR")
    stream = (
        spark.readStream.schema("user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    df = S.streaming_profile_tws(stream)
    # prove we are on the REAL branch: the plan must be TWS, not
    # applyInPandasWithState
    plan = df._jdf.queryExecution().logical().toString()
    assert "transformWithStateInPySpark" in plan.replace(" ", "") or \\
        "TransformWithState" in plan, plan
    name = f"tws_{{uuid.uuid4().hex[:6]}}"
    with state_partitions(spark, 4), rocksdb_state_store(spark):
        q = (
            df.writeStream.format("memory").queryName(name)
            .outputMode("update")
            .option("checkpointLocation", sys.argv[2])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    rows = (
        spark.table(name).groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("n_types").alias("n_types"))
        .collect()
    )
    out = sorted((r["user_id"], r["n_events"], r["n_types"]) for r in rows)
    print("TWS_RESULT:" + json.dumps(out))
    """
)


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(GAE, "google", "protobuf")),
    reason="no system protobuf runtime available to exercise the TWS branch",
)
def test_tws_real_branch_matches_fallback(spark, sf_dir, tmp_path):
    """The transformWithStateInPandas branch (ValueState + MapState via
    the state-server protocol, RocksDB provider) and the
    applyInPandasWithState fallback must emit the identical per-key
    (n_events, n_types) profile on the same input — the contract-
    equivalence claim the fallback's docstring makes, executed."""
    import uuid

    from pyspark.sql import functions as F

    from parquetranger_spark.streaming.ingest import state_partitions
    from parquetranger_spark.streaming import sessions as S

    ev = load(spark, sf_dir, "events").select("user_id", "event_type").limit(1200)
    ev.repartition(3).write.mode("overwrite").parquet(f"{tmp_path}/src")

    # real TWS branch, isolated subprocess. The shim must reach the
    # python WORKERS the JVM spawns (the TWS driver worker validates
    # state schema in its own fresh interpreter) — a sitecustomize.py on
    # PYTHONPATH is the only pre-import hook those inherit.
    shim = tmp_path / "pyshim"
    shim.mkdir()
    (shim / "sitecustomize.py").write_text(
        textwrap.dedent(
            f"""
            import sys
            sys.path.insert(0, {GAE!r})
            try:
                import google.protobuf.runtime_version as _rv
                _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
            except Exception:
                pass
            """
        )
    )
    script = tmp_path / "tws_run.py"
    script.write_text(TWS_SCRIPT.format(repo=REPO, gae=GAE))
    env = dict(os.environ)
    env["PYTHONPATH"] = str(shim)
    env["SPARK_GRAFT_CPUS"] = "4"
    r = subprocess.run(
        [sys.executable, str(script), f"{tmp_path}/src", f"{tmp_path}/ckpt_tws"],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert r.returncode == 0, f"TWS subprocess failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}"
    line = [x for x in r.stdout.splitlines() if x.startswith("TWS_RESULT:")]
    assert line, r.stdout[-2000:]
    got_tws = [tuple(x) for x in json.loads(line[0][len("TWS_RESULT:"):])]

    # fallback branch, in-session (no protobuf here — the default path)
    stream = (
        spark.readStream.schema("user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_path}/src")
    )
    df = S._profile_apply_in_pandas(stream, "user_id", "event_type", "bigint")
    name = f"twsfb_{uuid.uuid4().hex[:6]}"
    with state_partitions(spark, 4):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", f"{tmp_path}/ckpt_fb")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    got_fb = sorted(
        (r["user_id"], r["n_events"], r["n_types"])
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("n_types").alias("n_types"))
        .collect()
    )
    assert got_tws == got_fb, "TWS and fallback branches disagree"

    # and both match the batch truth
    src = spark.read.parquet(f"{tmp_path}/src")
    batch = sorted(
        (r["user_id"], r["n_events"], r["n_types"])
        for r in src.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .collect()
    )
    assert got_fb == batch
