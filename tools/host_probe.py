"""Host-speed microbenchmark — the cross-round normalizer the bench
comparisons have been missing. Round 9's bench was contaminated by a
concurrent Spark session; round 10's bench ran strictly serialized on an
idle host and STILL read ~1.3x of round 8 (median per-query best ratio,
p10 = 1.03, write-heavy ops ~2x) — the sandbox had been restored/rebooted
minutes earlier, so the question "did the code regress or did the host
change?" has no committed answer. This probe records what the HOST can
do, independent of Spark or the engine: single-thread CPU, all-core CPU,
sequential write throughput, fsync latency (the commit path's floor:
every manifest CAS is write+rename), and a pyarrow parquet scan.

Run it inside the serialized heavy chain, next to the bench it
normalizes:

    python tools/host_probe.py > HOST_PROBE_r{N}.json

Future-round ratios: if BENCH_ALL inflates while cpu_st/cpu_mt hold and
fsync/write degrade, the bench moved because the host's storage did —
attribute, don't regression-hunt."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def _cpu_single(n: int = 6_000_000) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + i) & 0xFFFFFFFF
    return time.perf_counter() - t0


def _cpu_numpy(size: int = 2048, reps: int = 6) -> float:
    import numpy as np

    a = np.random.default_rng(0).random((size, size))
    b = np.random.default_rng(1).random((size, size))
    t0 = time.perf_counter()
    for _ in range(reps):
        (a @ b).sum()
    return time.perf_counter() - t0


def _cpu_all_cores(workers: int) -> float:
    # processes, not threads: pure-python work under the GIL would just
    # re-measure single-thread throughput
    from concurrent.futures import ProcessPoolExecutor

    t0 = time.perf_counter()
    with ProcessPoolExecutor(max_workers=workers) as ex:
        list(ex.map(_cpu_single, [1_500_000] * (workers * 2)))
    return time.perf_counter() - t0


def _disk_seq_write(mb: int = 512) -> float:
    buf = os.urandom(1 << 20)
    with tempfile.NamedTemporaryFile(dir="/tmp", delete=True) as f:
        t0 = time.perf_counter()
        for _ in range(mb):
            f.write(buf)
        f.flush()
        os.fsync(f.fileno())
        return mb / (time.perf_counter() - t0)  # MB/s


def _fsync_latency(n: int = 200) -> float:
    """Mean ms per write-small+fsync+rename — the manifest-commit floor."""
    d = tempfile.mkdtemp(dir="/tmp")
    t0 = time.perf_counter()
    for i in range(n):
        p = os.path.join(d, f"c{i}.tmp")
        with open(p, "wb") as f:
            f.write(b"x" * 256)
            f.flush()
            os.fsync(f.fileno())
        os.rename(p, os.path.join(d, f"c{i}.json"))
    wall = time.perf_counter() - t0
    for fn in os.listdir(d):
        os.unlink(os.path.join(d, fn))
    os.rmdir(d)
    return wall / n * 1000.0


def _parquet_scan() -> float | None:
    """Wall seconds to scan the sf0.1 lineitem with pyarrow (no Spark)."""
    path = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ) + "/lineitem.parquet"
    if not os.path.exists(path):
        return None
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    pq.read_table(path)
    return time.perf_counter() - t0


def main() -> None:
    workers = os.cpu_count() or 1
    scan = _parquet_scan()
    out = {
        "metric": "host_probe",
        "nproc": workers,
        "cpu_single_s": round(min(_cpu_single() for _ in range(3)), 3),
        "cpu_numpy_matmul_s": round(_cpu_numpy(), 3),
        "cpu_all_cores_s": round(_cpu_all_cores(workers), 3),
        "disk_seq_write_mb_s": round(_disk_seq_write(), 1),
        "fsync_rename_ms": round(_fsync_latency(), 3),
        "parquet_scan_lineitem_s": round(scan, 3) if scan is not None else None,
        "loadavg_before": open("/proc/loadavg").read().split()[:3],
        "uptime_s": round(float(open("/proc/uptime").read().split()[0]), 0),
    }
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
