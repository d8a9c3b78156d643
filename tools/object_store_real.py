"""Run the S3 conditional-PUT CAS contract suite against a REAL
out-of-process S3-compatible HTTP endpoint (round-9 verdict "What's
missing #3": both CAS backends were only ever proven against
in-process stubs).

The endpoint here is ``moto_server`` — an independent third-party S3
implementation served over real TCP by a separate process — reached
through :class:`~parquetranger_spark.sources.fs.S3CondFS` with SigV4
signing ON (real endpoints refuse unsigned requests at the auth layer
with 403 BEFORE evaluating If-None-Match, which is why the shim grew
signing). The same suite also runs once against the in-process stub
for the side-by-side record. Results land in OBJECT_STORE_r{N}.json.

Usage: python tools/object_store_real.py <round>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 5077


def run_pytest(env_extra: dict, label: str) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    t0 = time.monotonic()
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_s3_cas_contract.py", "-q"],
        capture_output=True,
        text=True,
        cwd=ROOT,
        env=env,
        timeout=900,
    )
    tail = [ln for ln in p.stdout.splitlines() if ln.strip()][-3:]
    return {
        "label": label,
        "rc": p.returncode,
        "wall_s": round(time.monotonic() - t0, 1),
        "tail": tail,
    }


def main(rnd: int) -> None:
    results = {"round": rnd, "endpoint": "moto_server (independent S3 impl, real TCP)"}
    # 1) stub run (the default path — regression baseline)
    results["stub_run"] = run_pytest({}, "in-process S3Stub, unsigned")

    # 2) real endpoint: moto_server in its own process
    moto = subprocess.Popen(
        ["moto_server", "-p", str(PORT)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        time.sleep(3)
        import boto3

        boto3.client(
            "s3",
            endpoint_url=f"http://127.0.0.1:{PORT}",
            aws_access_key_id="pqrs-test",
            aws_secret_access_key="pqrs-secret",
            region_name="us-east-1",
        ).create_bucket(Bucket="bucket")
        results["real_endpoint_run"] = run_pytest(
            {
                "PQRS_S3_ENDPOINT": f"http://127.0.0.1:{PORT}",
                "AWS_ACCESS_KEY_ID": "pqrs-test",
                "AWS_SECRET_ACCESS_KEY": "pqrs-secret",
                "PQRS_S3_REGION": "us-east-1",
            },
            "moto_server over TCP, SigV4-signed",
        )
    finally:
        moto.kill()
        moto.wait()
    results["all_green"] = (
        results["stub_run"]["rc"] == 0 and results["real_endpoint_run"]["rc"] == 0
    )
    out = os.path.join(ROOT, f"OBJECT_STORE_r{rnd:02d}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
