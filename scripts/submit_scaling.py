#!/usr/bin/env python
"""The north rule's literal protocol: package the library, run the
extraction job via ``spark-submit --py-files`` at N and 4N parallelism
on the same input, report docs/sec at both and the scaling efficiency.

  python scripts/submit_scaling.py [--cores-hi 8] [--sf 1.6]

Each cluster size runs in its own spark-submit process (fresh JVM);
rounds interleave and each side keeps its best run (shared-host noise).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import json, sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

path, runs = sys.argv[1], int(sys.argv[2])
spark = SparkSession.builder.getOrCreate()
# --py-files ships the package zip; import resolves from it
from deepseek_ocr_omnidocbench_spark.operators.html_extract import extract_pages

n = spark.sparkContext.defaultParallelism
pages = spark.read.parquet(path)

def one_run():
    t0 = time.time()
    out = extract_pages(pages, salt_buckets=n)
    row = out.agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars")).collect()[0]
    return time.time() - t0, int(row["n"])

one_run()  # warm JIT + python workers
best = min((one_run() for _ in range(runs)), key=lambda r: r[0])
print("RESULT " + json.dumps({"cores": n, "sec": best[0], "docs": best[1]}))
spark.stop()
"""


def build_zip() -> str:
    zpath = os.path.join(tempfile.mkdtemp(), "docbench_spark.zip")
    pkg = os.path.join(REPO, "deepseek_ocr_omnidocbench_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def submit(cores: int, zpath: str, data: str, runs: int) -> dict:
    job = os.path.join(tempfile.mkdtemp(), "job.py")
    with open(job, "w") as f:
        f.write(JOB)
    out = subprocess.run(
        ["spark-submit", "--master", f"local[{cores}]",
         "--conf", "spark.ui.enabled=false",
         "--conf", f"spark.sql.shuffle.partitions={cores}",
         "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
         "--py-files", zpath, job, data, str(runs)],
        capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError("no RESULT line:\n" + out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores-hi", type=int, default=8)
    ap.add_argument("--sf", type=float, default=1.6)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from deepseek_ocr_omnidocbench_spark.sources.pages import pages_path_for_sf

    data = pages_path_for_sf(args.sf)
    zpath = build_zip()
    lo = max(1, args.cores_hi // 4)
    best: dict[int, dict] = {}
    for _ in range(args.rounds):
        for cores in (lo, args.cores_hi):
            r = submit(cores, zpath, data, args.runs)
            if cores not in best or r["sec"] < best[cores]["sec"]:
                best[cores] = r
    tlo = best[lo]["docs"] / best[lo]["sec"]
    thi = best[args.cores_hi]["docs"] / best[args.cores_hi]["sec"]
    eff = (thi / tlo) / (args.cores_hi / lo)
    print(json.dumps({
        "metric": "spark_submit_scaling_efficiency", "value": round(eff, 3),
        "unit": "ratio", "cores_lo": lo, "cores_hi": args.cores_hi,
        "docs_per_sec_lo": round(tlo, 2), "docs_per_sec_hi": round(thi, 2),
        "py_files": os.path.basename(zpath), "sf": args.sf,
    }))


if __name__ == "__main__":
    main()
