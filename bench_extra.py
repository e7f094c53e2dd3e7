#!/usr/bin/env python
"""Extra measurement harness for the optimization round (guide §1).

Times individual declared queries with bench.py's exact methodology
(same session config, warm-up + N timed runs, median) at an arbitrary
SF dir / core count, and captures .explain("formatted") plans.

Usage:
  python bench_extra.py time q1 q2 ...       # time named queries
  python bench_extra.py time-all             # time every bench QUERY_NAMES
  python bench_extra.py plan OUTDIR q1 ...   # write explain(formatted)
  python bench_extra.py noop q1 ...          # time with noop sink (guide §1.4)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 here — the driver's
measurement SF), SPARK_GRAFT_CPUS (default 32), BENCH_QUERY_ROUNDS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import bench  # noqa: E402  (reuses make_session; bench reads env at import)

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return (s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2)


def time_queries(spark, names, sink="count"):
    from pyspark.sql import functions as F  # noqa: F401

    from pg_walstream_spark.queries import QUERIES

    q_rounds = int(os.environ.get("BENCH_QUERY_ROUNDS", "3"))
    out = {}
    for name in names:
        fn, _ = QUERIES[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        if sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        warm = round(time.monotonic() - t0, 3)
        runs = []
        for i in range(q_rounds):
            spark.sparkContext.setJobDescription(f"{name}:{i}")
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.monotonic() - t0, 3))
        out[name] = {"median": round(_median(runs), 3), "runs": runs,
                     "warm": warm}
        print(json.dumps({name: out[name]}), flush=True)
    return out


def dump_plans(spark, outdir, names, suffix):
    from pg_walstream_spark.queries import QUERIES

    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn, _ = QUERIES[name]
        df = fn(spark, SF_DIR)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(p)
        print(f"wrote {outdir}/{name}_{suffix}.txt", flush=True)


def main():
    cmd = sys.argv[1]
    spark = bench.make_session(bench.CPUS, "bench-extra")
    try:
        if cmd == "time":
            time_queries(spark, sys.argv[2:])
        elif cmd == "noop":
            time_queries(spark, sys.argv[2:], sink="noop")
        elif cmd == "time-all":
            time_queries(spark, bench.QUERY_NAMES)
        elif cmd == "plan":
            outdir, suffix = sys.argv[2], sys.argv[3]
            dump_plans(spark, outdir, sys.argv[4:], suffix)
        else:
            raise SystemExit(f"unknown cmd {cmd}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
