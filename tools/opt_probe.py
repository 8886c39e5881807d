"""Per-query optimization probe (r10): warm time, Spark JOB count, plan shape.

For each requested query (default: bench.HEADLINE) this measures, in one
local[$SPARK_GRAFT_CPUS] session at $SPARK_GRAFT_SF_DIR:

- warm noop-sink seconds (min of 2 post-compilation runs, +1 adaptive);
- the number of Spark jobs one warm run launches (job-group counting —
  on this box a trivial job costs ~0.17-0.3s of pure scheduling, so job
  count bounds warm time below: the first thing to shrink);
- plan-shape counters from ``explain("formatted")``: parquet scans,
  Exchange nodes, SortMergeJoin/BroadcastHashJoin, Python eval nodes;
- optionally the full formatted plan, written to --plans=<dir>/<q>_<tag>.txt.

Usage:
  python tools/opt_probe.py [--plans=DIR] [--tag=before] [query ...]

Writes one JSON line per query to stdout and a summary at the end.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def plan_counters(plan: str) -> dict:
    return {
        "scans": len(re.findall(r"Scan parquet", plan)),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "pyeval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas", plan)
        ),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
    }


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    tag = "before"
    names = []
    for a in args:
        if a.startswith("--plans="):
            plans_dir = Path(a.split("=", 1)[1])
        elif a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        else:
            names.append(a)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from eurovision_spark import get_spark
    from eurovision_spark.catalog import registry

    if not names:
        names = list(HEADLINE)
    spark = get_spark("opt_probe")
    sc = spark.sparkContext
    specs = registry()
    if plans_dir:
        plans_dir.mkdir(parents=True, exist_ok=True)

    # floor: what a trivial job costs on this box right now
    floor_runs = []
    for _ in range(5):
        t0 = time.time()
        sc.parallelize([0], 1).count()
        floor_runs.append(time.time() - t0)
    floor = round(min(floor_runs), 3)
    print(json.dumps({"floor_sec": floor}), flush=True)

    rows = []
    for name in names:
        fn = specs[name].fn
        try:
            df = fn(spark, sf_dir)
            plan = plan_text(df)
            if plans_dir:
                (plans_dir / f"{name}_{tag}.txt").write_text(plan + "\n", "utf8")
            # cold (also pays any per-query sample collects / codegen)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold = round(time.time() - t0, 3)
            runs = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            if max(runs) > 1.3 * min(runs):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            warm = round(min(runs), 3)
            # job count of one full warm run (build + execute)
            gid = f"probe-{name}"
            sc.setJobGroup(gid, name)
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            finally:
                sc.setLocalProperty("spark.jobGroup.id", None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(gid))
            row = {
                "q": name,
                "warm": warm,
                "cold": cold,
                "jobs": jobs,
                "bound": round(jobs * floor, 2),
                **plan_counters(plan),
            }
        except Exception as exc:  # noqa: BLE001
            row = {"q": name, "err": f"{type(exc).__name__}: {exc}"[:300]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in rows if "warm" in r]
    ok.sort(key=lambda r: -r["warm"])
    print(
        json.dumps(
            {
                "total_warm": round(sum(r["warm"] for r in ok), 2),
                "total_jobs": sum(r["jobs"] for r in ok),
                "top10": [(r["q"], r["warm"], r["jobs"]) for r in ok[:10]],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
