#!/usr/bin/env python
"""Job-level profiler for one registry cell (r17-opt diagnostics).

Runs a named QUERIES cell once on a UI-enabled session, then dumps
every Spark job (duration, stage count, task count, description) from
the UI REST API, sorted by submission order, plus a per-description
rollup. For orchestration-bound cells (self_cores << cores) this shows
where the wall time goes: many tiny sequential jobs vs a few big ones,
and the gaps between jobs (driver-side work) fall out of the
submission-time deltas.

Usage: python tools/probe_jobs.py <cell> [<cell> ...]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    cells = sys.argv[1:]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_UI"] = "true"
    from last_minute_legends_spark.session import get_spark

    spark = get_spark("probe_jobs")

    from last_minute_legends_spark.plans.queries import QUERIES

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs() -> list[dict]:
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
                ) as r:
            return json.loads(r.read())

    # warmup (bench does the same before timing)
    spark.range(1000).selectExpr("md5(string(id)) h").groupBy(
        "h").count().write.format("noop").mode("overwrite").save()

    report: dict[str, dict] = {}
    for cell in cells:
        before_ids = {j["jobId"] for j in jobs()}
        t0 = time.time()
        df = QUERIES[cell](spark, SF_DIR)
        t_compose = time.time() - t0
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        js = [j for j in jobs() if j["jobId"] not in before_ids]
        js.sort(key=lambda j: j["submissionTime"])
        rows = []
        fmt = "%Y-%m-%dT%H:%M:%S.%f"
        from datetime import datetime

        def ts(s):
            return datetime.strptime(s[:-3], fmt).timestamp()

        prev_end = None
        for j in js:
            sub = ts(j["submissionTime"])
            end = ts(j["completionTime"]) if "completionTime" in j else sub
            gap = (sub - prev_end) if prev_end is not None else 0.0
            prev_end = end
            rows.append({
                "id": j["jobId"],
                "dur": round(end - sub, 3),
                "gap_before": round(gap, 3),
                "tasks": j.get("numTasks"),
                "desc": (j.get("description") or j.get("name", "")
                         or "")[:110],
                "stream": bool((j.get("description") or "").startswith("\nid")),
            })
        agg: dict[str, list[float]] = {}
        for r in rows:
            key = r["desc"][:70]
            agg.setdefault(key, [0.0, 0])
            agg[key][0] += r["dur"] + r["gap_before"]
            agg[key][1] += 1
        report[cell] = {
            "wall": round(wall, 3),
            "compose_sec": round(t_compose, 3),
            "n_jobs": len(rows),
            "sum_job_dur": round(sum(r["dur"] for r in rows), 3),
            "sum_gaps": round(sum(r["gap_before"] for r in rows), 3),
            "jobs": rows,
            "by_desc": sorted(
                ([round(v[0], 3), v[1], k] for k, v in agg.items()),
                reverse=True),
        }
        spark.catalog.clearCache()

    out_dir = os.path.join(REPO, "plans",
                           os.environ.get("SPARK_GRAFT_PLANS_DIR", "r18"))
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "probe_jobs.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    for cell, r in report.items():
        print(f"== {cell}: wall={r['wall']} compose={r['compose_sec']} "
              f"jobs={r['n_jobs']} sum_dur={r['sum_job_dur']} "
              f"gaps={r['sum_gaps']}")
        for d in r["by_desc"][:12]:
            print("   ", d)
    spark.stop()


if __name__ == "__main__":
    main()
