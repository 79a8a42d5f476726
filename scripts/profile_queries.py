#!/usr/bin/env python
"""Round-7 measurement harness (guide §1: measure first).

Times every bench query exactly the way bench.py does (fn() + noop sink,
shared session, same confs), but additionally records per-rep seconds,
the Spark job count per rep (setJobGroup + statusTracker), and dumps
`.explain("formatted")` for each query to plans/r07/<name>_<tag>.txt.

Usage:  python scripts/profile_queries.py [tag] [query ...]
        tag defaults to "before"; with no query names, all BENCH_QUERIES.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, build_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("NEWSCRAWL_BENCH_REPS", "2"))
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r07",
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = build_spark(cpus)
    sc = spark.sparkContext
    from newscrawl.queries import QUERIES

    out = {}
    for name in names:
        fn, _sql = QUERIES[name]
        rep_secs, rep_jobs = [], []
        df = None
        for r in range(reps):
            group = f"{name}#{r}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            rep_secs.append(round(time.perf_counter() - t0, 3))
            rep_jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
        sc.setJobGroup("plans", "plans")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        out[name] = {"secs": rep_secs, "jobs": rep_jobs}
        print(
            json.dumps({"q": name, "secs": rep_secs, "jobs": rep_jobs}),
            flush=True,
        )
    with open(os.path.join(plans_dir, f"_profile_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
