"""Per-query measurement harness for optimization work (guide §1).

``bench.py`` is frozen for the driver's measurement; this file is the
iteration loop: time an arbitrary subset of declared queries with the
SAME methodology (best-of-N ``df.count()`` on the bench session), and
optionally dump ``.explain("formatted")`` to plans/r06/.

Usage:
    python bench_extra.py q1 q2 ...            # time those queries
    python bench_extra.py --plans q1 q2 ...    # also write plans/r06/<q>_<tag>.txt
    python bench_extra.py --tag after --plans q1
    python bench_extra.py --all                # every query bench.py times
    python bench_extra.py --noop q1            # time with noop sink instead of count

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    args = [a for a in sys.argv[1:]]
    dump_plans = "--plans" in args
    use_noop = "--noop" in args
    run_all = "--all" in args
    tag = "before"
    if "--tag" in args:
        tag = args[args.index("--tag") + 1]
        args.remove("--tag")
        args.remove(tag)
    names = [a for a in args if not a.startswith("--")]

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    import __spark_entry__ as entry
    from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.session import get_spark

    spark = get_spark(app_name="kg-bench-extra", cpus=CPUS)
    # same warmup as bench.py
    spark.range(1_000_000).select(F.sum("id")).collect()

    @F.pandas_udf(T.LongType())
    def _warm(s):
        return s

    spark.range(1000).select(_warm("id")).collect()

    qs = entry.queries()
    if run_all:
        names = [n for n in qs]

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings = {}
    plans_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best, n = None, None
        best_build = None
        for _ in range(repeats):
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            t1 = time.monotonic()
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
            bd = t1 - t0
            best_build = bd if best_build is None else min(best_build, bd)
        timings[name] = round(best, 3)
        print(
            f"{name}: {best:.3f}s (build {best_build:.3f}s) rows={n}",
            flush=True,
        )
        if dump_plans:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"timings": timings, "sf": SF_DIR, "repeats": repeats}))
    spark.stop()


if __name__ == "__main__":
    main()
