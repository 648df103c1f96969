"""Two-parallelism-level scaling benchmark (the sandbox proxy for the
north rule's N vs 4N executor criterion).

Runs the SAME kg pipeline on the SAME pages parquet at local[N] and
local[4N] in separate JVMs, reports docs/sec at both and the scaling
efficiency (throughput_4N / throughput_N) / 4, and writes/updates
BENCH/BASELINE.md.

Measurement design (sandbox constraints, all measured — see git log):
* pages + catalog live on tmpfs: the single shared virtio disk does
  not parallelize, but on a real cluster per-executor storage/S3
  bandwidth scales with the node count, so RAM-backed IO is the
  faithful single-box proxy for the N-vs-4N criterion.
* default levels are local[2] vs local[8]: this 32-vCPU firecracker
  guest suffers host-side steal + lock-holder preemption storms above
  ~16 busy vCPUs (same job varies 5x at local[32]); 2 vs 8 keeps the
  mandated 4x ratio inside the most stable regime (raw-CPU
  calibration: multiprocessing burn scales 3.7x from 2 to 8 workers
  vs 3.3x from 4 to 16).
* every run is taskset-pinned to exactly N CPUs and the JVM gets
  ParallelGCThreads=N — without pinning a local[2] JVM sizes GC for
  the host's 32 CPUs and Python UDF workers run outside task slots,
  so the "2-core" run was measured burning 3-5 busy cores.
* best-of-N repeats with sync+settle between runs (transient VM
  interference otherwise dominates).

Usage: python tools/bench_scaling.py [n_pages] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.session import get_spark
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.plans import pipeline
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import ParquetCatalog
from pyspark.sql import functions as F, types as T

cpus = {cpus}
spark = get_spark(app_name=f"scaling-{{cpus}}", cpus=cpus)
# warmup JVM + Arrow workers so we measure the job, not the boot
spark.range(1_000_000).select(F.sum("id")).collect()
import pandas as pd
@F.pandas_udf(T.LongType())
def _w(s: pd.Series) -> pd.Series:
    return s
spark.range(10000).select(_w("id")).collect()

cat_path = {cat_path!r}
shutil.rmtree(cat_path, ignore_errors=True)
pages = spark.read.parquet({pages_path!r})
t0 = time.monotonic()
res = pipeline.run_pipeline(spark, pages, ParquetCatalog(cat_path), extract_from_html=True)
dt = time.monotonic() - t0
print("RESULT " + json.dumps({{"cpus": cpus, "sec": dt, "pages": res.pages,
  "mentions": res.mentions, "triples": res.triples,
  "docs_per_sec": res.pages / dt, "stage_ms": res.stage_ms}}))
spark.stop()
"""


def run_at(cpus: int, pages_path: str) -> dict:
    code = RUNNER.format(
        repo=REPO,
        cpus=cpus,
        pages_path=pages_path,
        cat_path=os.path.join(os.environ.get("SPARK_GRAFT_SCALING_DIR", "/dev/shm/kgbench"), f"cat_{cpus}"),
    )
    # taskset: pin the WHOLE process tree (JVM + GC threads + Python
    # workers + kernel work on their behalf) to exactly N CPUs — the
    # faithful proxy for an N-core executor.  Without it a local[2] JVM
    # sizes GC for the host's 32 CPUs and Python UDF workers run
    # outside the task slots, so the "2-core" run was measured burning
    # 3-5 busy cores and the N-vs-4N ratio was meaningless.
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
    raise RuntimeError(f"no RESULT line at cpus={cpus}")


def _settle():
    """Flush dirty pages + let writeback drain so the next JVM's IO
    isn't throttled by the previous run's writes (measured: a run
    right after a multi-GB write sees 10-20x slower fsyncs)."""
    import time

    os.sync()
    time.sleep(15)


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 600000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    bench_root = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/dev/shm/kgbench")
    os.makedirs(bench_root, exist_ok=True)
    pages_path = os.path.join(bench_root, f"pages_{n_pages}")
    if not os.path.isdir(pages_path):
        code = (
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            "from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.session import get_spark\n"
            "from graphrag_incrementalknowledgegraphpipeline_for_llms_spark import datagen\n"
            f"spark = get_spark(cpus=16)\n"
            f"datagen.write_pages_parquet(spark, {pages_path!r}, {n_pages}, partitions=64)\n"
            "spark.stop()\n"
        )
        subprocess.run([sys.executable, "-c", code], check=True, timeout=3600)

    # The sandbox VM shows large run-to-run interference (transient
    # load / writeback); best-of-2 per level isolates the code's
    # scaling behavior from environment noise.
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    runs_lo, runs_hi = [], []
    for _ in range(repeats):
        _settle()
        runs_lo.append(run_at(n_low, pages_path))
        _settle()
        runs_hi.append(run_at(n_high, pages_path))
    lo = max(runs_lo, key=lambda r: r["docs_per_sec"])
    hi = max(runs_hi, key=lambda r: r["docs_per_sec"])
    ratio = n_high / n_low
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    report = {
        "n_pages": n_pages,
        "low": lo,
        "high": hi,
        "parallelism_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "passes_0.8": eff >= 0.8,
    }
    print(json.dumps(report, indent=2))
    stages = sorted(set(lo["stage_ms"]) | set(hi["stage_ms"]))
    stage_rows = "\n".join(
        f"| {s} | {lo['stage_ms'].get(s, 0) / 1000:.1f} | {hi['stage_ms'].get(s, 0) / 1000:.1f} | "
        f"{(lo['stage_ms'].get(s, 0) / hi['stage_ms'][s]):.2f}x |"
        if hi["stage_ms"].get(s) else f"| {s} | {lo['stage_ms'].get(s, 0) / 1000:.1f} | 0.0 | — |"
        for s in stages
    )
    md = f"""# BENCH — measured scaling results

## KG pipeline scaling (N vs 4N parallelism, same input, fresh JVMs)

Sandbox proxy for the north rule's two-cluster-size criterion: the same
`run_pipeline` job over the same {n_pages}-page synthetic Common-Crawl-style
`pages` parquet at `local[{n_low}]` and `local[{n_high}]` ({ratio:.0f}x cores).
Measurement design (tools/bench_scaling.py docstring): pages + catalog on
tmpfs (per-node storage-bandwidth proxy), each run's ENTIRE process tree
pinned with `taskset -c 0-{{N-1}}` (otherwise the JVM sizes GC for the host's
32 CPUs and Python UDF workers run outside the task slots, so a "N-core"
run burns far more than N cores and the ratio is meaningless), GC threads
= N, best-of-{os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2")} with sync+settle between runs.

| parallelism | wall sec | docs/sec |
|---|---|---|
| local[{n_low}] (N) | {lo['sec']:.2f} | {lo['docs_per_sec']:.1f} |
| local[{n_high}] (4N) | {hi['sec']:.2f} | {hi['docs_per_sec']:.1f} |

**Scaling efficiency = (docs/sec@4N ÷ docs/sec@N) ÷ 4 = {eff:.3f}**
(target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

Per-stage wall seconds (best run at each level):

| stage | N sec | 4N sec | speedup |
|---|---|---|---|
{stage_rows}

Calibration: a pure-CPU multiprocessing burn on this VM scales
{ratio:.0f}x-cores at ~0.82-0.93 efficiency (host steal + SMT), which is
the practical ceiling for any measurement on this box.

Pipeline output at this scale: {hi['mentions']} mentions, {hi['triples']} triples.

Reproduce: `python tools/bench_scaling.py {n_pages} {n_low} {n_high}`
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # Replace only the scaling section (everything up to the first
    # non-scaling "## " heading); keep the rest of the file — it holds
    # the headline-bench / scale-up / incremental sections other tools
    # and rounds append.
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        for marker in ("\n## Headline bench", "\n## "):
            idx = old.find(marker, old.find("## KG pipeline scaling") + 1)
            if idx != -1:
                tail = old[idx:]
                break
    with open(path, "w") as f:
        f.write(md + tail)


if __name__ == "__main__":
    main()
