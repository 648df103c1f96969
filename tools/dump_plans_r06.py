"""Dump .explain("formatted") for a list of declared queries into
plans/r06/<name>_<tag>.txt — the optimization round's before/after
plan evidence.  Unlike bench_extra.py this does NOT time anything
(eager loop operators still execute during DataFrame construction).

Usage: python tools/dump_plans_r06.py <tag> <out_dir> <query> [...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    tag, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    import __spark_entry__ as entry
    from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{tag}", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    qs = entry.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print("dumped", name, flush=True)
        except Exception as exc:  # keep going; report at the end
            print(f"!! {name}: {exc}", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
