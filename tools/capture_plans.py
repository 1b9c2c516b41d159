"""Capture .explain("formatted") for bench lines / declared queries.

Usage: python tools/capture_plans.py OUTDIR SUFFIX [only1,only2,...]

Writes OUTDIR/<line>_<SUFFIX>.txt for every bench line (default) or the
named subset. The plan is the physical plan of the DataFrame the query
callable returns — the same frame bench.py times through the noop sink.
Queries that execute driver-side selection jobs at construction time
(text_profile_stats' histogram passes, the ingest state build) still
return a final DataFrame; its plan is what lands here, and construction
cost is noted by bench.py's timing methodology (SCALING.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(outdir, exist_ok=True)

    from etl_processes_spark.session import get_spark

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from bench import DIAGNOSTIC_ALIASES

    qs = {**entrymod.queries(), **entrymod.bench_components()}
    prepare = {}
    try:
        prepare = entrymod.bench_prepare()
    except Exception:
        pass

    names = list(qs) + [k for k in DIAGNOSTIC_ALIASES if DIAGNOSTIC_ALIASES[k] in qs]
    for name in sorted(set(names)):
        if only and name not in only:
            continue
        cname = DIAGNOSTIC_ALIASES.get(name, name)
        if cname not in qs:
            continue
        try:
            if cname in prepare:
                prepare[cname](spark, SF_DIR)
            df = qs[cname](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # a failing line must not void the others
            plan = f"ERROR capturing plan: {type(e).__name__}: {e}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    try:
        entrymod.release_ingest_state()
    except Exception:
        pass


if __name__ == "__main__":
    main()
