"""Round-12 experiment (round-11 verdict ask #6): does skipping md5 on the
corpus gram stream (join on raw shingle strings against the broadcast eval
set, ``key="string"``) beat the default 60-bit md5 residue keys? Same
keep-or-revert rule as the tf-idf Arrow experiment: land a default change
only with a same-session win.

Usage: python tools/exp_decontaminate_key.py [SF_DIR]   (default testdata_sf10)
Interleaves hash/string repeats (A B A B) so host drift hits both arms.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_processes_spark.session import get_spark
from etl_processes_spark.ops.decontaminate import contamination_report

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf10"


def main() -> None:
    spark = get_spark("exp-decontaminate-key")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    ev = d.filter(F.col("doc_id") % 10 == 0)
    # warm-up: one untimed pass so JIT/IO cache hits both arms equally
    contamination_report(corpus, ev, "doc_id", "text", k=3).count()
    results: dict[str, list[float]] = {"hash": [], "string": []}
    for _rep in range(2):
        for key in ("hash", "string"):
            t0 = time.monotonic()
            n = contamination_report(
                corpus, ev, "doc_id", "text", k=3, key=key
            ).count()
            dt = time.monotonic() - t0
            results[key].append(round(dt, 2))
            print(f"key={key}: {dt:.2f}s ({n} rows)", flush=True)
    print("RESULT", results, flush=True)


if __name__ == "__main__":
    main()
