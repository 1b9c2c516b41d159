"""Continuous corpus ingestion: a parquet file stream drained through the
append-mode ingest (exact + near-dup dedup against persisted state tables).

Run:  python examples/continuous_ingest.py [src_dir] [work_dir]
Drop more parquet files into src_dir and re-run: only new files process,
and their docs dedup against everything already ingested.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_processes_spark.session import get_spark
from etl_processes_spark.streaming.ingest import incremental_ingest_stream


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ingest_example/src"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ingest_example/work"

    spark = get_spark("example-continuous-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(src):  # seed a demo source from the testdata
        import glob
        import shutil

        os.makedirs(src)
        tmp = work + "_seed"
        (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
             .select("doc_id", "text").coalesce(1).write.parquet(tmp))
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], src + "/batch0.parquet")

    q = incremental_ingest_stream(
        spark,
        source_path=src,
        out_dir=f"{work}/corpus",
        state_dir=f"{work}/state",
        checkpoint_dir=f"{work}/ckpt",
        line_dedup_max_df=None,
        shingle_k=3,
    )
    q.awaitTermination()
    print("accepted so far:", spark.read.parquet(f"{work}/corpus").count())


if __name__ == "__main__":
    main()
