"""The reference lifecycle end-to-end: profile a table, synthesize a
statistics-preserving twin, validate the twin against the profile.

Run:  python examples/profile_generate_validate.py [parquet_path] [n_rows]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_processes_spark import generate, profile, validate
from etl_processes_spark.session import get_spark


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/orders.parquet"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    spark = get_spark("example-profile-generate")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.read.parquet(src)
    profs = profile(df)
    print("inferred types:", {c: p.logical_type for c, p in profs.items()})

    synth = generate(spark, profs, n, seed=7)
    synth.show(5, truncate=40)

    report = validate(profs, synth)
    for col, metrics in report.items():
        print(col, metrics)


if __name__ == "__main__":
    main()
