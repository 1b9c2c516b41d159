"""Data-quality audit end-to-end: key integrity, value contracts,
multivariate outliers and distribution drift over the TPC-H-ish testdata —
the ops/audit.py family composed the way a load-gate job runs it.

Run:  python examples/data_quality.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_processes_spark.ops.audit import (
    accepted_values_violations,
    distribution_drift,
    fk_violations,
    mahalanobis_outliers,
    pk_violations,
    schema_drift,
)
from etl_processes_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example-data-quality")
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # 1. key integrity
    print("PK violations (o_orderkey):", pk_violations(orders, ["o_orderkey"]).count())
    print(
        "FK orphans (lineitem -> orders):",
        fk_violations(lineitem, orders, {"l_orderkey": "o_orderkey"}).count(),
    )

    # 2. value contract
    bad_status = accepted_values_violations(orders, "o_orderstatus", ["O", "F", "P"])
    print("o_orderstatus outside contract:", bad_status.count())

    # 3. jointly-implausible rows: price vs quantity vs discount
    scored = mahalanobis_outliers(
        lineitem, ["l_extendedprice", "l_quantity", "l_discount"], threshold=16.27
    )
    n_out = scored.filter("outlier = 1").count()
    print(f"multivariate outliers past chi2(3) 99%: {n_out} of {lineitem.count()}")
    print("most jointly-implausible rows:")
    scored.select(
        "l_orderkey", "l_extendedprice", "l_quantity", "l_discount",
        F.round("maha_sq", 2).alias("maha_sq"),
    ).orderBy(F.desc("maha_sq")).show(5)

    # 4. distribution drift: this month's orders vs history
    cut = orders.agg(F.expr("percentile(o_totalprice, 0.5)")).first()[0]
    hist = orders.filter(F.col("o_orderkey") % 2 == 0)
    recent = orders.filter(F.col("o_orderkey") % 2 == 1)
    psi_same, _ = distribution_drift(hist, recent, "o_totalprice")
    skewed = recent.withColumn("o_totalprice", F.col("o_totalprice") * 1.4)
    psi_shift, _ = distribution_drift(hist, skewed, "o_totalprice")
    print(f"PSI split-half (should be stable): {psi_same}")
    print(f"PSI after +40% price shift (should alarm): {psi_shift}")

    # 5. schema drift vs an evolved snapshot
    evolved = orders.drop("o_comment").withColumn("o_channel", F.lit("web"))
    for d in schema_drift(orders, evolved):
        print("schema drift:", d)


if __name__ == "__main__":
    main()
