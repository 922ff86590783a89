"""Skew evidence — measure the salted two-phase path against the naive
single-shuffle aggregation on a pathologically hot key.

The north rule calls for "salted repartitioning to defuse
hot-conversation skew"; this records the measurement, not just the
mechanism: a corpus where ONE conversation holds half of all turns,
aggregated per conversation with a reassociable metric (sum of
latency), naive groupBy vs two_phase_agg.

Writes SKEW.json and prints a summary line.
Usage: python skew_bench.py [n_rows]  (default 2_400_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from pyspark.sql import functions as F

    from vector_spark.plans.skew import partition_histogram, two_phase_agg
    from vector_spark.session import get_spark

    spark = get_spark("skew_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 4)

    # half the rows in conversation 0, the rest uniform over 10k convs
    df = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(10_000)))
            .alias("conv"),
            F.col("id").alias("turn_idx"),
            (F.pmod(F.col("id") * 1103515245, F.lit(3000))).alias("latency"),
        )
        .persist()
    )
    df.count()  # materialize outside timings

    def run(fn) -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    def naive() -> None:
        # groupBy alone is already partial-aggregated by Spark; the
        # skew case that actually hurts is a per-key WINDOW/sort — the
        # shape reduce's ordered concat uses
        w_df = df.repartition(cpus * 4, "conv")
        (
            w_df.groupBy("conv")
            .agg(F.sum("latency").alias("s"),
                 F.count(F.lit(1)).alias("n"),
                 F.array_sort(F.collect_list("latency")).alias("ordered"))
            .agg(F.sum("n"))
            .collect()
        )

    def salted() -> None:
        partial = two_phase_agg(
            df,
            ["conv"],
            [F.sum("latency").alias("s"), F.count(F.lit(1)).alias("n"),
             F.array_sort(F.collect_list("latency")).alias("ordered")],
            [F.sum("s").alias("s"), F.sum("n").alias("n"),
             F.array_sort(F.flatten(F.collect_list("ordered"))).alias("ordered")],
            salt_buckets=cpus * 2,
        )
        partial.agg(F.sum("n")).collect()

    t_naive = run(naive)
    t_salted = run(salted)

    hist_plain = [c for _, c in partition_histogram(df.repartition(cpus * 4, "conv"))]
    from vector_spark.plans.skew import salted_repartition

    hist_salted = [
        c for _, c in partition_histogram(
            salted_repartition(df, ["conv"], cpus * 4, salt_buckets=cpus * 2)
        )
    ]

    out = {
        "n_rows": n,
        "cpus": cpus,
        "hot_key_share": 0.5,
        "naive_window_sec": t_naive,
        "salted_two_phase_sec": t_salted,
        "speedup": round(t_naive / t_salted, 2),
        "max_partition_rows_plain": max(hist_plain),
        "max_partition_rows_salted": max(hist_salted),
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    with open("SKEW.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
