"""Alternating A/B: ordered_prefix two-phase vs count_small escape path.

    python tools/ab_count_small.py <sf_dir> <rounds> <query> [query ...]

Variant A = code as-is; variant B = ordered_prefix monkeypatched to force
count_small=2_000_000 (the pagerank-style adaptive single-window path).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, rounds = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    import datamodel_clinicaldata_spark.operators.ranking as ranking
    from datamodel_clinicaldata_spark.registry import QUERIES
    from datamodel_clinicaldata_spark.session import get_spark

    real = ranking.ordered_prefix

    def forced(df, order_cols, **kw):
        kw["count_small"] = 2_000_000
        return real(df, order_cols, **kw)

    spark = get_spark("ab_count_small")
    for n in names:
        QUERIES[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
        times = {"A": [], "B": []}
        for r in range(rounds):
            for v in ("A", "B"):
                ranking.ordered_prefix = real if v == "A" else forced
                spark.sparkContext.setJobDescription(f"{v}{r}:{n}")
                t0 = time.monotonic()
                QUERIES[n](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                times[v].append(time.monotonic() - t0)
        ranking.ordered_prefix = real
        print(
            f"ABCS {n} twophase_min={min(times['A']):.3f} "
            f"small_min={min(times['B']):.3f} "
            f"A={[round(t,2) for t in times['A']]} "
            f"B={[round(t,2) for t in times['B']]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
