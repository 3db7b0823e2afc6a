"""Quick A/B cell timer for optimization work — NOT the driver bench.

    python tools/ab_time.py <sf_dir> <repeats> <query> [query ...]

One session, per query: one untimed warm run, then <repeats> timed noop-sink
runs; prints min/median. Methodology matches bench.py's steady-state timing
(guide §1.4) without its quiesce/canary/probe machinery, so use it only for
relative A/B on the same box within minutes of itself.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    from datamodel_clinicaldata_spark.registry import QUERIES
    from datamodel_clinicaldata_spark.session import get_spark

    spark = get_spark("ab_time")
    for n in names:
        spark.sparkContext.setJobDescription(f"warm:{n}")
        QUERIES[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"timed:{n}:{i}")
            t0 = time.monotonic()
            QUERIES[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(time.monotonic() - t0)
        print(
            f"AB {n} min={min(ts):.3f} med={statistics.median(ts):.3f} "
            f"runs={[round(t, 3) for t in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
