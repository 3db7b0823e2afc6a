"""Alternating A/B for lineage-pin experiments, steal-resistant.

    python tools/ab_pin_toggle.py <sf_dir> <rounds> <query> [query ...]

Variant A = code as-is (pins active); variant B = truncate_lineage
monkeypatched to identity (pin removed, original plan). Rounds alternate
A,B,A,B,... in ONE session so host-steal weather hits both variants
equally; compare min over rounds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    rounds = int(sys.argv[2])
    names = sys.argv[3:]
    import datamodel_clinicaldata_spark.operators.graph as graph
    from datamodel_clinicaldata_spark.registry import QUERIES
    from datamodel_clinicaldata_spark.session import get_spark

    real_pin = graph.truncate_lineage
    spark = get_spark("ab_pin_toggle")

    def run(name):
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    for n in names:
        run(n)  # warm (pinned form; plan shape differences warm both paths' scans)
        a_times, b_times = [], []
        for r in range(rounds):
            # Alternate the starting arm per round: in a monotonically
            # decaying steal storm the second arm of every pair is
            # systematically favored, so a fixed A-first order biases
            # against A (observed r14).
            order = (("A", a_times), ("B", b_times))
            if r % 2:
                order = order[::-1]
            for variant, sink in order:
                graph.truncate_lineage = (
                    real_pin if variant == "A" else (lambda df, *a, **k: df)
                )
                spark.sparkContext.setJobDescription(f"{variant}{r}:{n}")
                t0 = time.monotonic()
                run(n)
                sink.append(time.monotonic() - t0)
        graph.truncate_lineage = real_pin
        print(
            f"ABPIN {n} pinned_min={min(a_times):.3f} unpinned_min={min(b_times):.3f} "
            f"A={[round(t,2) for t in a_times]} B={[round(t,2) for t in b_times]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
