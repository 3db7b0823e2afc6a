"""Alternating A/B for the r14 pushed pair predicate (guide §2.3) on
dedup_incremental_against_corpus.

    python tools/ab_predicate.py <sf_dir> <rounds>

Variant A = code as-is (crossing predicate inside the postings
self-join); variant B = queries_dedup.ngram_jaccard_pairs wrapped to
drop pair_predicate (the r13 shape: all pairs computed, crossing
filtered after). One session, alternating rounds, compare min.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    rounds = int(sys.argv[2])
    import datamodel_clinicaldata_spark.queries_dedup as qd
    from datamodel_clinicaldata_spark.registry import QUERIES
    from datamodel_clinicaldata_spark.session import get_spark

    real = qd.ngram_jaccard_pairs

    def no_pred(*a, **k):
        k.pop("pair_predicate", None)
        return real(*a, **k)

    spark = get_spark("ab_predicate")
    n = "dedup_incremental_against_corpus"

    def run():
        QUERIES[n](spark, sf_dir).write.mode("overwrite").format("noop").save()

    run()  # warm
    a_times, b_times = [], []
    for r in range(rounds):
        # Alternate the starting arm per round (decay-bias guard, r14).
        order = (("A", a_times), ("B", b_times))
        if r % 2:
            order = order[::-1]
        for variant, sink in order:
            qd.ngram_jaccard_pairs = real if variant == "A" else no_pred
            spark.sparkContext.setJobDescription(f"{variant}{r}:{n}")
            t0 = time.monotonic()
            run()
            sink.append(time.monotonic() - t0)
    qd.ngram_jaccard_pairs = real
    print(
        f"ABPRED {n} pushed_min={min(a_times):.3f} post_min={min(b_times):.3f} "
        f"A={[round(t,2) for t in a_times]} B={[round(t,2) for t in b_times]}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
