"""Alternating A/B for the r14 simhash vote fold (verdict r13 #7).

    python tools/ab_simhash.py <sf_dir> <rounds>

Times the two bit-identical folds DIRECTLY over the real corpus text
(documents.text at the given SF), both reading the same hoisted
unit-hash column, alternating A,B / B,A per round so steal weather and
its decay hit both arms symmetrically:

  A = simhash_from_hashes (r14 bit-sliced popcount)
  B = the r13 ±1 zip_with vote fold

The operator (simhash_band_pairs) wires in whichever fold this decides;
results are bit-identical (pinned in tests/test_dedup.py), so this only
measures speed on the corpus's token-count distribution.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _r13_fold_from_hashes(hashes, bits=60):
    from pyspark.sql import functions as F

    masks = F.expr("array(" + ",".join(f"{1 << i}L" for i in range(bits)) + ")")
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc, masks, lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def main() -> None:
    sf_dir = sys.argv[1]
    rounds = int(sys.argv[2])
    from pyspark.sql import functions as F

    from datamodel_clinicaldata_spark.operators.dedup import (
        simhash_from_hashes,
        simhash_unit_hashes,
    )
    from datamodel_clinicaldata_spark.operators.partitioning import (
        ensure_min_parallelism,
    )
    from datamodel_clinicaldata_spark.session import get_spark
    from datamodel_clinicaldata_spark.sources.readers import read_table

    spark = get_spark("ab_simhash")
    d = ensure_min_parallelism(read_table(spark, sf_dir, "documents"))
    hoisted = d.select(
        "doc_id",
        simhash_unit_hashes(F.col("text"), hash_mode="md5").alias("__uh"),
    )

    def run(fold, tag):
        spark.sparkContext.setJobDescription(tag)
        hoisted.select(
            "doc_id", fold(F.col("__uh")).alias("sh")
        ).write.mode("overwrite").format("noop").save()

    run(simhash_from_hashes, "warmA")
    run(_r13_fold_from_hashes, "warmB")
    a_times, b_times = [], []
    for r in range(rounds):
        # Alternate the starting arm per round (decay-bias guard, r14).
        order = (("A", a_times, simhash_from_hashes), ("B", b_times, _r13_fold_from_hashes))
        if r % 2:
            order = order[::-1]
        for variant, sink, fold in order:
            t0 = time.monotonic()
            run(fold, f"{variant}{r}")
            sink.append(time.monotonic() - t0)
    pairs = sum(1 for x, y in zip(a_times, b_times) if x < y)
    print(
        f"ABSIMHASH fold-only popcount_min={min(a_times):.3f} "
        f"r13_min={min(b_times):.3f} popcount_wins_pairs={pairs}/{rounds} "
        f"A={[round(t, 2) for t in a_times]} B={[round(t, 2) for t in b_times]}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
