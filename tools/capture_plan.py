"""Dump `.explain('formatted')` of named registered queries to files.

    python tools/capture_plan.py <sf_dir> <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt. Pre-execution AQE form (no jobs run
for most queries; eagerly-constructed ones run their bounded build jobs).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    from datamodel_clinicaldata_spark.registry import QUERIES
    from datamodel_clinicaldata_spark.session import get_spark

    spark = get_spark("capture_plan")
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = QUERIES[n](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", n, suffix, len(plan), "bytes")
    spark.stop()


if __name__ == "__main__":
    main()
