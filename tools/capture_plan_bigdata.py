"""Dump `.explain('formatted')` of registered queries with auto-broadcast
DISABLED — forces the scale-adaptive big-data branches (fits_auto_broadcast
→ False) that never fire at bench SFs, so plans/rNN can carry the shape
evidence for both regimes.

    python tools/capture_plan_bigdata.py <sf_dir> <out_dir> <suffix> <query> [...]

Writes <out_dir>/<query>_bigdata_<suffix>.txt.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    from datamodel_clinicaldata_spark.registry import QUERIES
    from datamodel_clinicaldata_spark.session import get_spark

    spark = get_spark("capture_plan_bigdata")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = QUERIES[n](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{n}_bigdata_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", n, "bigdata", suffix, len(plan), "bytes")
    spark.stop()


if __name__ == "__main__":
    main()
