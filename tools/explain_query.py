"""Print the formatted physical plan of registered queries — the
one-command reproduction of docs/PLAN_AUDIT.md's claims.

Usage: python tools/explain_query.py name [name ...]
       SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/explain_query.py minhash_near_dedup
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        sys.exit(1)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from cocktails_data_engineering_spark.plans import queries as plans
    from cocktails_data_engineering_spark.session import get_spark

    spark = get_spark("explain_query")
    qs = plans.all_queries()
    for name in names:
        if name not in qs:
            print(f"== {name}: UNKNOWN (have {len(qs)} queries)")
            continue
        print(f"== {name} " + "=" * max(1, 70 - len(name)))
        qs[name](spark, sf_dir).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
