"""Build a ~K×-scale dataset by tiling an existing SF directory with
shifted keys — the sandbox proxy for the 100× scale-up mandate.

Each tile k gets disjoint key ranges (ids shifted by k·10^9 / k·10^7) so
tiles never join across each other on ids, plus content perturbation so
the corpus-shaped tables don't degenerate into 10 literal copies:

- documents.text goes through a per-tile alphabet rotation (a Caesar
  cipher on [a-z]): length, word shape, and frequency SHAPE survive, but
  shingles/minhashes differ across tiles — otherwise every doc would
  have K-1 exact near-duplicates and pair-emitting dedup queries would
  measure output explosion (a data property), not plan scaling.
- embeddings get a per-tile SIGNED COORDINATE PERMUTATION (orthogonal:
  within-tile geometry exact, cross-tile cosines decorrelated).
- events/orders/lineitem keep their timestamps/dates: K× the rows per
  window IS the scale-up being measured for windowed aggregation.

nation/region stay single-copy (dimension tables; tiled fact foreign
keys still resolve against them).

Usage: python tools/make_tiled_sf.py [K] [src_dir] [out_dir]
"""
from __future__ import annotations

import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG = 10**9
SMALL = 10**7


def main() -> None:
    k_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf_tiled"

    from pyspark.sql import functions as F

    from cocktails_data_engineering_spark.session import get_spark

    spark = get_spark("make_tiled_sf")
    os.makedirs(out, exist_ok=True)
    lower = string.ascii_lowercase

    def tiles(name: str, per_tile):
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        parts = [per_tile(df, k) for k in range(k_tiles)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {k_tiles} tiles written")

    tiles(
        "documents",
        lambda df, k: df.select(
            (F.col("doc_id") + k * BIG).alias("doc_id"),
            F.translate("text", lower, lower[k % 26:] + lower[: k % 26]).alias("text"),
            "lang",
            "source",
            "n_chars",
        ),
    )
    def _emb_tile(df, k):
        if k == 0:
            return df
        # tiles k>0 get a SIGNED COORDINATE PERMUTATION of the original
        # vectors (an orthogonal transform): within-tile geometry — norms,
        # distances, cluster structure — is preserved EXACTLY, while
        # cross-tile cosines decorrelate.  (Tried and rejected: a uniform
        # +offset keeps cosine ~1 across tiles → 9 artificial near-dups
        # per vector; iid random vectors collapse k-means via distance
        # concentration → one giant cell.  Both make scale measurements
        # reflect fixture artifacts, not plan behavior.)
        dim = 64
        shift = (7 * k) % dim
        perm = [(i + shift) % dim for i in range(dim)]
        signs = [1.0 if (i * 31 + k * 17) % 2 == 0 else -1.0 for i in range(dim)]
        return df.select(
            (F.col("vec_id") + k * BIG).alias("vec_id"),
            F.array(
                *[
                    (F.element_at("embedding", perm[i] + 1) * F.lit(signs[i])).cast(
                        "float"
                    )
                    for i in range(dim)
                ]
            ).alias("embedding"),
            "label",
        )

    tiles("embeddings", _emb_tile)
    tiles(
        "events",
        lambda df, k: df.select(
            (F.col("event_id") + k * BIG).alias("event_id"),
            "ts",
            (F.col("user_id") + k * SMALL).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
    )
    tiles(
        "orders",
        lambda df, k: df.select(
            (F.col("o_orderkey") + k * BIG).alias("o_orderkey"),
            (F.col("o_custkey") + k * SMALL).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ),
    )
    tiles(
        "lineitem",
        lambda df, k: df.select(
            (F.col("l_orderkey") + k * BIG).alias("l_orderkey"),
            (F.col("l_partkey") + k * SMALL).alias("l_partkey"),
            (F.col("l_suppkey") + k * SMALL).alias("l_suppkey"),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ),
    )
    tiles(
        "customer",
        lambda df, k: df.select(
            (F.col("c_custkey") + k * SMALL).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        ),
    )
    tiles(
        "part",
        lambda df, k: df.select(
            (F.col("p_partkey") + k * SMALL).alias("p_partkey"),
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            "p_retailprice",
        ),
    )
    tiles(
        "supplier",
        lambda df, k: df.select(
            (F.col("s_suppkey") + k * SMALL).alias("s_suppkey"),
            "s_name",
            "s_nationkey",
            "s_acctbal",
        ),
    )
    for dim in ("nation", "region"):
        spark.read.parquet(os.path.join(src, f"{dim}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{dim}.parquet"))
        print(f"{dim}: single copy written")


if __name__ == "__main__":
    main()
