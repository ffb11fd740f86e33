"""Partitioned-write + partition-pruning contract: data written
partitioned by a column must be read back with the partition filter
applied at PLANNING time (pruned directories are never listed as input),
which is the storage-layout half of the 100 TB scan story."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.sources.tables import load


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    docs = load(spark, sf_dir, "documents")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    one_lang = docs.select("lang").distinct().limit(1).collect()[0]["lang"]
    filtered = back.filter(F.col("lang") == one_lang)

    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # Planning-time pruning: the scan's PartitionFilters carry the lang
    # predicate, so non-matching directories are skipped entirely.
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]

    expected = docs.filter(F.col("lang") == one_lang).count()
    assert filtered.count() == expected


def test_partitioned_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_rt")
    docs = load(spark, sf_dir, "documents")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partition column survives as a (string-typed) column
    assert set(r["lang"] for r in back.select("lang").distinct().collect()) == set(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )
