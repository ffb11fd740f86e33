"""Sink layer: text-document writer (reference file format), binary store
round trip, binaryFile reader, and the SinkConfig JDBC option rendering."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cocktails_data_engineering_spark.sources.io import (
    SinkConfig,
    read_binary_store,
    write_binary_store,
    write_text_documents,
)


def test_sink_config_jdbc_options():
    cfg = SinkConfig(host="db.internal", port=5433, database="webdata", password="s3cret")
    assert cfg.jdbc_url == "jdbc:postgresql://db.internal:5433/webdata"
    assert cfg.qualified(cfg.indexing_table) == "raw.indexing"
    opts = cfg.options()
    assert opts["batchsize"] == "1000"
    assert "s3cret" not in repr(cfg)  # password never in logs


def test_sink_config_from_url():
    cfg = SinkConfig.from_url("jdbc:postgresql://db.remote:5433/spiderdata?user=crawler&password=pw")
    assert cfg.host == "db.remote"
    assert cfg.port == 5433
    assert cfg.database == "spiderdata"
    assert cfg.user == "crawler"
    assert cfg.password == "pw"
    assert cfg.jdbc_url == "jdbc:postgresql://db.remote:5433/spiderdata"
    # defaults survive a bare URL
    bare = SinkConfig.from_url("jdbc:postgresql://h/db")
    assert (bare.port, bare.user, bare.schema) == (5432, "postgres", "raw")


def test_text_document_sink_format(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            ("http://a.test/", "http://a.test/page1", "hello world"),
            ("http://b.test/", "http://b.test/page2", "two\nlines"),
        ],
        "root_site string, web_url string, text string",
    )
    out = str(tmp_path / "textdocs")
    write_text_documents(docs, out)

    files = glob.glob(os.path.join(out, "site=*", "*.txt"))
    assert files, os.listdir(out)
    contents = []
    for f in files:
        with open(f) as fh:
            contents.append(fh.read())
    blob = "\n".join(contents)
    # reference format: root_site: / web_url: header lines then body
    assert "root_site:http://a.test/" in blob
    assert "web_url:http://a.test/page1" in blob
    assert "hello world" in blob


def test_binary_store_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, bytearray(b"%PDF-1.4 fake")), (2, bytearray(b"\x89PNG fake"))],
        "doc_id long, payload binary",
    )
    out = str(tmp_path / "binstore")
    write_binary_store(df, out)
    back = spark.read.parquet(out)
    rows = {r.doc_id: bytes(r.payload) for r in back.collect()}
    assert rows == {1: b"%PDF-1.4 fake", 2: b"\x89PNG fake"}


def test_binaryfile_source(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "a.pdf").write_bytes(b"%PDF-1.4 contents-a")
    (raw / "b.pdf").write_bytes(b"%PDF-1.4 contents-bb")
    (raw / "ignore.txt").write_bytes(b"not a pdf")

    df = read_binary_store(spark, str(raw), glob="*.pdf")
    rows = sorted(
        (os.path.basename(r.path), r.length, bytes(r.content)) for r in df.collect()
    )
    assert [r[0] for r in rows] == ["a.pdf", "b.pdf"]
    assert rows[0][2] == b"%PDF-1.4 contents-a"
    assert rows[1][1] == len(b"%PDF-1.4 contents-bb")


def test_jsonl_roundtrip(spark, tmp_path):
    from cocktails_data_engineering_spark.sources.io import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "hello", 0.5), (2, "world", 1.5)], "doc_id long, text string, score double"
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, schema="doc_id long, text string, score double")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_reader(spark, tmp_path):
    from cocktails_data_engineering_spark.sources.io import read_csv

    p = tmp_path / "in.csv"
    p.write_text("id,name\n1,alpha\n2,beta\n")
    df = read_csv(spark, str(p), schema="id int, name string")
    assert sorted(map(tuple, df.collect())) == [(1, "alpha"), (2, "beta")]


def test_orc_roundtrip(spark, tmp_path):
    from cocktails_data_engineering_spark.sources.io import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "alpha", 0.5), (2, "beta", 1.5)], "doc_id long, text string, score double"
    )
    out = str(tmp_path / "docs_orc")
    write_orc(df, out)
    back = read_orc(spark, out)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_roundtrip_hostile_content(spark, tmp_path):
    """Commas, quotes, and unicode in the text column must survive the
    CSV write→read path (the quoting contract csv_roundtrip_agg's
    aggregate match relies on).  Embedded newlines are out of contract
    for the default line-based reader — they need multiLine=true, which
    defeats splittable reads at scale, so the corpus writers strip them
    (corpus line-dedup normalizes to single-line text)."""
    df = spark.createDataFrame(
        [
            (1, 'a,b "quoted", and, commas', "en"),
            (2, "çödé ünïcode — em-dash", "de"),
            (3, "", "es"),
        ],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "hostile_csv")
    df.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema("doc_id long, text string, lang string").option(
        "header", True
    ).csv(out)
    got = {r.doc_id: (r.text, r.lang) for r in back.collect()}
    want = {r.doc_id: (r.text, r.lang) for r in df.collect()}
    # empty string reads back as NULL under Spark's CSV default — accept
    # either on the empty-text row, exact match elsewhere
    assert got[1] == want[1] and got[2] == want[2]
    assert got[3][0] in ("", None) and got[3][1] == "es"


def test_sink_config_derby_url():
    cfg = SinkConfig.from_url("jdbc:derby:/tmp/somedb;create=true")
    assert cfg.engine == "derby"
    assert cfg.database == "/tmp/somedb"
    assert cfg.jdbc_url == "jdbc:derby:/tmp/somedb;create=true"
    assert cfg.options()["driver"] == "org.apache.derby.jdbc.EmbeddedDriver"
    assert cfg.qualified(cfg.indexing_table) == "APP.indexing"


def test_jdbc_roundtrip_uses_real_jdbc_sink(spark, sf_dir):
    """O15's REAL leg: with Derby bundled in the Spark distribution the
    round trip must go through df.write.jdbc -> spark.read.jdbc (not the
    parquet fallback) and preserve every row."""
    from cocktails_data_engineering_spark.sources.io import (
        LAST_JDBC_RUN,
        jdbc_roundtrip,
    )

    row = jdbc_roundtrip(spark, sf_dir).collect()[0]
    assert LAST_JDBC_RUN["sink"] == "jdbc_derby_embedded"
    assert row["roundtrip_ok"] is True
    assert LAST_JDBC_RUN["n_written"] == LAST_JDBC_RUN["n_read"] == row["n_rows"] > 0
