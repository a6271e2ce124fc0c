"""Sink tests: GBK single-file CSV (K2, byte-level) and text sink (K1)."""

from __future__ import annotations

import pathlib
import tempfile


def test_gbk_single_file_csv_bytes(spark):
    from financial_big_data_exp_4_spark.sources.csv import write_single_csv

    df = spark.createDataFrame(
        [("金融业", 42), ("制造业", 7)], "industry string, cnt int"
    )
    with tempfile.TemporaryDirectory() as d:
        out = f"{d}/gbk_out"
        write_single_csv(df.orderBy("cnt"), out, encoding="gbk")
        parts = list(pathlib.Path(out).glob("part-*.csv"))
        assert len(parts) == 1, "K2 contract: exactly one csv file"
        raw = parts[0].read_bytes()
        assert "金融业".encode("gbk") in raw
        assert "金融业".encode("utf-8") not in raw
        text = raw.decode("gbk")
        assert text.splitlines()[0] == "industry,cnt"
        assert "制造业,7" in text


def test_text_sink_tab_separated(spark):
    from financial_big_data_exp_4_spark.sources.csv import write_text

    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    with tempfile.TemporaryDirectory() as d:
        out = f"{d}/text_out"
        write_text(df, out)
        lines = set()
        for p in pathlib.Path(out).glob("part-*"):
            lines |= set(p.read_text().splitlines())
        assert lines == {"a\t1", "b\t2"}


def test_roundtrip_csv_read(spark):
    from financial_big_data_exp_4_spark.sources.csv import (
        read_csv,
        write_single_csv,
    )

    df = spark.createDataFrame(
        [("x,with,commas", 1.5), ("plain", -2.0)], "s string, v double"
    )
    with tempfile.TemporaryDirectory() as d:
        out = f"{d}/rt"
        write_single_csv(df, out)
        back = read_csv(spark, out, schema=df.schema)
        assert {tuple(r) for r in back.collect()} == {
            tuple(r) for r in df.collect()
        }, "quoted commas must survive the round-trip (reference bug A fixed)"


def test_jsonl_roundtrip_and_corrupt_quarantine(spark, sf_dir, tmp_path):
    import json

    from financial_big_data_exp_4_spark.sources import read_jsonl, write_jsonl

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    # physical format: every line parses as a standalone JSON object
    part = next((tmp_path / "docs_jsonl").glob("part-*.json"))
    first = part.read_text().splitlines()[0]
    assert isinstance(json.loads(first), dict)

    back = read_jsonl(spark, path, "doc_id long, text string")
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == orig

    # a malformed line quarantines, not fails. read_jsonl appends the
    # quarantine column to the DATA schema itself — callers pass only
    # their data columns (a schema without the corrupt column would make
    # Spark silently emit malformed lines as all-NULL data rows).
    bad = tmp_path / "docs_jsonl" / "part-bad.json"
    bad.write_text('{"doc_id": 1, "text": "ok"}\nNOT JSON AT ALL\n')
    # Spark refuses a query that references ONLY the corrupt-record
    # column of a json scan (it would require re-parsing); the
    # documented pattern is to cache the parsed batch first.
    quarantined = read_jsonl(spark, path, "doc_id long, text string").cache()
    try:
        assert "_corrupt_record" in quarantined.columns
        n_bad = quarantined.where("_corrupt_record IS NOT NULL").count()
        assert n_bad == 1
        # the malformed line is NOT an all-NULL data row in disguise:
        # every fully-NULL data projection belongs to the quarantined one
        nulls = quarantined.where(
            "doc_id IS NULL AND text IS NULL"
        ).count()
        assert nulls == n_bad
    finally:
        quarantined.unpersist()

    # a caller following the old convention (corrupt column already in
    # the schema) must NOT get a duplicate column (round-6 ADVICE): the
    # append is skipped for both the DDL-string and StructType forms
    for sch in (
        "doc_id long, text string, _corrupt_record string",
        read_jsonl(spark, path, "doc_id long, text string").schema,
    ):
        cols = read_jsonl(spark, path, sch).columns
        assert cols.count("_corrupt_record") == 1


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    from financial_big_data_exp_4_spark.sources import (
        load_table,
        write_partitioned_parquet,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    path = str(tmp_path / "events_part")
    write_partitioned_parquet(events, path, ["event_type"])
    back = spark.read.parquet(path)
    one = back.where(back.event_type == "purchase")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    want = events.where(events.event_type == "purchase").count()
    assert one.count() == want


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from financial_big_data_exp_4_spark.sources import (
        load_table,
        read_orc,
        write_orc,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path, bloom_filter_cols=["o_orderkey"])
    back = read_orc(spark, path)
    assert back.schema == orders.schema  # ORC embeds the typed schema
    assert back.count() == orders.count()
    # value-level round-trip on a deterministic slice
    a = sorted(map(tuple, orders.where("o_orderkey % 97 = 0").collect()))
    b = sorted(map(tuple, back.where("o_orderkey % 97 = 0").collect()))
    assert a == b
    # predicate pushdown reaches the ORC scan exactly as for parquet
    one = back.where(back.o_orderkey == 42)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]" in plan


def test_events_ts_normalizes_both_parquet_encodings(spark, tmp_path):
    """The fixture events table has shipped ts as both INT64
    TIMESTAMP(NANOS) and TIMESTAMP(MICROS); load_table must yield the
    canonical bigint epoch-ns under either physical encoding."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from financial_big_data_exp_4_spark.sources import load_table

    ns_vals = [1_700_000_000_123_456_789, 1_700_000_100_000_000_000]
    for unit, dirname in (("ns", "enc_ns"), ("us", "enc_us")):
        vals = ns_vals if unit == "ns" else [v // 1000 for v in ns_vals]
        table = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(vals, pa.timestamp(unit)),
            }
        )
        d = tmp_path / dirname
        d.mkdir()
        pq.write_table(table, d / "events.parquet")
        got = {
            r["event_id"]: r["ts"]
            for r in load_table(spark, str(d), "events").collect()
        }
        expect = (
            dict(zip([1, 2], ns_vals))
            if unit == "ns"
            else {1: ns_vals[0] // 1000 * 1000, 2: ns_vals[1]}
        )
        assert got == expect, unit
        assert dict(load_table(spark, str(d), "events").dtypes)["ts"] == "bigint"
