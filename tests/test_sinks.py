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
