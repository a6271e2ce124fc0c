"""Parquet sources for the fixture star schema.

Tables (TESTDATA.md): ``region nation customer supplier part orders lineitem
events documents embeddings`` — one parquet file per table under a scale
directory. At cluster scale these would be partitioned datasets; the loaders
take any path Spark's parquet source accepts, so directory-of-files layouts
work unchanged and benefit from partition pruning.

``events.ts`` has shipped in two physical encodings across fixture
generations: INT64 TIMESTAMP(NANOS) (read as bigint ns under the session
conf ``spark.sql.legacy.parquet.nanosAsLong=true``) and plain
TIMESTAMP(MICROS). The engine's canonical form is **bigint epoch
nanoseconds** — :func:`load_table` normalizes ``events`` to it on read, so
every downstream operator keeps exact integer window/gap arithmetic (at
~1.7e18 ns a double round-trip would lose precision). µs→ns is exact
(×1000 on ~1.7e15 fits int64 with 3 decimal digits to spare). The DuckDB
oracles read the same files through ``epoch_us(ts)``, polymorphic over
both encodings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_big_data_exp_4_spark.functions.core import floor_div_sql
from financial_big_data_exp_4_spark.session import ensure_session_confs

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation"})

#: Attribute under which the per-session scan-plan memo hangs (dies with the
#: session object, like a catalog's resolved-relation cache).
_SCAN_MEMO_ATTR = "_fbde4_scan_memo"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Column pruning / predicate pushdown is left to
    Catalyst — callers ``select``/``filter`` and the scan narrows itself.

    ``events`` is normalized so ``ts`` is always bigint epoch **nanoseconds**
    (module docstring) — the one projection the engine inserts at scan time.

    The constructed *plan handle* is memoized per (session, sf_dir, name) —
    ``spark.read.parquet`` pays a driver round-trip plus a parquet footer
    read for schema resolution on every call (~0.15 s measured on the
    bench host), and a metastore catalog would resolve the relation once
    and reuse it exactly like this. No data is cached: the memo holds the
    unexecuted DataFrame, so every action still scans the files.

    Caveat (like any relation cache): the handle pins the file-listing
    snapshot taken at first load, so a fixture directory REWRITTEN
    mid-session would be read stale (or fail on a size mismatch). The
    fixtures are read-only for a session's lifetime by contract
    (TESTDATA.md — the driver regenerates them only between rounds, i.e.
    between processes); a live-table deployment would use a real catalog
    with invalidation instead.
    """
    from financial_big_data_exp_4_spark.session import (
        session_memo,
        tune_shuffle_for_input,
    )

    ensure_session_confs(spark)
    # Size the session's shuffle DOP from this directory's input bytes
    # (no-op at ≥ cores×4MiB of input — i.e. everywhere but tiny local
    # fixtures). Runs before the memo check so interleaved queries over
    # different scale dirs each plan at their own input's DOP.
    tune_shuffle_for_input(spark, sf_dir)
    memo = session_memo(spark, _SCAN_MEMO_ATTR)
    key = (sf_dir, name)
    if memo is not None and key in memo:
        return memo[key]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes)["ts"]
        if ts_type != "bigint":
            # TIMESTAMP_NTZ/LTZ µs → exact integer ns. NTZ casts to LTZ in
            # the session zone (pinned UTC), so epoch extraction is stable.
            df = df.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
            )
    if memo is not None:
        memo[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every fixture table as a temp view (for the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)


def ts_utc_expr(ts_dtype: str):
    """The ONE ``ts_utc`` derivation for the events table, shared by the
    batch loader and the streaming reader (round-10 review: three copies
    of this branch had drifted into batch, streaming, and a test — a new
    physical ``ts`` encoding generation would have to find all three).

    ``bigint`` means epoch-NANOSECONDS — either the loader's normalized
    column or a raw ``nanosAsLong`` read — derived integer-exact via
    FLOOR µs division (round-11 fix: ``DIV`` truncates toward zero, so a
    pre-epoch sub-µs instant like −1 ns landed in µs 0 while DuckDB's
    SQL-level ``CAST(TIMESTAMP_NS AS TIMESTAMP)`` / ``epoch_us`` floor
    to −1 — the same truncate-vs-floor class ``floor_div_sql``
    documents, and the convention every batch ns→µs site already uses).
    Measured caveat (duckdb 1.0.0): DuckDB's *parquet reader* converts
    a physical TIMESTAMP(NANOS) column to µs by TRUNCATION, disagreeing
    with its own SQL cast — so for hypothetical sub-µs pre-epoch data
    the differential harness's view of the data itself is lossy and no
    expression convention could reconcile a tie decided by sub-µs
    ordering. All fixture generations are whole-µs; the floor choice
    here is the self-consistent one.
    """
    if ts_dtype == "bigint":
        return F.expr(
            f"timestamp_micros(CAST({floor_div_sql('ts', 1000)} AS LONG))"
        )
    return F.col("ts").cast("timestamp")


def events_with_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with ``ts`` (bigint ns) plus ``ts_utc`` timestamp (µs).

    Integer-exact floor of ns→µs (see ``ts_utc_expr``), matching DuckDB's
    ``epoch_us`` on the same TIMESTAMP_NS instant even pre-epoch.
    """
    df = load_table(spark, sf_dir, "events")
    return df.withColumn("ts_utc", ts_utc_expr(dict(df.dtypes)["ts"]))
