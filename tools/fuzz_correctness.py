"""Adversarial differential fuzzing: generate a synthetic fixture set
with hostile-but-in-contract distributions, then run the FULL
check_correctness gate (every ``queries()`` entry vs its DuckDB oracle)
over it.

Why: the per-round gate only ever sees the driver's fixed fixture
distributions. Every class of round-5 bug (NULL totality, pre-epoch
floor division, zero-signature sentinel overload, quantile-split
collisions) was invisible at the fixture and real off it. This tool
makes those classes reproducible on demand:

* **time**: event/order/ship timestamps mix the fixture's 2024 window
  with pre-epoch (1969) and far-future (2100) values — exercises every
  sign-safe floor-div bucketing site;
* **text**: exact-duplicate clusters, near-duplicates (one-token
  edits), empty / whitespace-only / single-token / one-token-repeated
  docs, CJK + emoji + mixed-case docs, one 2000-token doc — exercises
  shingle sentinels, repetition detection, tokenizer lockstep;
* **numbers**: 30% of order prices collide on one promotional value
  (quantile-split dedupe), exact-duplicate balances, negatives, zeros,
  ±1e11 extremes;
* **keys**: zipf-skewed users with forced duplicate (user_id, ts)
  pairs (asof/latest tiebreaks), dangling order→customer foreign keys
  (outer/anti joins);
* **vectors**: exact-duplicate, near-duplicate, and all-ZERO
  embeddings (zero-norm cosine paths);
* **json**: malformed (`not json`, `{`, empty) and nested props;
* **NULLs** (profile ``nulls``, the default): NULLs in every non-key
  column — text, lang, value, event_type, props, priorities, balances,
  segments. Keys stay non-null (the one generator-side contract).

Usage::

    python tools/fuzz_correctness.py [--seed N]
        [--profile nulls|clean|tiny] [--ts-encoding us|ns]
        [--keep] [query ...]

``--profile tiny`` shrinks every table to degenerate sizes (singleton
groups, a 3-vector index); ``--ts-encoding ns`` writes ``events.ts``
as INT64 TIMESTAMP(NANOS) — the driver fixture's OTHER historical
encoding — to pre-verify an encoding flip.

Generates to /tmp/fuzz_sf_<seed>_<profile>/ and exits with
check_correctness's exit code (0 iff every oracle-checked query
matches). Deterministic per seed. ``--keep`` skips regeneration if the
dir exists (fast re-runs while debugging one query).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

US = 1_000_000
DAY_US = 86_400 * US
EPOCH_2024 = 1_704_067_200 * US  # 2024-01-01
EPOCH_1969 = -30 * DAY_US  # pre-epoch: 1969-12-02
EPOCH_2100 = 4_102_444_800 * US  # 2100-01-01
EPOCH_1996 = 820_454_400 * US  # 1996-01-01

TOKEN_VOCAB = (
    "the a key order sort table scan merge part window small hash join "
    "batch stream spark dup group query row data slow filter customer "
    "line value agg column big fast vector"
).split()

EVENT_TYPES = ["signup", "click", "purchase", "error", "view"]
MKT_SEGMENTS = ["AUTOMOBILE", "FURNITURE", "MACHINERY", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
LANGS = ["en", "zh", "de", "es", "fr"]
EMBED_DIM = 64


def _maybe_null(rng, values, p, nulls: bool):
    """Return values with probability-``p`` NULLs when the profile asks."""
    if not nulls:
        return list(values)
    mask = rng.random(len(values)) < p
    return [None if m else v for v, m in zip(values, mask)]


def _ts_mix(rng, n) -> list[int]:
    """µs timestamps: mostly 2024 window, some pre-epoch, some far future."""
    kind = rng.random(n)
    out = []
    for k in kind:
        if k < 0.70:
            out.append(EPOCH_2024 + int(rng.integers(0, 30 * DAY_US)))
        elif k < 0.85:
            out.append(EPOCH_1969 + int(rng.integers(0, 10 * DAY_US)))
        else:
            out.append(EPOCH_2100 + int(rng.integers(0, 10 * DAY_US)))
    return out


def _write(
    outdir: str,
    name: str,
    cols: dict,
    types: dict,
    row_group_size: int | None = None,
) -> None:
    """``row_group_size=None`` (every profile but longdocs' documents)
    keeps pyarrow's default — one row group at these fixture sizes, the
    driver-fixture layout that keeps the engine's single-row-group
    rebalance paths exercised. The longdocs documents table opts into
    SMALL groups instead: both engines parallelize parquet by row group,
    so one group serializes the md5-heavy shingle pipeline — DuckDB ran
    the minhash-signature CTE single-threaded at >600 s per consuming
    oracle (~8 consumers pushed the gate past a 1 h timeout), and Spark
    would scan on one task but for ``rebalance_for_cpu``. Layout-only:
    values, schema, and every hash are unchanged."""
    arrays, fields = [], []
    for cname, vals in cols.items():
        t = types[cname]
        arrays.append(pa.array(vals, type=t))
        fields.append(pa.field(cname, t))
    tbl = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    pq.write_table(
        tbl,
        f"{outdir}/{name}.parquet",
        **({} if row_group_size is None
           else {"row_group_size": row_group_size}),
    )


def reencode_events_ns(outdir: str) -> None:
    """Rewrite events.parquet with ``ts`` as TIMESTAMP(NANOS) — same
    instants, different physical encoding. The driver fixture has
    shipped events.ts as BOTH MICROS and NANOS across generations
    (TESTDATA/SURVEY: the engine loader normalizes either via the
    retrofitted ``nanosAsLong`` conf, DuckDB reads TIMESTAMP_NS
    natively), so ``--ts-encoding ns`` pre-verifies the flip instead of
    discovering it on a future round. Only events flips — the driver
    has never shipped nanos order/ship dates."""
    path = f"{outdir}/events.parquet"
    tbl = pq.read_table(path)
    idx = tbl.column_names.index("ts")
    tbl = tbl.set_column(
        idx, pa.field("ts", pa.timestamp("ns")),
        tbl.column("ts").cast(pa.timestamp("ns")),
    )
    pq.write_table(tbl, path)


def generate(outdir: str, seed: int, nulls: bool) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)
    ts_us = pa.timestamp("us")

    _write(
        outdir, "region",
        {"r_regionkey": list(range(5)),
         "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "中东 REGION"]},
        {"r_regionkey": pa.int32(), "r_name": pa.string()},
    )

    n_names = [f"n{i}" for i in range(25)]
    n_names[7] = ""  # empty group key
    n_names[13] = "NATION WITH SPACES"
    _write(
        outdir, "nation",
        {"n_nationkey": list(range(25)),
         "n_name": n_names,
         "n_regionkey": [int(v) for v in rng.choice(
             5, 25, p=[0.5, 0.2, 0.1, 0.1, 0.1])]},
        {"n_nationkey": pa.int32(), "n_name": pa.string(),
         "n_regionkey": pa.int32()},
    )

    nc = 150
    bal = np.round(rng.normal(1000, 2500, nc), 2)
    bal[:10] = 777.77  # exact duplicates
    bal[10:14] = 0.0
    bal[14] = 9.9e11
    bal[15] = -9.9e11
    _write(
        outdir, "customer",
        {"c_custkey": list(range(1, nc + 1)),
         "c_name": [f"Customer#{i:09d}" for i in range(1, nc + 1)],
         "c_nationkey": [int(v) for v in rng.choice(25, nc)],
         "c_acctbal": _maybe_null(rng, [float(b) for b in bal], 0.05, nulls),
         "c_mktsegment": _maybe_null(
             rng, [MKT_SEGMENTS[i] for i in rng.choice(5, nc)], 0.05, nulls)},
        {"c_custkey": pa.int64(), "c_name": pa.string(),
         "c_nationkey": pa.int32(), "c_acctbal": pa.float64(),
         "c_mktsegment": pa.string()},
    )

    _write(
        outdir, "supplier",
        {"s_suppkey": list(range(1, 11)),
         "s_name": [f"Supplier#{i}" for i in range(1, 11)],
         "s_nationkey": [int(v) for v in rng.choice(25, 10)],
         "s_acctbal": [round(float(v), 2) for v in rng.normal(5000, 2000, 10)]},
        {"s_suppkey": pa.int64(), "s_name": pa.string(),
         "s_nationkey": pa.int32(), "s_acctbal": pa.float64()},
    )

    npart = 200
    _write(
        outdir, "part",
        {"p_partkey": list(range(1, npart + 1)),
         "p_name": [f"part {i}" for i in range(1, npart + 1)],
         "p_brand": [f"Brand#{int(v)}" for v in rng.integers(1, 26, npart)],
         "p_type": [f"TYPE {int(v)}" for v in rng.integers(0, 6, npart)],
         "p_size": [int(v) for v in rng.integers(1, 51, npart)],
         "p_retailprice": [round(float(v), 2)
                           for v in rng.uniform(900, 2000, npart)]},
        {"p_partkey": pa.int64(), "p_name": pa.string(),
         "p_brand": pa.string(), "p_type": pa.string(),
         "p_size": pa.int32(), "p_retailprice": pa.float64()},
    )

    no = 1500
    okeys = list(range(1, no + 1))
    custs = []
    for _ in range(no):
        r = rng.random()
        if r < 0.05:
            custs.append(int(rng.integers(151, 161)))  # dangling FK
        elif r < 0.25:
            custs.append(7)  # hot customer
        else:
            custs.append(int(rng.integers(1, nc + 1)))
    price = np.round(np.exp(rng.normal(9, 1, no)), 2)
    promo = rng.random(no) < 0.30
    price[promo] = 1000.0  # promotional collision: quantiles collide
    # a real high-price tail straddling the 350k/400k thresholds:
    # exp(N(9,1)) alone never reaches them (P > 350k ~ 8e-5), so
    # q_semi_join and q_set_ops' 'big' branch compared empty-vs-empty
    # on every run (round-10 review)
    big = rng.random(no) < 0.03
    price[big] = np.round(rng.uniform(200_000, 600_000, int(big.sum())), 2)
    price[0] = -500.25  # refund-shaped negative
    odates = _ts_mix(rng, no)
    # ~20% of orders in [1996-01-01, 1997-01-01): q_local_supplier_volume's
    # Q5-shaped window — the old 2024/1969/2100-only mix left its 5-way
    # join vacuously empty in every fuzz run (round-10 review)
    for idx in np.where(rng.random(no) < 0.20)[0]:
        odates[int(idx)] = EPOCH_1996 + int(rng.integers(0, 360 * DAY_US))
    _write(
        outdir, "orders",
        {"o_orderkey": okeys,
         "o_custkey": custs,
         "o_orderstatus": [["O", "F", "P"][i]
                           for i in rng.choice(3, no, p=[0.5, 0.4, 0.1])],
         "o_totalprice": [float(p) for p in price],
         "o_orderdate": odates,
         "o_orderpriority": _maybe_null(
             rng, [PRIORITIES[i] for i in rng.choice(5, no)], 0.03, nulls)},
        {"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
         "o_orderstatus": pa.string(), "o_totalprice": pa.float64(),
         "o_orderdate": ts_us, "o_orderpriority": pa.string()},
    )

    nl = 6000
    _write(
        outdir, "lineitem",
        {"l_orderkey": [int(v) for v in rng.choice(okeys, nl)],
         "l_partkey": [int(v) for v in rng.integers(1, npart + 1, nl)],
         "l_suppkey": [int(v) for v in rng.integers(1, 11, nl)],
         "l_linenumber": [int(v) for v in rng.integers(1, 8, nl)],
         "l_quantity": [float(v) for v in rng.integers(1, 51, nl)],
         "l_extendedprice": [round(float(v), 2)
                             for v in rng.uniform(100, 100_000, nl)],
         "l_discount": [round(float(v), 2) for v in rng.uniform(0, 0.1, nl)],
         "l_tax": [round(float(v), 2) for v in rng.uniform(0, 0.08, nl)],
         "l_returnflag": [["R", "A", "N"][i] for i in rng.choice(3, nl)],
         "l_linestatus": [["O", "F"][i] for i in rng.choice(2, nl)],
         "l_shipdate": _ts_mix(rng, nl)},
        {"l_orderkey": pa.int64(), "l_partkey": pa.int64(),
         "l_suppkey": pa.int64(), "l_linenumber": pa.int32(),
         "l_quantity": pa.float64(), "l_extendedprice": pa.float64(),
         "l_discount": pa.float64(), "l_tax": pa.float64(),
         "l_returnflag": pa.string(), "l_linestatus": pa.string(),
         "l_shipdate": ts_us},
    )

    ne = 1000
    users = [1 if r < 0.30 else int(rng.integers(2, 101))
             for r in rng.random(ne)]
    ets = _ts_mix(rng, ne)
    # forced duplicate (user_id, ts) pairs: deterministic tiebreaks
    for i in range(0, 100, 2):
        users[i + 1] = users[i]
        ets[i + 1] = ets[i]
    props = []
    for i in range(ne):
        r = rng.random()
        if r < 0.80:
            props.append('{"k": %d}' % rng.integers(0, 100))
        elif r < 0.85:
            props.append("not json")
        elif r < 0.90:
            props.append("{")
        elif r < 0.95:
            props.append("")
        else:
            props.append('{"k": {"nested": 1}}')
    _write(
        outdir, "events",
        {"event_id": list(range(1, ne + 1)),
         "ts": ets,
         "user_id": users,
         "event_type": _maybe_null(
             rng, [EVENT_TYPES[i] for i in rng.choice(5, ne)], 0.05, nulls),
         "value": _maybe_null(
             rng, [round(float(v), 3) for v in rng.normal(50, 20, ne)],
             0.07, nulls),
         "props": _maybe_null(rng, props, 0.05, nulls)},
        {"event_id": pa.int64(), "ts": ts_us, "user_id": pa.int64(),
         "event_type": pa.string(), "value": pa.float64(),
         "props": pa.string()},
    )

    nd = 500
    texts: list[str | None] = []
    for i in range(nd):
        k = int(rng.integers(10, 120))
        texts.append(" ".join(rng.choice(TOKEN_VOCAB, k)))
    # exact-duplicate clusters: ids 1-40 = 10 clusters x 4 copies
    for c in range(10):
        base = texts[c * 4]
        for j in range(1, 4):
            texts[c * 4 + j] = base
    # near-duplicates: ids 41-60 copy a DISTINCT non-cluster doc each,
    # with one token edited. Sources live OUTSIDE the cluster block
    # (round-10 review: the old (i-40)*2 indexing drew from inside the
    # identical-copy clusters, so pairs of 'near-dups' shared a source
    # text and the deterministic edit made them exact duplicates of
    # each other — only 10 distinct variants were planted, not 20)
    for i in range(40, 60):
        toks = texts[70 + (i - 40)].split()
        toks[min(3, len(toks) - 1)] = "edited"
        texts[i] = " ".join(toks)
    texts[60] = ""
    texts[61] = "   "
    texts[62] = "solo"
    texts[63] = " ".join(["spam"] * 400)
    texts[64] = "数据 表 扫描 归并 排序 数据 流 计算"
    texts[65] = "hello!!! 😀 😀 ??? ... mixed,punct;here"
    texts[66] = " ".join(rng.choice(TOKEN_VOCAB, 2000))
    texts[67] = "The THE the tHe ThE"
    texts = _maybe_null(rng, texts, 0.05, nulls)
    _write(
        outdir, "documents",
        {"doc_id": list(range(1, nd + 1)),
         "text": texts,
         "lang": _maybe_null(
             rng, [LANGS[i] for i in rng.choice(5, nd)], 0.10, nulls),
         "source": [f"src{int(v)}" for v in rng.integers(0, 20, nd)],
         "n_chars": [None if t is None else len(t) for t in texts]},
        {"doc_id": pa.int64(), "text": pa.string(), "lang": pa.string(),
         "source": pa.string(), "n_chars": pa.int64()},
    )

    nv = 500
    vecs = rng.normal(0, 1, (nv, EMBED_DIM)).astype(np.float32)
    for i in range(10):  # exact duplicate pairs
        vecs[100 + 2 * i + 1] = vecs[100 + 2 * i]
    for i in range(5):  # near-duplicates
        vecs[140 + i] = vecs[100 + i] + rng.normal(0, 1e-4, EMBED_DIM).astype(
            np.float32
        )
    vecs[150:155] = 0.0  # zero-norm vectors
    vecs[155] *= 1e4  # huge magnitude
    _write(
        outdir, "embeddings",
        {"vec_id": list(range(1, nv + 1)),
         "embedding": [v.tolist() for v in vecs],
         "label": [int(v) for v in rng.choice(
             5, nv, p=[0.6, 0.2, 0.1, 0.05, 0.05])]},
        {"vec_id": pa.int64(),
         "embedding": pa.list_(pa.float32()),
         "label": pa.int32()},
    )


def generate_tiny(outdir: str, seed: int) -> None:
    """Degenerate-size fixture: every table at its smallest meaningful
    cardinality (singleton groups, one-pair dedup, a 3-vector index,
    empty-text docs). Exercises the failure class the other profiles
    can't: std of a singleton, percentile of one value, LSH with no
    candidate pairs, a quantizer fit with fewer points than cells."""
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)
    ts_us = pa.timestamp("us")

    _write(
        outdir, "region",
        {"r_regionkey": list(range(5)),
         "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]},
        {"r_regionkey": pa.int32(), "r_name": pa.string()},
    )
    _write(
        outdir, "nation",
        {"n_nationkey": list(range(25)),
         "n_name": [f"n{i}" for i in range(25)],
         "n_regionkey": [int(v) for v in rng.choice(5, 25)]},
        {"n_nationkey": pa.int32(), "n_name": pa.string(),
         "n_regionkey": pa.int32()},
    )
    _write(
        outdir, "customer",
        {"c_custkey": [1, 2, 3],
         "c_name": ["Customer#1", "Customer#2", "Customer#3"],
         "c_nationkey": [0, 0, 7],
         "c_acctbal": [100.0, 100.0, -5.5],
         "c_mktsegment": ["BUILDING", "BUILDING", "MACHINERY"]},
        {"c_custkey": pa.int64(), "c_name": pa.string(),
         "c_nationkey": pa.int32(), "c_acctbal": pa.float64(),
         "c_mktsegment": pa.string()},
    )
    _write(
        outdir, "supplier",
        {"s_suppkey": [1], "s_name": ["Supplier#1"], "s_nationkey": [0],
         "s_acctbal": [0.0]},
        {"s_suppkey": pa.int64(), "s_name": pa.string(),
         "s_nationkey": pa.int32(), "s_acctbal": pa.float64()},
    )
    _write(
        outdir, "part",
        {"p_partkey": [1, 2], "p_name": ["part 1", "part 2"],
         "p_brand": ["Brand#1", "Brand#2"], "p_type": ["TYPE 0", "TYPE 1"],
         "p_size": [1, 50], "p_retailprice": [900.0, 2000.0]},
        {"p_partkey": pa.int64(), "p_name": pa.string(),
         "p_brand": pa.string(), "p_type": pa.string(),
         "p_size": pa.int32(), "p_retailprice": pa.float64()},
    )
    _write(
        outdir, "orders",
        {"o_orderkey": [1, 2, 3, 97 * 3],  # 97*3: exercises the CDC mod classes
         "o_custkey": [1, 1, 3, 9],  # 9: dangling FK
         "o_orderstatus": ["O", "F", "O", "P"],
         "o_totalprice": [1000.0, 1000.0, -500.0, 250.5],
         "o_orderdate": [EPOCH_2024, EPOCH_2024 + DAY_US, EPOCH_1969, EPOCH_2024],
         "o_orderpriority": ["1-URGENT", "1-URGENT", "5-LOW", "3-MEDIUM"]},
        {"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
         "o_orderstatus": pa.string(), "o_totalprice": pa.float64(),
         "o_orderdate": ts_us, "o_orderpriority": pa.string()},
    )
    _write(
        outdir, "lineitem",
        {"l_orderkey": [1, 1, 2, 3, 4],
         "l_partkey": [1, 2, 1, 2, 1],
         "l_suppkey": [1, 1, 1, 1, 1],
         "l_linenumber": [1, 2, 1, 1, 1],
         "l_quantity": [1.0, 50.0, 7.0, 7.0, 3.0],
         "l_extendedprice": [100.0, 99999.99, 500.0, 500.0, 42.0],
         "l_discount": [0.0, 0.1, 0.05, 0.05, 0.0],
         "l_tax": [0.0, 0.08, 0.02, 0.02, 0.0],
         "l_returnflag": ["N", "R", "A", "A", "N"],
         "l_linestatus": ["O", "F", "O", "F", "O"],
         "l_shipdate": [EPOCH_2024, EPOCH_1969, EPOCH_2024, EPOCH_2100,
                        EPOCH_2024]},
        {"l_orderkey": pa.int64(), "l_partkey": pa.int64(),
         "l_suppkey": pa.int64(), "l_linenumber": pa.int32(),
         "l_quantity": pa.float64(), "l_extendedprice": pa.float64(),
         "l_discount": pa.float64(), "l_tax": pa.float64(),
         "l_returnflag": pa.string(), "l_linestatus": pa.string(),
         "l_shipdate": ts_us},
    )
    _write(
        outdir, "events",
        {"event_id": [1, 2, 3, 4, 5],
         "ts": [EPOCH_2024, EPOCH_2024 + 10 * US, EPOCH_2024 + 10 * US,
                EPOCH_1969, EPOCH_2100],
         "user_id": [1, 1, 1, 2, 2],  # duplicate ts for user 1: tiebreaks
         "event_type": ["purchase", "error", "error", "view", "view"],
         "value": [10.0, 0.0, 0.0, -1.5, 99.9],
         "props": ['{"k": 1}', "", '{"k": 2}', "not json", '{"k": 3}']},
        {"event_id": pa.int64(), "ts": ts_us, "user_id": pa.int64(),
         "event_type": pa.string(), "value": pa.float64(),
         "props": pa.string()},
    )
    _write(
        outdir, "documents",
        {"doc_id": [1, 2, 3],
         "text": ["the fast key order sort table scan merge",
                  "the fast key order sort table scan merge",  # exact dup
                  ""],
         "lang": ["en", "en", "zh"],
         "source": ["src0", "src0", "src1"],
         "n_chars": [40, 40, 0]},
        {"doc_id": pa.int64(), "text": pa.string(), "lang": pa.string(),
         "source": pa.string(), "n_chars": pa.int64()},
    )
    v = rng.normal(0, 1, EMBED_DIM).astype(np.float32)
    _write(
        outdir, "embeddings",
        {"vec_id": [1, 2, 3],
         "embedding": [v.tolist(), (v * 2).tolist(),  # colinear pair
                       [0.0] * EMBED_DIM],  # zero vector
         "label": [0, 0, 1]},
        {"vec_id": pa.int64(),
         "embedding": pa.list_(pa.float32()),
         "label": pa.int32()},
    )


def generate_scaled(outdir: str, seed: int, mult: int) -> None:
    """sf0.1-SHAPED fixture at ``mult``× the row counts — the scale-trend
    fixture (round-6 VERDICT #3: /root/testdata tops out at sf0.1, so
    every claim above that was design-argument; this turns it into a
    measured slope via tools/scale_bench.py).

    Unlike :func:`generate` (adversarial distributions, small), this is
    VECTORIZED and distribution-faithful to the driver fixture: same
    schemas and dtypes, same 2024-01 event window, 1995-2001 order/ship
    dates, ~55-token docs with a fixed exact-dup/near-dup fraction,
    unit-scale gaussian embeddings with duplicate/near-duplicate pairs,
    zipf-ish hot keys. Row counts per table = sf0.1 counts × mult, so
    mult=1 reproduces the driver fixture's scale and mult=10 is the 10×
    point of the trend.

    Document text draws from a LARGE zipf-weighted vocabulary (8,192
    tokens), not the 31-word ``TOKEN_VOCAB`` the adversarial profiles
    use. This is a round-9 fix to a fixture-degeneracy bug, not a
    cosmetic choice: with 31 possible tokens, long documents contain the
    ENTIRE vocabulary with high probability, so their distinct-token
    sets — the only input SimHash sees — collide en masse and produce
    identical 52-bit signatures. Measured at this fixture's own scale:
    hamming-0 pair count grew 91× for 10× documents (36.6k → 3.35M, max
    identical-signature clique 248 → 2,375), i.e. the TRUE radius-3
    output was quadratic in the corpus and no banding strategy could
    make the operator sub-quadratic. A large-vocab corpus is also the
    honest model of the 100 TB target (real corpora have ~1M-term
    vocabularies; 31 is degenerate), while the zipf weights keep the
    stopword-like head that BM25/TF-IDF/inverted-index slopes care
    about. The planted dup structure (8% exact clusters of 4, 2%
    one-token-edit near-dups) is unchanged.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)
    ts_us = pa.timestamp("us")
    D1995 = 789_048_000 * US  # 1995-01-02
    DSPAN = 6 * 365 * DAY_US  # ~2001

    _write(
        outdir, "region",
        {"r_regionkey": list(range(5)),
         "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]},
        {"r_regionkey": pa.int32(), "r_name": pa.string()},
    )
    _write(
        outdir, "nation",
        {"n_nationkey": list(range(25)),
         "n_name": [f"nation{i}" for i in range(25)],
         "n_regionkey": [int(v) for v in rng.integers(0, 5, 25)]},
        {"n_nationkey": pa.int32(), "n_name": pa.string(),
         "n_regionkey": pa.int32()},
    )

    nc = 15_000 * mult
    _write(
        outdir, "customer",
        {"c_custkey": np.arange(1, nc + 1),
         "c_name": [f"Customer#{i:09d}" for i in range(1, nc + 1)],
         "c_nationkey": rng.integers(0, 25, nc).astype(np.int32),
         "c_acctbal": np.round(rng.normal(1000, 2500, nc), 2),
         "c_mktsegment": np.array(MKT_SEGMENTS)[rng.integers(0, 5, nc)]},
        {"c_custkey": pa.int64(), "c_name": pa.string(),
         "c_nationkey": pa.int32(), "c_acctbal": pa.float64(),
         "c_mktsegment": pa.string()},
    )

    ns = 1_000 * mult
    _write(
        outdir, "supplier",
        {"s_suppkey": np.arange(1, ns + 1),
         "s_name": [f"Supplier#{i:09d}" for i in range(1, ns + 1)],
         "s_nationkey": rng.integers(0, 25, ns).astype(np.int32),
         "s_acctbal": np.round(rng.normal(5000, 2000, ns), 2)},
        {"s_suppkey": pa.int64(), "s_name": pa.string(),
         "s_nationkey": pa.int32(), "s_acctbal": pa.float64()},
    )

    npart = 20_000 * mult
    _write(
        outdir, "part",
        {"p_partkey": np.arange(1, npart + 1),
         "p_name": [f"part {i}" for i in range(1, npart + 1)],
         "p_brand": [f"Brand#{v}" for v in rng.integers(1, 26, npart)],
         "p_type": [f"TYPE {v}" for v in rng.integers(0, 6, npart)],
         "p_size": rng.integers(1, 51, npart).astype(np.int32),
         "p_retailprice": np.round(rng.uniform(900, 2000, npart), 2)},
        {"p_partkey": pa.int64(), "p_name": pa.string(),
         "p_brand": pa.string(), "p_type": pa.string(),
         "p_size": pa.int32(), "p_retailprice": pa.float64()},
    )

    no = 150_000 * mult
    custs = rng.integers(1, nc + 1, no)
    hot = rng.random(no) < 0.05  # hot-key skew, sf0.1-ish
    custs[hot] = rng.integers(1, 8, int(hot.sum()))
    _write(
        outdir, "orders",
        {"o_orderkey": np.arange(1, no + 1),
         "o_custkey": custs,
         "o_orderstatus": np.array(["O", "F", "P"])[
             rng.choice(3, no, p=[0.5, 0.4, 0.1])],
         "o_totalprice": np.round(np.exp(rng.normal(9, 1, no)), 2),
         "o_orderdate": D1995 + rng.integers(0, DSPAN, no),
         "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, no)]},
        {"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
         "o_orderstatus": pa.string(), "o_totalprice": pa.float64(),
         "o_orderdate": ts_us, "o_orderpriority": pa.string()},
    )

    nl = 600_000 * mult
    _write(
        outdir, "lineitem",
        {"l_orderkey": rng.integers(1, no + 1, nl),
         "l_partkey": rng.integers(1, npart + 1, nl),
         "l_suppkey": rng.integers(1, ns + 1, nl),
         "l_linenumber": rng.integers(1, 8, nl).astype(np.int32),
         "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
         "l_extendedprice": np.round(rng.uniform(100, 100_000, nl), 2),
         "l_discount": np.round(rng.uniform(0, 0.1, nl), 2),
         "l_tax": np.round(rng.uniform(0, 0.08, nl), 2),
         "l_returnflag": np.array(["R", "A", "N"])[rng.integers(0, 3, nl)],
         "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, nl)],
         "l_shipdate": D1995 + rng.integers(0, DSPAN, nl)},
        {"l_orderkey": pa.int64(), "l_partkey": pa.int64(),
         "l_suppkey": pa.int64(), "l_linenumber": pa.int32(),
         "l_quantity": pa.float64(), "l_extendedprice": pa.float64(),
         "l_discount": pa.float64(), "l_tax": pa.float64(),
         "l_returnflag": pa.string(), "l_linestatus": pa.string(),
         "l_shipdate": ts_us},
    )

    ne = 100_000 * mult
    nusers = 1_500 * mult
    users = rng.integers(1, nusers + 1, ne)
    hot_ev = rng.random(ne) < 0.10
    users[hot_ev] = rng.integers(1, 16, int(hot_ev.sum()))
    _write(
        outdir, "events",
        {"event_id": np.arange(1, ne + 1),
         "ts": EPOCH_2024 + rng.integers(0, 30 * DAY_US, ne),
         "user_id": users,
         "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, ne)],
         "value": np.round(rng.normal(50, 20, ne), 2),
         "props": ['{"k": %d}' % v for v in rng.integers(0, 100, ne)]},
        {"event_id": pa.int64(), "ts": ts_us, "user_id": pa.int64(),
         "event_type": pa.string(), "value": pa.float64(),
         "props": pa.string()},
    )

    nd = 5_000 * mult
    lens = rng.integers(10, 101, nd)
    # large zipf-weighted vocab (see docstring): 8,192 tokens derived
    # from the 31 base words, weight ∝ 1/(rank+30) — a stopword-like
    # head over a long tail, so distinct-token sets (SimHash's input)
    # are effectively unique per document instead of colliding en masse
    base = TOKEN_VOCAB
    vocab = np.array(
        [f"{base[i % len(base)]}{i // len(base)}" for i in range(8192)]
    )
    w = 1.0 / (np.arange(len(vocab)) + 30.0)
    w /= w.sum()
    toks = vocab[rng.choice(len(vocab), int(lens.sum()), p=w)]
    bounds = np.concatenate(([0], np.cumsum(lens)))
    texts = [
        " ".join(toks[bounds[i]: bounds[i + 1]]) for i in range(nd)
    ]
    # fixed dup structure, scale-invariant FRACTIONS: 8% of docs sit in
    # exact-dup clusters of 4; 2% are near-dups (one token edited)
    n_clusters = nd // 50
    for c in range(n_clusters):
        base = texts[c * 4]
        for j in range(1, 4):
            texts[c * 4 + j] = base
    n_near = nd // 50
    for i in range(n_near):
        t = texts[4 * n_clusters + i].split()
        t[min(3, len(t) - 1)] = "edited"
        texts[4 * n_clusters + n_near + i] = " ".join(t)
    _write(
        outdir, "documents",
        {"doc_id": np.arange(1, nd + 1),
         "text": texts,
         "lang": np.array(LANGS)[rng.choice(5, nd, p=[0.6, 0.2, 0.1, 0.05,
                                                      0.05])],
         "source": [f"src{v}" for v in rng.integers(0, 20, nd)],
         "n_chars": [len(t) for t in texts]},
        {"doc_id": pa.int64(), "text": pa.string(), "lang": pa.string(),
         "source": pa.string(), "n_chars": pa.int64()},
    )

    nv = 2_000 * mult
    vecs = rng.normal(0, 0.125, (nv, EMBED_DIM)).astype(np.float32)
    n_pairs = nv // 100  # 1% duplicate pairs + 0.5% near-dups
    for i in range(n_pairs):
        vecs[2 * i + 1] = vecs[2 * i]
    for i in range(nv // 200):
        # near-dup OF AN EXISTING vector (copy + noise) — += alone would
        # just perturb an independent gaussian in place, creating no pair
        vecs[2 * n_pairs + i] = vecs[i] + rng.normal(
            0, 1e-4, EMBED_DIM
        ).astype(np.float32)
    _write(
        outdir, "embeddings",
        {"vec_id": np.arange(1, nv + 1),
         "embedding": [v.tolist() for v in vecs],
         "label": rng.choice(5, nv, p=[0.6, 0.2, 0.1, 0.05, 0.05]).astype(
             np.int32)},
        {"vec_id": pa.int64(),
         "embedding": pa.list_(pa.float32()),
         "label": pa.int32()},
    )


def zipf_vocab(size: int = 8192) -> tuple[np.ndarray, np.ndarray]:
    """The large zipf-weighted vocabulary ``generate_scaled`` documents
    draw from (tokens, probability weights) — shared by the longdocs
    rewrite so both fixtures model the same non-degenerate corpus."""
    vocab = np.array(
        [f"{TOKEN_VOCAB[i % len(TOKEN_VOCAB)]}{i // len(TOKEN_VOCAB)}"
         for i in range(size)]
    )
    w = 1.0 / (np.arange(size) + 30.0)
    return vocab, w / w.sum()


def rewrite_documents_longdocs(outdir: str, seed: int) -> None:
    """Rewrite ``documents.parquet`` with 10k-50k-char texts — the
    length regime no other profile reaches (round-10 VERDICT gap #2:
    fuzz/recall fixtures top out near ~700 chars, while long documents
    are the content-anchored shingle selection's stated value case and
    stress the ``length(text) >= SHINGLE_K`` pushdown sentinel and the
    per-doc signature cost).

    Same planted structure as :func:`generate`'s documents (10 exact
    clusters of 4 at ids 1-40; one-token-edit near-dup pairs
    (41+i, 71+i) for i < 20 — sources OUTSIDE the cluster block), same
    schema, but texts are 1.5k-7k tokens from the zipf-8192 vocabulary
    (the 31-word adversarial vocab would make every long doc's distinct
    token set the ENTIRE vocabulary — the simhash degeneracy
    generate_scaled's docstring documents). A couple of structured edge
    docs keep the short/empty sentinel paths live."""
    rng = np.random.default_rng(seed + 9)
    nd = 500
    vocab, w = zipf_vocab()
    lens = rng.integers(1_500, 7_001, nd)
    toks = vocab[rng.choice(len(vocab), int(lens.sum()), p=w)]
    bounds = np.concatenate(([0], np.cumsum(lens)))
    texts: list[str | None] = [
        " ".join(toks[bounds[i]: bounds[i + 1]]) for i in range(nd)
    ]
    for c in range(10):
        base = texts[c * 4]
        for j in range(1, 4):
            texts[c * 4 + j] = base
    for i in range(40, 60):
        t = texts[70 + (i - 40)].split()
        # edit ONE token mid-document (a long-doc near-dup differs by a
        # vanishing fraction of its shingles — the hard recall case)
        t[len(t) // 2] = "edited"
        texts[i] = " ".join(t)
    texts[60] = ""  # below-SHINGLE_K sentinel stays exercised
    texts[61] = "solo"
    texts[62] = None
    _write(
        outdir, "documents",
        {"doc_id": list(range(1, nd + 1)),
         "text": texts,
         "lang": [LANGS[i] for i in rng.choice(5, nd)],
         "source": [f"src{int(v)}" for v in rng.integers(0, 20, nd)],
         "n_chars": [None if t is None else len(t) for t in texts]},
        {"doc_id": pa.int64(), "text": pa.string(), "lang": pa.string(),
         "source": pa.string(), "n_chars": pa.int64()},
        # 16-row groups → ~32 independent scan morsels: the md5-heavy
        # shingle oracles parallelize instead of running one thread for
        # >600 s each (see _write docstring). Single-row-group layout
        # coverage stays with the clean/nulls/tiny profiles.
        row_group_size=16,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=606)
    ap.add_argument("--profile", choices=["nulls", "clean", "tiny",
                                          "longdocs"],
                    default="nulls")
    ap.add_argument("--ts-encoding", choices=["us", "ns"], default="us",
                    help="physical encoding of events.ts (see "
                         "reencode_events_ns)")
    ap.add_argument("--keep", action="store_true",
                    help="reuse an existing generated dir")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    outdir = f"/tmp/fuzz_sf_{args.seed}_{args.profile}"
    if args.ts_encoding == "ns":
        outdir += "_ns"
    if not (args.keep and os.path.isdir(outdir)):
        if args.profile == "tiny":
            generate_tiny(outdir, args.seed)
        else:
            generate(outdir, args.seed, nulls=args.profile == "nulls")
            if args.profile == "longdocs":
                rewrite_documents_longdocs(outdir, args.seed)
        if args.ts_encoding == "ns":
            reencode_events_ns(outdir)
    print(f"fuzz fixture: {outdir} (seed={args.seed}, {args.profile})")

    import check_correctness as cc

    sys.argv = ["check_correctness.py", outdir, *args.queries]
    return cc.main()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main())
