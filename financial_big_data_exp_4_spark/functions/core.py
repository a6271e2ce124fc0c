"""Native column-expression rewrites of the reference's scalar UDFs, plus
exact-arithmetic aggregation helpers.

The reference ships three row-at-a-time Python UDFs (SURVEY.md §2.6 U1-U3).
Each one forces a ``BatchEvalPython`` node into the physical plan: rows are
serialized JVM→Python-worker→JVM, whole-stage codegen is split, and Catalyst
cannot push predicates through the opaque function. The rewrites below are
pure Column expressions — they inline into the scan stage, stay inside
codegen, and cost nothing extra at 100 TB.

Exact-arithmetic helpers: floating-point SUM is not associative, so a
distributed sum of doubles depends on partitioning. For money columns
(2-decimal-exact by construction) we aggregate exact DECIMAL cents and cast
the final result to double — bit-identical under any partitioning, and
hash-comparable against a single-threaded oracle engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# U1/U2 — ¥1000 bucketing (reference nb2 cell 6, README.md:131-138)
# ---------------------------------------------------------------------------

def bucket_edge(value: Column | str, width: int = 1000) -> Column:
    """Left edge of the fixed-width bucket containing ``value``.

    Reference semantics: ``c = value // width; left = c * width`` (Python
    floor-division in UDF ``total_loan_classify``). ``F.floor`` on the same
    double division reproduces it exactly, as a codegen'd expression.
    """
    return (F.floor(_col(value) / F.lit(width)) * F.lit(width)).cast("long")


def bucket_label_from_edge(edge: Column, width: int = 1000) -> Column:
    """Render the reference's bucket label ``(left,right)`` (paren notation,
    semantics ``[left, right)`` — README.md:131-135)."""
    return F.concat(
        F.lit("("),
        edge.cast("string"),
        F.lit(","),
        (edge + F.lit(width)).cast("string"),
        F.lit(")"),
    )


def bucket_label(value: Column | str, width: int = 1000) -> Column:
    """U1 ``total_loan_classify`` rewritten native: value → '(c*w,(c+1)*w)'."""
    return bucket_label_from_edge(bucket_edge(value, width), width)


def parse_bucket_left_edge(label: Column | str) -> Column:
    """U2 ``total_loan_sort`` rewritten native: ``int(s.split(',')[0][1:])``
    (README.md:136-138) → the label's left endpoint as a long."""
    return F.split(F.substring(_col(label), 2, 2**30), ",")[0].cast("long")


# ---------------------------------------------------------------------------
# U3 — work_year grammar parser (reference nb2 cell 29, README.md:224-233)
# ---------------------------------------------------------------------------

def parse_work_year(c: Column | str) -> Column:
    """U3 ``work_year_process`` rewritten native.

    Grammar: NULL → -1; contains '10+' → 11; contains '<' → 0;
    otherwise ``int(first space-separated token)`` ('N year(s)' → N).
    The when-chain keeps null-handling explicit (F2) and lets Catalyst fold
    the parse into the scan stage, so a downstream filter on the parsed
    value is evaluated without any Python round-trip (unlike the reference,
    where the filter cannot push through the opaque UDF).
    """
    c = _col(c)
    return (
        F.when(c.isNull(), F.lit(-1))
        .when(c.contains("10+"), F.lit(11))
        .when(c.contains("<"), F.lit(0))
        .otherwise(F.split(c, " ")[0].cast("int"))
        .cast("int")
    )


# ---------------------------------------------------------------------------
# E1/E2 — interest arithmetic with the reference's float32 semantics
# ---------------------------------------------------------------------------

def interest_expr(
    year_of_loan: Column | str, monthly_payment: Column | str, total_loan: Column | str
) -> Column:
    """Task 3-2 total interest: ``year*monthly*12 - total`` computed in
    float32 (the reference casts to FloatType at README.md:202-204; golden
    values like 1840.6006 are float32 artifacts — SURVEY §2 E2). Result is
    presented as double (exact widening of the float32 value)."""
    y = _col(year_of_loan).cast("float")
    m = _col(monthly_payment).cast("float")
    t = _col(total_loan).cast("float")
    return (y * m * F.lit(12).cast("float") - t).cast("double")


# ---------------------------------------------------------------------------
# A2/E3/E4 — group share with banker's rounding
# ---------------------------------------------------------------------------

def share_expr(group_count: Column, total_count: Column, scale: int = 4) -> Column:
    """Task 3-1 per-group share, ``bround(cnt/total, 4)`` (HALF_EVEN —
    reference uses ``f.bround`` at README.md:189). The reference computed
    the share by summing ``lit(1/300000)`` per row (visible fp drift,
    nb2 cell 18); we compute ``count/total`` — same declared output at
    every golden value (SURVEY note B), exact under any partitioning."""
    return F.bround(group_count / total_count, scale)


# ---------------------------------------------------------------------------
# Exact distributed aggregation over money / fixed-point values
# ---------------------------------------------------------------------------

def exact_money_sum(c: Column | str, out_scale: int = 2) -> Column:
    """SUM over a 2-decimal money column, exact and partitioning-invariant.

    Each value is cast to DECIMAL(38,2) — wide enough that any double's
    integral magnitude (< 1.8e308 is out of range, but every money value a
    2-dp column can exactly hold is < 2^53/100 ≈ 9e13) fits without the
    silent NULL-on-overflow a narrow DECIMAL(18,2) cast produces under
    non-ANSI mode (round-1 ADVICE). DECIMAL sums are associative, so the
    distributed result is bit-identical to a sequential engine's. At 100 TB
    this costs one extra cast per row inside codegen — negligible against
    the shuffle it protects.
    """
    return F.sum(_col(c).cast(f"decimal(38,{out_scale})")).cast("double")


def fixed_point_sum(c: Column | str, scale_digits: int = 6) -> Column:
    """SUM over an arbitrary double via fixed-point rounding to ``d``
    fractional digits, deterministic under any partitioning.

    Routed through DECIMAL(38,d): the per-row cast rounds (HALF_UP) to
    ``d`` digits *exactly* (no double-multiply pre-step — the round-1
    ADVICE flagged that ``floor(x * 10^d)`` loses exactness once
    ``|x| * 10^d`` exceeds 2^53 and that a BIGINT accumulator wraps
    silently), and the DECIMAL(38,d) accumulator holds ~10^(38-d) before
    overflow — at d=6 that is 10^32, unreachable even summing 10^15 rows of
    10^16-magnitude values. Associative, hence partition-invariant.
    """
    return F.sum(_col(c).cast(f"decimal(38,{scale_digits})")).cast("double")


# ---------------------------------------------------------------------------
# Deterministic hashing / splitting shared with the SQL oracle
# ---------------------------------------------------------------------------

#: Largest prime below 2^30 squared fits BIGINT; standard Mersenne-ish modulus.
_SPLIT_MODULUS = 1_000_000_007
#: Knuth's multiplicative constant (2^32 * golden ratio conjugate).
_SPLIT_MULTIPLIER = 2_654_435_761

#: Public aliases — the ONE definition of the engine's multiplicative-hash
#: constants. Every operator module (sampling, stratification, LSH plane
#: derivation) and every generated oracle imports these; a local literal
#: copy would let the engine and oracle drift independently.
HASH_MODULUS = _SPLIT_MODULUS
HASH_MULTIPLIER = _SPLIT_MULTIPLIER


def det_hash_mod(key: Column | str, buckets: int) -> Column:
    """Deterministic bucket id in ``[0, buckets)`` from an integer key.

    ``((key mod P) * K) mod P mod buckets`` with P = 1e9+7 and K = Knuth's
    multiplier. All arithmetic stays in BIGINT and never exceeds
    P * K < 2.7e18 < 2^63, so Spark and any ANSI-SQL engine (the DuckDB
    oracle) compute bit-identical results at every key magnitude — unlike
    ``randomSplit``, whose output depends on the physical partition layout
    (round-1 ADVICE). Scale: pure codegen'd arithmetic, no shuffle, no RNG
    state, reproducible on any cluster topology.
    """
    k = _col(key).cast("long")
    # pmod, not %: Spark's % follows the dividend's sign, so a negative
    # key would yield a negative bucket and silently pass every
    # `bucket < threshold` filter downstream. pmod pins [0, P); the later
    # mods then stay nonnegative. Values are unchanged for nonneg keys.
    h = (F.pmod(k, F.lit(_SPLIT_MODULUS)) * F.lit(_SPLIT_MULTIPLIER)) % F.lit(
        _SPLIT_MODULUS
    )
    return (h % F.lit(buckets)).cast("long")


def det_hash_mod_sql(key_sql: str, buckets: int) -> str:
    """The ANSI-SQL rendering of :func:`det_hash_mod` for oracle parity."""
    # (x % P + P) % P = Spark's pmod — sign-safe for negative keys
    return (
        f"(((({key_sql}) % {_SPLIT_MODULUS} + {_SPLIT_MODULUS})"
        f" % {_SPLIT_MODULUS}) * {_SPLIT_MULTIPLIER})"
        f" % {_SPLIT_MODULUS} % {buckets}"
    )


def floor_div_sql(col_sql: str, divisor: int) -> str:
    """Integer FLOOR division (toward −∞) as a Spark-SQL expression.

    Spark's ``DIV`` truncates toward ZERO, so a pre-epoch (negative)
    timestamp would land in a double-width bucket straddling zero — an
    event at −0.5 h bucketed as hour 0. DuckDB's integer ``//``
    truncates the same way (``-7 // 2 = -3`` — NOT floor), so the
    oracles use the mirrored ``oracle_ext.duck_floor_div``; every
    time-bucketing site must floor on BOTH engines or the differential
    gate breaks on pre-epoch data. ``a − pmod(a, d)`` is
    exactly divisible by ``d`` and equals ``floor(a/d)·d``, and the
    arithmetic stays in BIGINT (no double round-trip — exactness at
    ~1.7e18 ns magnitudes requires integer ops).
    """
    return f"((({col_sql}) - pmod(({col_sql}), {divisor})) DIV {divisor})"


def train_test_split_col(key: Column | str, train_pct: int = 80) -> Column:
    """Deterministic 'train'/'test' tag from an integer key (task-4 M5
    ``randomSplit([0.8, 0.2])`` re-expressed partition-invariantly)."""
    return F.when(
        det_hash_mod(key, 100) < F.lit(train_pct), F.lit("train")
    ).otherwise(F.lit("test"))


# ---------------------------------------------------------------------------
# Deterministic 64-bit hashing shared with the SQL oracle
# ---------------------------------------------------------------------------

def md5_hash64(c: Column | str) -> Column:
    """Deterministic unsigned-52-bit hash of a string: the first 13 hex
    digits of md5, parsed as an integer.

    Why md5 and 13 digits: md5 is available and bit-identical in Spark and
    in ANSI-SQL oracles (DuckDB), so sketch operators built on it (minhash,
    simhash, fingerprints) are cross-engine checkable; 13 hex digits = 52
    bits fits exactly in both BIGINT and the IEEE-double mantissa, so no
    overflow/precision divergence anywhere. Spark's builtin xxhash64 is
    faster but engine-private; use it when oracle parity is not required.
    """
    return F.conv(F.substring(F.md5(_col(c)), 1, 13), 16, 10).cast("long")


def bind_once(col: Column, body) -> Column:
    """Evaluate ``col`` ONCE per row and pass it to ``body`` as a bound
    higher-order-function lambda variable.

    ``transform(array(col), x -> body(x))[1]`` — the single-element
    wrapper exists purely to name the value. Needed because splicing a
    Python ``Column`` variable into a HOF lambda duplicates its whole
    expression SUBTREE at every reference, and higher-order functions
    are ``CodegenFallback``: the interpreted evaluator re-computes the
    lambda body per ELEMENT, so an expensive shared input (e.g.
    ``split(text, '')``) degrades the enclosing operator to
    O(elements × cost(input)) per row. Found round 11: the shingle
    stage's char array re-split the full text once per shingle position
    — O(len²) per document, a 945-CPU-second single task at the 100×
    capped-recall fixture. Binding via a lambda variable evaluates the
    input once; inner lambdas may reference the outer variable (nested
    HOF lambdas are first-class in Spark SQL).
    """
    return F.element_at(F.transform(F.array(col), body), 1)
