"""Impala-named builtin functions that Spark lacks (or names differently),
as thin Column-expression builders — JVM-side, whole-stage-codegen friendly,
never Python UDFs.

Reference registry: common/function-registry/impala_functions.py (the
authoritative list) and fe/.../catalog/BuiltinsDb.java:522-867. Each shim
cites its reference entry. Functions with identical Spark names (abs, upper,
concat_ws, ...) need no shim and are not listed.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# -- string (impala_functions.py:371-417) -----------------------------------

def strleft(col, n) -> Column:
    """strleft(s, n): leftmost n chars. Reference: impala_functions.py:382."""
    return F.substring(_c(col), 1, n)


def strright(col, n) -> Column:
    """strright(s, n): rightmost n chars. Reference: impala_functions.py:383."""
    return F.substring(_c(col), -n, n)


# -- conditional (impala_functions.py:422-485) -------------------------------

def zeroifnull(col) -> Column:
    """Reference: conditional-functions.cc zeroifnull."""
    return F.coalesce(_c(col), F.lit(0))


def nullifzero(col) -> Column:
    """Reference: conditional-functions.cc nullifzero."""
    return F.nullif(_c(col), F.lit(0))


def isnull(col, alt) -> Column:
    """Impala isnull(a, b) == ifnull == nvl. Reference: impala_functions.py:441-447."""
    return F.coalesce(_c(col), _c(alt) if isinstance(alt, (Column, str)) else F.lit(alt))


ifnull = isnull
nvl = isnull


def decode(col, *pairs, default=None) -> Column:
    """Impala decode(expr, s1, r1[, s2, r2...][, default]) — rewritten to CASE
    exactly like the reference FE (fe/.../analysis/CaseExpr.java:68-115)."""
    c = _c(col)
    expr = None
    it = iter(pairs)
    for search in it:
        result = next(it)
        cond = c.eqNullSafe(search if isinstance(search, Column) else F.lit(search))
        branch = result if isinstance(result, Column) else F.lit(result)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    if expr is None:
        return F.lit(default)
    return expr.otherwise(default if isinstance(default, Column) else F.lit(default))


# -- math (impala_functions.py:227-344) --------------------------------------

def quotient(a, b) -> Column:
    """Integer division (Impala `quotient`/DIV). Reference: impala_functions.py:318."""
    return (_c(a).cast("long") / _c(b).cast("long")).cast("long")


def is_inf(col) -> Column:
    """Reference: impala_functions.py:77-79 (is_inf)."""
    c = _c(col)
    return (c == float("inf")) | (c == float("-inf"))


# -- aggregates (BuiltinsDb.java:522-867) -------------------------------------

def ndv(col, rsd: float = 0.05) -> Column:
    """Impala ndv()/appx_count_distinct(): HyperLogLog estimate.

    Reference: aggregate-functions.cc:994-1013 (HLL precision 10, 1024
    registers). Spark's approx_count_distinct is HLL++ — same capability,
    different constants, so estimates differ from the reference and from
    DuckDB: correctness-checked rows-only (see queries) plus a relative-error
    bound test in tests/test_functions.py.
    """
    return F.approx_count_distinct(_c(col), rsd)


def group_concat(col, sep: str = ", ", *, sorted_: bool = True) -> Column:
    """Impala group_concat(expr[, sep]). Reference: BuiltinsDb.java:771-782.

    The reference's concat order is nondeterministic (insertion order per
    node); for testability we default to sorted order — the deterministic
    variant the reference's own tests force by sorting inputs.
    """
    lst = F.collect_list(_c(col))
    if sorted_:
        lst = F.array_sort(lst)
    return F.array_join(lst, sep)


def appx_median(col) -> Column:
    """Impala appx_median = reservoir-sample median (aggregate-functions.cc:723-858).
    Spark-native equivalent: percentile_approx at p=0.5."""
    return F.percentile_approx(_c(col), 0.5, 10000)


def distinctpc(col) -> Column:
    """Impala distinctpc: Flajolet-Martin probabilistic counting estimate of
    NDV (aggregate-functions.cc:860-992 PcUpdate/PcFinalize;
    BuiltinsDb.java:613-622). Spark has no PC sketch; HLL++ is the same
    capability with a tighter error bound, so — like ndv() — this maps to
    approx_count_distinct. Estimates differ from the reference constants:
    bounded-error test in tests/test_functions.py, not value equality."""
    return F.approx_count_distinct(_c(col))


def distinctpcsa(col) -> Column:
    """Impala distinctpcsa: PC stochastic-averaging variant
    (aggregate-functions.cc PcsaUpdate/PcsaFinalize; BuiltinsDb.java:624-633).
    Same mapping rationale as distinctpc."""
    return F.approx_count_distinct(_c(col))


def avg_timestamp(col) -> Column:
    """Impala avg(TIMESTAMP) -> TIMESTAMP (BuiltinsDb.java:759-768,
    aggregate-functions.cc TimestampAvgUpdate/Finalize). Spark's avg rejects
    timestamps, so: exact integer mean of microseconds-since-epoch, truncated
    to whole microseconds. The reference sums sub-second unix time as DOUBLE
    (lossy above ~2^53 µs-sums); the decimal sum here is exact at any scale
    and never overflows (DECIMAL(38,0) headroom >> count*µs for any real
    cluster), making the result deterministic under partition re-ordering —
    the property the driver's oracle compare needs."""
    us = F.unix_micros(_c(col)).cast("decimal(38,0)")
    # decimal/long division yields decimal (HALF_UP); floor() pins truncation
    # semantics identically on every engine for the non-negative epoch range.
    return F.timestamp_micros(F.floor(F.sum(us) / F.count(_c(col))).cast("long"))


# -- SQL-dialect name rewrites ------------------------------------------------
# Impala function name -> Spark SQL equivalent expression template, used by
# the dialect translator (impalatogo_spark.dialect) for SQL-string queries.
# `{0}`, `{1}`... are argument slots.
IMPALA_SQL_FUNCTION_REWRITES: dict[str, str] = {
    "strleft": "substring({0}, 1, {1})",
    "strright": "substring({0}, -({1}), {1})",
    "zeroifnull": "coalesce({0}, 0)",
    "nullifzero": "nullif({0}, 0)",
    "isnull": "coalesce({0}, {1})",
    "ifnull": "coalesce({0}, {1})",
    "nvl": "coalesce({0}, {1})",
    "ndv": "approx_count_distinct({0})",
    "appx_count_distinct": "approx_count_distinct({0})",
    # PC/PCSA sketches (BuiltinsDb.java:613-633) -> HLL++ (see distinctpc
    # docstring). ndv_no_finalize (BuiltinsDb.java:604-611) is deliberately
    # absent: it is the COMPUTE STATS INCREMENTAL internal that returns raw
    # HLL intermediate state — Spark's ANALYZE pipeline owns that exchange.
    "distinctpc": "approx_count_distinct({0})",
    "distinctpcsa": "approx_count_distinct({0})",
    # Impala's long-form variance aliases (BuiltinsDb.java:650-692); Spark
    # only spells variance/var_samp/var_pop.
    "variance_pop": "var_pop({0})",
    "variance_samp": "var_samp({0})",
    "appx_median": "percentile_approx({0}, 0.5)",
    "group_concat": "array_join(array_sort(collect_list({0})), {1})",
    "quotient": "CAST({0} AS BIGINT) DIV CAST({1} AS BIGINT)",
    "is_inf": "({0} = double('inf') OR {0} = double('-inf'))",
    "is_nan": "isnan({0})",
    "fnv_hash": "xxhash64({0})",  # different algorithm; documented in SURVEY §2.10
    "istrue": "coalesce({0}, false)",
    "isnottrue": "(NOT coalesce({0}, false))",
    "isfalse": "coalesce(({0}) = false, false)",
    "isnotfalse": "(NOT coalesce(({0}) = false, false))",
    "lcase": "lower({0})",
    "ucase": "upper({0})",
    "char_length": "length({0})",
    "dayname": "date_format({0}, 'EEEE')",
    # Utility (impala_functions.py:488-521). pid/sleep are daemon
    # introspection/testing hooks with no Spark analog — out of scope
    # (SURVEY §2.10); typeof/version/current_database are Spark natives.
    "user": "current_user()",
    "effective_user": "current_user()",
    # Impala's two-arg extract(ts, 'unit') (impala_functions.py:89) —
    # argument order is reversed vs date_part. The standard one-arg
    # extract(YEAR FROM ts) form arrives as a single argument and is left
    # for Spark to parse natively.
    "extract": "date_part({1}, {0})",
    # Decimal truncate (impala_functions.py:360-367): toward-zero at scale d
    # (CAST-to-BIGINT truncates toward zero; floor would round negatives
    # away). 1-arg form defaults d=0 via _DEFAULT_TRAILING_ARGS. Result is
    # DOUBLE, not DECIMAL (p/s widening already a documented divergence).
    "truncate": "(CAST(({0}) * pow(10, ({1})) AS BIGINT) / pow(10, ({1})))",
    "dtrunc": "(CAST(({0}) * pow(10, ({1})) AS BIGINT) / pow(10, ({1})))",
    # Null-test predicates (impala_functions.py:530-545): boolean-returning
    # twins of IS [NOT] NULL.
    "nullvalue": "(({0}) IS NULL)",
    "nonnullvalue": "(({0}) IS NOT NULL)",
    # Type-limit constants (impala_functions.py:55-70, UdfBuiltins::MaxInt
    # et al.) — zero-arg literals, typed. BIGINT min is spelled arithmetic-
    # ally: the bare literal would overflow the parser's positive range.
    "max_tinyint": "CAST(127 AS TINYINT)",
    "min_tinyint": "CAST(-128 AS TINYINT)",
    "max_smallint": "CAST(32767 AS SMALLINT)",
    "min_smallint": "CAST(-32768 AS SMALLINT)",
    "max_int": "CAST(2147483647 AS INT)",
    "min_int": "CAST(-2147483648 AS INT)",
    "max_bigint": "CAST(9223372036854775807 AS BIGINT)",
    "min_bigint": "CAST(-9223372036854775807 - 1 AS BIGINT)",
    # Decimal type introspection (impala_functions.py:350-351,
    # decimal-functions.h:31-32): DECIMAL-only in the reference; any other
    # input type yields NULL here. Spark has no static-type function, but
    # typeof() returns the DDL type string per row and constant-folds, so
    # the regex never runs per-row post-optimization.
    "precision": (
        "CAST(regexp_extract(typeof({0}), '^decimal\\\\((\\\\d+),(\\\\d+)\\\\)$', 1)"
        " AS INT)"
    ),
    "scale": (
        "CAST(regexp_extract(typeof({0}), '^decimal\\\\((\\\\d+),(\\\\d+)\\\\)$', 2)"
        " AS INT)"
    ),
}

# Timestamp arithmetic family (impala_functions.py:122-215): years/months/
# weeks/days/hours/minutes/seconds/milliseconds/microseconds/nanoseconds
# _add/_sub plus the Impala aliases add_months, date_add/adddate,
# date_sub/subdate. ALL return TIMESTAMP in Impala — Spark's own date_add
# returns DATE, so inside the dialect the Impala semantics win (no current
# query relied on Spark's). make_interval slots are (years, months, weeks,
# days, hours, mins, secs); sub-second units divide into the seconds slot.
# nanoseconds degrade to microsecond precision (Spark timestamp storage;
# SURVEY §8 known divergences).
_INTERVAL_TEMPLATES = {
    "years": "make_interval(({n}))",
    "months": "make_interval(0, ({n}))",
    "weeks": "make_interval(0, 0, ({n}))",
    "days": "make_interval(0, 0, 0, ({n}))",
    "hours": "make_interval(0, 0, 0, 0, ({n}))",
    "minutes": "make_interval(0, 0, 0, 0, 0, ({n}))",
    "seconds": "make_interval(0, 0, 0, 0, 0, 0, ({n}))",
    "milliseconds": "make_interval(0, 0, 0, 0, 0, 0, ({n}) / 1000)",
    "microseconds": "make_interval(0, 0, 0, 0, 0, 0, ({n}) / 1000000)",
    "nanoseconds": "make_interval(0, 0, 0, 0, 0, 0, ({n}) / 1000000000)",
}
for _unit, _iv in _INTERVAL_TEMPLATES.items():
    _ivt = _iv.format(n="{1}")
    IMPALA_SQL_FUNCTION_REWRITES[f"{_unit}_add"] = f"(({{0}}) + {_ivt})"
    IMPALA_SQL_FUNCTION_REWRITES[f"{_unit}_sub"] = f"(({{0}}) - {_ivt})"
IMPALA_SQL_FUNCTION_REWRITES["add_months"] = IMPALA_SQL_FUNCTION_REWRITES["months_add"]
for _alias in ("date_add", "adddate"):
    IMPALA_SQL_FUNCTION_REWRITES[_alias] = IMPALA_SQL_FUNCTION_REWRITES["days_add"]
for _alias in ("date_sub", "subdate"):
    IMPALA_SQL_FUNCTION_REWRITES[_alias] = IMPALA_SQL_FUNCTION_REWRITES["days_sub"]
