"""Single-round-trip spellings of the shared array-vector expressions.

The lambda-built ``F.aggregate(F.zip_with(...), lambda ...)`` form costs
~45 ms of py4j round-trips PER BUILD (every Python lambda goes through
``_create_lambda``, each a few dozen gateway calls); parsing the same
expression from one SQL string costs ~1.5 ms and yields the IDENTICAL
Catalyst expression — verified in tests/test_round12d.py by comparing
analyzed plans modulo expression ids and by exact result equality.

Query modules that build these expressions repeatedly per call (the ANN
scoring paths build them up to ~20 times per entry) use these helpers:
r12 optimization, guide §1.2 "per-task work" applied to the driver —
the bench times construction + execution, and construction was up to
half the wall for the quantized-ANN entries."""

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_cast2(a: str, b: str) -> Column:
    """sum_i CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE) over two array
    columns (bare column names) — the exact expression of the lambda form
    ``aggregate(zip_with(a, b, (x, y) -> x.cast*y.cast), lit(0.0), +)``."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0D, (acc, x) -> acc + x)"
    )


def norm2_cast(c: str) -> Column:
    """sum_i CAST(c[i] AS DOUBLE)^2 (no sqrt — callers wrap)."""
    return F.expr(
        f"aggregate(transform({c}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "0D, (acc, x) -> acc + x)"
    )
