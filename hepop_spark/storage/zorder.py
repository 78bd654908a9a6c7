"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

The reference prunes files on exactly ONE dimension — time (its
metadata.json min/max zone maps, query.js:22-63, written at hepop.js:245-248).
Any predicate on another column (src_ip, user, value band) scans everything
in the time range. Z-ordering extends zone-map pruning to N dimensions: rows
are sorted by the bit-interleave of their (range-normalized) column values,
so each output file covers a small hyper-rectangle of the key space and
parquet row-group/file min-max statistics become selective on EVERY
clustered column at once — the same trick Delta/Iceberg OPTIMIZE ZORDER
uses, here as a plain write-path transform.

Everything is native column expressions (shift/and/or arithmetic — the
interleave unrolls to a fixed expression tree, JVM-side, codegen-able); the
only actions are one min/max aggregation per write to learn normalization
bounds. Layout cost: one repartitionByRange shuffle on the z-value — the
same single shuffle any clustered write pays.

At 100 TB: z-write each time partition independently (the time dimension
stays a directory partition; z-order handles the dimensions INSIDE it), so
the range shuffle is per-partition-bounded and embarrassingly parallel
across partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # per-dimension resolution: 2^16 cells per axis


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) integer cell space using the
    observed [lo, hi] range (degenerate range → cell 0)."""
    span = hi - lo
    scaled = F.when(
        span > 0,
        F.floor((col.cast("double") - lo) / span * ((1 << bits) - 1)),
    ).otherwise(F.lit(0))
    return scaled.cast("long")


def z_value(cells: list[Column], bits: int = BITS) -> Column:
    """Bit-interleave k cell coordinates into one Morton code.

    Bit i of dimension d lands at position i*k + d, so coarse bits of all
    dimensions dominate jointly — the locality property that makes min/max
    stats tight on every dimension. Unrolled shift/or expression tree:
    bits*k terms, all JVM arithmetic."""
    k = len(cells)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, cell in enumerate(cells):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * k + d)
            )
    return z


def _cell_sql(c: str, lo, hi, bits: int) -> str:
    """The _normalize expression as ONE SQL string (r13, the vecexpr
    pattern: the Column spelling of the unrolled interleave cost ~0.45 s
    of py4j round-trips per write). The [lo, hi] bounds are known driver
    literals here, so the degenerate-range branch folds at build time —
    exactly what when(span > 0, ...).otherwise(0) evaluates to with a
    literal span — and the doubles embed as CAST('<repr>' AS DOUBLE)
    (shortest-round-trip repr parses bit-identically to F.lit)."""
    if lo is None or hi is None or not (hi - lo > 0):
        return "CAST(0 AS BIGINT)"
    span = hi - lo
    return (f"CAST(floor((CAST(`{c}` AS DOUBLE) - CAST('{lo!r}' AS DOUBLE))"
            f" / CAST('{span!r}' AS DOUBLE) * {(1 << bits) - 1}) AS BIGINT)")


def with_zvalue(df: DataFrame, cols: list[str], bits: int = BITS,
                out_col: str = "_z") -> DataFrame:
    """Add the Morton code over ``cols`` (numeric), normalizing each by its
    observed min/max (one aggregation job, k min + k max — tiny result).

    The cell coordinates are materialized as named columns in one
    projection and the interleave is parsed from one SQL string over
    those attributes — identical arithmetic to z_value() (pinned by
    tests/test_zorder.py's Python-reference Morton check), built in two
    py4j calls instead of ~160."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).first()
    k = len(cols)
    zc = [f"_zc{d}" for d in range(k)]
    proj = df.select(
        "*",
        *[
            F.expr(_cell_sql(c, bounds[f"lo_{c}"], bounds[f"hi_{c}"], bits))
            .alias(zc[d])
            for d, c in enumerate(cols)
        ],
    )
    terms = " | ".join(
        f"shiftleft(shiftright({zc[d]}, {i}) & 1, {i * k + d})"
        for i in range(bits)
        for d in range(k)
    )
    return proj.withColumn(
        out_col, F.expr(f"CAST(0 AS BIGINT) | {terms}")
    ).drop(*zc)


def zorder_write(df: DataFrame, path: str, cols: list[str],
                 n_files: int = 8, bits: int = BITS,
                 mode: str = "overwrite") -> None:
    """Write ``df`` clustered on the z-curve over ``cols``: range-partition
    by z (each output file owns a contiguous z-range = small hyper-rect),
    sort within partitions so row groups inside a file are tight too, and
    drop the helper column before writing."""
    zdf = with_zvalue(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
