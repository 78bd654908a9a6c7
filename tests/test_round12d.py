"""Round-12 optimization pins: the one-round-trip SQL spellings of the
shared vector expressions (operators/vecexpr.py, similarity.bucket_sql)
must be EXACTLY the expressions the lambda builders produced — same
analyzed plan modulo expression ids / lambda variable names, and exact
(bit-level) result equality on real data. The optimization is driver-side
construction cost only; any semantic drift here would silently change
oracle-checked ANN results, so the old spellings are pinned here verbatim
as the reference."""

import re

import pytest
from pyspark.sql import functions as F


def _norm_plan(df) -> str:
    """Analyzed plan with expr ids and lambda variable names erased —
    alpha-renaming of lambda variables is the ONLY allowed difference
    between the two spellings."""
    s = df._jdf.queryExecution().analyzed().toString()
    s = re.sub(r"lambda '?\w+'?#\d+\w*", "L", s)
    return re.sub(r"#\d+", "#", s)


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        ([1.5, -2.25, 3.125, 0.0], [4.0, 5.5, -6.75, 1.0]),
        ([0.1, 0.2, 0.3, -0.4], [0.7, 0.8, 0.9, 0.25]),
        ([1e-9, -1e9, 3.3333333333333335, 7.0], [2.0, 1e-300, -1.0, 0.5]),
    ]
    return spark.createDataFrame(rows, "a array<double>, b array<double>")


class TestVecExprEquivalence:
    def test_dot_matches_lambda_form(self, vec_df):
        from hepop_spark.operators.vecexpr import dot_cast2

        old = F.aggregate(
            F.zip_with(
                F.col("a"), F.col("b"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        d_old = vec_df.select(old.alias("v"))
        d_new = vec_df.select(dot_cast2("a", "b").alias("v"))
        assert _norm_plan(d_old) == _norm_plan(d_new)
        r_old = [r[0] for r in d_old.collect()]
        r_new = [r[0] for r in d_new.collect()]
        assert r_old == r_new  # exact float equality — identical expression

    def test_norm2_matches_lambda_form(self, vec_df):
        from hepop_spark.operators.vecexpr import norm2_cast

        old = F.aggregate(
            F.transform(F.col("a"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        d_old = vec_df.select(old.alias("v"))
        d_new = vec_df.select(norm2_cast("a").alias("v"))
        assert _norm_plan(d_old) == _norm_plan(d_new)
        assert [r[0] for r in d_old.collect()] == [r[0] for r in d_new.collect()]


class TestBucketSqlEquivalence:
    def _old_bucket(self, vec_col, planes):
        """The pre-r12 lambda/literal builder, verbatim."""
        bucket = F.lit(0).cast("long")
        for i, plane in enumerate(planes):
            arr = F.array(*[F.lit(x) for x in plane])
            dot = F.aggregate(
                F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
        return bucket

    def test_bucket_ids_identical_on_embeddings(self, spark, sf_dir):
        from hepop_spark.catalog import load_table
        from hepop_spark.operators.similarity import _hyperplanes, bucket_sql

        emb = load_table(spark, sf_dir, "embeddings").limit(200)
        for seed in (42, 42 + 977):  # two real table seeds
            planes = _hyperplanes(64, 8, seed=seed)
            both = emb.select(
                "vec_id",
                self._old_bucket("embedding", planes).alias("old_b"),
                F.expr(bucket_sql("embedding", planes)).alias("new_b"),
            )
            bad = both.filter(F.col("old_b") != F.col("new_b")).count()
            assert bad == 0

    def test_hist_merge_matches_lambda_form(self, spark):
        """storage/rollup.merge_aggs hist merge: the parsed SQL spelling
        equals the pre-r12 nested-lambda builder — analyzed plans modulo
        lambda names, and exact merged-map equality."""
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, {1: 2, 5: 1}), (1, {1: 1, 7: 3}), (2, {0: 4})],
            "k int, sk map<bigint,bigint>",
        )
        zero = F.lit(0).cast("bigint")
        old = F.aggregate(
            F.collect_list(F.col("sk")),
            F.expr("map()").cast("map<bigint,bigint>"),
            lambda acc, m: F.map_zip_with(
                acc, m,
                lambda _k, v1, v2: F.coalesce(v1, zero) + F.coalesce(v2, zero),
            ),
        ).alias("sk")
        from hepop_spark.storage.rollup import merge_aggs

        new = merge_aggs([], hists=["sk"])[0]
        a = df.groupBy("k").agg(old)
        b = df.groupBy("k").agg(new)
        assert _norm_plan(a) == _norm_plan(b)
        ra = sorted((r["k"], sorted(r["sk"].items())) for r in a.collect())
        rb = sorted((r["k"], sorted(r["sk"].items())) for r in b.collect())
        assert ra == rb

    def test_literal_roundtrip_is_exact(self, spark):
        """CAST('<repr>' AS DOUBLE) must reproduce every plane double
        bit-for-bit (correctly-rounded parse of a shortest round-trip
        repr) — the literal encoding the SQL spelling relies on."""
        from hepop_spark.operators.similarity import _hyperplanes

        vals = [x for p in _hyperplanes(64, 8, seed=42) for x in p][:100]
        exprs = ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in vals)
        row = spark.sql(f"SELECT array({exprs}) AS a").collect()[0]
        assert list(row["a"]) == vals
