"""Round-13 optimization pins: every semantics-bearing rewrite this round
must be equivalence-pinned, not assumed.

1. catalog.local_result (Arrow driver path for pinned lifecycle results)
   returns BIT-IDENTICAL rows + schema to the plain createDataFrame(list)
   spelling across the nasty value classes (None, NaN, -0.0, unicode,
   int64 boundaries, empty input).
2. Per-row MinHash signing (array_min over a transform of the row's own
   shingle array) equals the former groupBy(doc_id).agg(min(md5)) over
   exploded occurrences, byte for byte, on adversarial docs (duplicate
   shingles, exactly-3-token docs, sub-3-token docs dropped).
3. Per-row shingle SETS (array_distinct of the transform) power the shared
   verification body: jaccard values equal the explicit exploded
   collect_set spelling.
"""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from hepop_spark.session import get_spark

    return get_spark("test-round13")


def _canon_rows(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(struct.pack(">d", v).hex())  # bitwise doubles
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


class TestLocalResult:
    def test_bit_identical_to_list_path(self, spark):
        from hepop_spark.catalog import local_result

        rows = [
            ("en", 2**63 - 1, 4.5),
            (None, None, float("nan")),
            ("é中 ", -(2**63), -0.0),
            ("", 0, 1e-308),
            ("tie", 7, 0.1 + 0.2),
        ]
        schema = "lang string, n bigint, x double"
        a = spark.createDataFrame(rows, schema)
        b = local_result(spark, rows, schema)
        assert a.schema == b.schema
        assert _canon_rows(a.collect()) == _canon_rows(b.collect())
        # NaN must survive as NaN (a pandas-mediated path folds it to null)
        got = [v for r in b.collect() for v in r]
        assert any(isinstance(v, float) and math.isnan(v) for v in got)

    def test_empty_and_structtype_schema(self, spark):
        from pyspark.sql.types import _parse_datatype_string

        from hepop_spark.catalog import local_result

        st = _parse_datatype_string("a string, b bigint")
        e = local_result(spark, [], st)
        assert e.collect() == [] and e.schema == st
        one = local_result(spark, [("x", 1)], st)
        assert [tuple(r) for r in one.collect()] == [("x", 1)]

    def test_row_objects_accepted(self, spark):
        from hepop_spark.catalog import local_result

        src = spark.createDataFrame([("a", 1), ("b", None)], "k string, v bigint")
        rows = src.collect()
        back = local_result(spark, rows, "k string, v bigint")
        assert _canon_rows(back.collect()) == _canon_rows(rows)


class TestPerRowSigning:
    DOCS = [
        (1, "a b c d e"),                  # plain
        (2, "x y z"),                      # exactly 3 tokens -> 1 shingle
        (3, "p q"),                        # sub-3 tokens -> dropped
        (4, "a b c a b c a b c"),          # heavy duplicate shingles
        (5, "zz zz zz zz"),                # identical shingles only
    ]

    def test_bands_equal_aggregated_reference(self, spark):
        from hepop_spark.queries.llm import (
            MINHASH_BAND_ROWS,
            MINHASH_SEEDS,
            _doc_shingles,
            _minhash_bands,
        )

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = sorted(map(tuple, _minhash_bands(_doc_shingles(docs)).collect()))

        # reference: the pre-r13 exploded groupBy(min(md5)) signing
        d = docs.withColumn("t", F.split("text", " "))
        sh_raw = d.filter(F.size("t") >= 3).select(
            "doc_id",
            F.explode(F.expr(
                "transform(sequence(0, size(t) - 3), "
                "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).alias("sh"),
        )
        sig = sh_raw.groupBy("doc_id").agg(*[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"mh{i}")
            for i in range(MINHASH_SEEDS)
        ])
        n_bands = MINHASH_SEEDS // MINHASH_BAND_ROWS
        ref = []
        for r in sig.collect():
            for b in range(n_bands):
                import hashlib

                key = ",".join(r[f"mh{b * MINHASH_BAND_ROWS + k}"]
                               for k in range(MINHASH_BAND_ROWS))
                ref.append((r["doc_id"], b,
                            hashlib.md5(key.encode()).hexdigest()))
        assert got == sorted(ref)
        # sub-3-token docs yield no bands at all
        assert all(doc != 3 for doc, _b, _k in got)

    def test_index_operator_matches_query_side(self, spark):
        """operators/minhash_index.minhash_bands (per-row, r13) must stay
        bit-equal to the query-side signing for the same params — the
        persisted store and the inline chain share one math."""
        from hepop_spark.operators.minhash_index import minhash_bands
        from hepop_spark.queries.llm import _doc_shingles, _minhash_bands

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        a = sorted(map(tuple, minhash_bands(docs, n_seeds=8, band_rows=2).collect()))
        b = sorted(map(tuple, _minhash_bands(_doc_shingles(docs)).collect()))
        assert a == b


class TestPerRowVerification:
    def test_jaccard_equals_exploded_collect_set_reference(self, spark):
        from hepop_spark.queries.llm import JACCARD_THRESHOLD, _verify_candidate_pairs

        docs = spark.createDataFrame(
            [
                (1, "a b c d e f"),
                (2, "a b c d e g"),     # near-dup of 1
                (3, "q r s t u v"),     # unrelated
                (4, "a b c d e f"),     # exact dup of 1
            ],
            "doc_id long, text string",
        )
        cands = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 4)], "da long, db long")
        got = sorted(map(tuple, _verify_candidate_pairs(docs, cands).collect()))

        # reference: exploded distinct shingles + collect_set
        d = docs.withColumn("t", F.split("text", " "))
        sh = d.filter(F.size("t") >= 3).select(
            "doc_id",
            F.explode(F.expr(
                "transform(sequence(0, size(t) - 3), "
                "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).alias("sh"),
        ).distinct()
        sets = {r["doc_id"]: set(r["s"]) for r in
                sh.groupBy("doc_id").agg(F.collect_set("sh").alias("s")).collect()}
        ref = []
        for da, db in [(1, 2), (1, 3), (1, 4), (2, 4)]:
            a, b = sets[da], sets[db]
            inter = len(a & b)
            jac = round(inter / (len(a) + len(b) - inter), 4)
            if jac >= JACCARD_THRESHOLD:
                ref.append((da, db, jac))
        assert got == sorted(ref)
