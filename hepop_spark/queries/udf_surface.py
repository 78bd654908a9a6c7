"""User-defined-function surface: grouped Pandas aggregation
(applyInPandas) and a Python UDTF — the extension points the reference
lacks entirely (SURVEY §2 negative space: "no UDF/UDAF/UDTF registration
surface"), each verified against a pure-SQL oracle so the Python path is
held to the same hash gate as the built-ins.

pandas/numpy are imported at module scope — pandas_udf/applyInPandas type
hints must resolve at module level (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..catalog import load_table, register_views
from . import QuerySpec

# --- Grouped custom aggregation via applyInPandas ----------------------------


def grouped_mad_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """Median absolute deviation of doc length per source — a robust
    statistic Spark has no built-in for, computed as a GROUPED PANDAS
    aggregation (applyInPandas: one Arrow batch per group, numpy inside).
    numpy's even-n median is the mean of the two middles — the same
    continuous interpolation DuckDB's median/quantile_cont uses, so values
    hash-match bit-for-bit.

    Scale: one shuffle on the group key; each group must fit one worker's
    memory (fine for per-source stats; for huge groups pre-aggregate or
    switch to approx quantiles)."""
    docs = load_table(spark, sf, "documents").select("source", "n_chars")

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].to_numpy(dtype=np.float64)
        med = float(np.median(x))
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(x)],
                "median_chars": [round(med, 1)],
                "mad_chars": [round(float(np.median(np.abs(x - med))), 1)],
            }
        )

    return docs.groupBy("source").applyInPandas(
        mad, "source string, n_docs bigint, median_chars double, mad_chars double"
    )


GROUPED_MAD_SQL = """
WITH med AS (
    SELECT source, count(*) AS n_docs,
           median(CAST(n_chars AS DOUBLE)) AS med
    FROM documents GROUP BY source
)
SELECT d.source, m.n_docs,
       round(m.med, 1) AS median_chars,
       round(median(abs(CAST(d.n_chars AS DOUBLE) - m.med)), 1) AS mad_chars
FROM documents d JOIN med m ON d.source = m.source
GROUP BY d.source, m.n_docs, m.med
"""


# --- Python UDTF --------------------------------------------------------------


@udtf(returnType="sent_idx int, sentence string")
class SentenceSplit:
    """UDTF: one document row -> N (ordinal, sentence) rows, splitting on
    '. ' — the lateral-generator extension point (registered and callable
    from SQL, exceeding the reference's zero-UDF surface)."""

    def eval(self, text: str):
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            yield i, s


def sentence_split_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """Sentence segmentation via a registered Python UDTF invoked from SQL
    (LATERAL join), aggregated to per-document sentence stats so the
    output is compact. The oracle reproduces the split with DuckDB list
    functions — the UDTF's row fan-out must be byte-identical.

    Scale: UDTFs run per-partition like any generator — narrow map,
    Arrow-batched, no shuffle; the aggregate shuffles on doc_id only."""
    register_views(spark, sf, tables=("documents",))
    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql("""
        SELECT d.doc_id,
               CAST(count(*) AS BIGINT) AS n_sentences,
               CAST(max(length(s.sentence)) AS BIGINT) AS longest,
               md5(concat_ws('|', transform(
                   array_sort(collect_list(struct(s.sent_idx, s.sentence))),
                   x -> x.sentence))) AS sent_hash
        FROM documents d,
             LATERAL sentence_split(d.text) s
        GROUP BY d.doc_id
    """)


SENTENCE_UDTF_SQL = """
WITH sents AS (
    SELECT doc_id, unnest(string_split(text, '. ')) AS sentence,
           generate_subscripts(string_split(text, '. '), 1) AS i
    FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_sentences,
       CAST(max(length(sentence)) AS BIGINT) AS longest,
       md5(string_agg(sentence, '|' ORDER BY i)) AS sent_hash
FROM sents
GROUP BY doc_id
"""


# --- Co-grouped pandas: as-of join via merge_asof ----------------------------

_TS_FMT_PD = "%Y-%m-%d %H:%M:%S.%f"


def asof_join_cogroup(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME as-of join semantics as the window-composition `asof_join`
    (most recent click ≤ each purchase, per user), but through Spark's
    CO-GROUPED pandas API: purchases and clicks are co-partitioned by
    user, each group pair lands in one Arrow batch, and pd.merge_asof
    (backward, exact-match allowed ≡ ASOF's >=) does the alignment.
    The oracle is DuckDB's native ASOF LEFT JOIN — three implementations
    (window composition, cogroup pandas, native ASOF) must agree on the
    hash.

    Scale: one co-partitioning shuffle on user_id; each user's pair of
    frames must fit a worker (same bound as any cogroup)."""
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "purchase_ts", "click_ts"]
            )
        left = left.sort_values(["ts", "event_id"])
        right = (
            right.sort_values(["ts", "event_id"])[["ts"]]
            .rename(columns={"ts": "click_ts_raw"})
        )
        if right.empty:
            m = left.assign(click_ts_raw=pd.NaT)
        else:
            m = pd.merge_asof(
                left, right, left_on="ts", right_on="click_ts_raw",
                direction="backward",
            )
        return pd.DataFrame(
            {
                "event_id": m["event_id"],
                "user_id": int(key[0]),
                "purchase_ts": m["ts"].dt.strftime(_TS_FMT_PD),
                "click_ts": m["click_ts_raw"].dt.strftime(_TS_FMT_PD),
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            merge,
            "event_id bigint, user_id bigint, purchase_ts string, click_ts string",
        )
    )


# DuckDB native ASOF — identical to the window-composition oracle
ASOF_COGROUP_SQL = """
SELECT p.event_id AS event_id, p.user_id AS user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


QUERIES: dict[str, QuerySpec] = {
    "grouped_mad_pandas": QuerySpec(grouped_mad_pandas, GROUPED_MAD_SQL),
    "sentence_split_udtf": QuerySpec(sentence_split_udtf, SENTENCE_UDTF_SQL),
    "asof_join_cogroup": QuerySpec(asof_join_cogroup, ASOF_COGROUP_SQL),
}
