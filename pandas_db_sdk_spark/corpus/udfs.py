"""UDF / UDAF / UDTF surface — SURVEY §2 C61–C65.

The reference's model makes arbitrary pandas code ubiquitous (the SDK hands
the user a whole pandas frame, client.py:176). Here the escape hatch is
Arrow-vectorized: pandas_udf / applyInPandas / mapInPandas — never
row-at-a-time Python. Each op still has SQL-expressible semantics so the
oracle can check values, proving the UDF path computes what the declarative
path would.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from ._util import registry, tables

QUERIES, ORACLE, q = registry()


@q(
    "c61_pandas_udf_scalar",
    """SELECT doc_id,
              length(text) - length(replace(text, ' ', '')) + 1 AS n_words,
              CAST(floor((length(text) - length(replace(text, ' ', '')) + 1) * 1.3 + 0.5) AS BIGINT)
                  AS est_tokens
       FROM documents""",
)
def c61(spark, sf_dir):
    """C61: scalar pandas UDF (Arrow-batched) — word count + a 1.3×-words
    token estimate, vectorized in pandas string ops."""

    @F.pandas_udf("long")
    def n_words(s: pd.Series) -> pd.Series:
        return s.str.count(" ").astype("int64") + 1

    import numpy as np

    @F.pandas_udf("long")
    def est_tokens(s: pd.Series) -> pd.Series:
        words = s.str.count(" ").astype("int64") + 1
        # floor(x+0.5): half-away-from-zero, matching SQL ROUND (pandas
        # .round is banker's and would disagree on exact .5 ties)
        return np.floor(words * 1.3 + 0.5).astype("int64")

    d = tables(spark, sf_dir)("documents")
    return d.select(
        "doc_id", n_words("text").alias("n_words"), est_tokens("text").alias("est_tokens")
    )


@q(
    "c62_apply_in_pandas",
    """SELECT event_id, user_id,
              row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS value_rank
       FROM events""",
)
def c62(spark, sf_dir):
    """C62: grouped-map applyInPandas (pandas groupby.apply) — per-user rank
    by value with a unique tiebreak, computed in pandas per group."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["value", "event_id"]).reset_index(drop=True)
        pdf["value_rank"] = pdf.index + 1
        return pdf[["event_id", "user_id", "value_rank"]]

    e = tables(spark, sf_dir)("events").select("event_id", "user_id", "value")
    return e.groupBy("user_id").applyInPandas(
        rank_group, "event_id long, user_id long, value_rank long"
    )


@q(
    "c63_grouped_agg_udaf",
    """SELECT l_returnflag,
              round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
                    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 6)
                  AS effective_rate
       FROM lineitem GROUP BY l_returnflag""",
)
def c63(spark, sf_dir):
    """C63: grouped-agg pandas UDAF — revenue-weighted effective discount
    rate. Decimal-exact numerator/denominator inside the UDF so the
    distributed result matches the single-node oracle."""
    from decimal import Decimal

    @F.pandas_udf("double")
    def effective_rate(price: pd.Series, disc: pd.Series) -> float:
        # Decimal accumulation → order-independent exact sums (matches oracle).
        num = sum(
            Decimal(str(round(p * (1 - d), 4))) for p, d in zip(price, disc)
        )
        den = sum(Decimal(str(round(p, 4))) for p in price)
        return round(float(num) / float(den), 6)

    li = tables(spark, sf_dir)("lineitem")
    return li.groupBy("l_returnflag").agg(
        effective_rate("l_extendedprice", "l_discount").alias("effective_rate")
    )


@q(
    "c64_map_in_pandas",
    """SELECT doc_id, lang, n_chars,
              CAST(n_chars AS DOUBLE) / (length(text) - length(replace(text, ' ', '')) + 1)
                  AS chars_per_word
       FROM documents""",
)
def c64(spark, sf_dir):
    """C64: mapInPandas (pandas `pipe`) — per-partition Arrow batch transform
    adding a derived column; the iterator shape never materializes a
    partition in memory."""

    def add_ratio(batches):
        for pdf in batches:
            words = pdf["text"].str.count(" ") + 1
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "n_chars": pdf["n_chars"],
                    "chars_per_word": pdf["n_chars"].astype("float64") / words,
                }
            )

    d = tables(spark, sf_dir)("documents")
    return d.mapInPandas(
        add_ratio, "doc_id long, lang string, n_chars long, chars_per_word double"
    )


@q(
    "c65_table_function",
    """SELECT doc_id, token, count(*) AS n
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       WHERE length(token) >= 8
       GROUP BY doc_id, token""",
)
def c65(spark, sf_dir):
    """C65: table function (1 row → N rows): explode tokenized text, then a
    per-document term count — the generator pattern UDTFs cover; explode is
    the codegen'd fast path."""
    d = tables(spark, sf_dir)("documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") >= 8)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("n"))
    )


@q(
    "c65b_python_udtf",
    """SELECT doc_id, word FROM (
         SELECT doc_id, unnest(string_split(text, ' ')) AS word
         FROM documents WHERE doc_id % 50 = 0)
       WHERE word <> ''""",
)
def c65b(spark, sf_dir):
    """C65 variant: real Python UDTF (Spark ≥3.5) applied via LATERAL —
    1 row → N rows with arbitrary Python per row. The declarative equivalent
    (explode(split())) is c65; this proves the imperative escape hatch
    computes the same table. Rows are pre-filtered (doc_id % 50) before the
    UDTF so the Python boundary sees 2% of the table — the filter stays
    JVM-side and prunes at the scan."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string")
    class SplitWords:
        def eval(self, text):
            if text:
                for w in text.split(" "):
                    if w:
                        yield (w,)

    spark.udtf.register("corpus_split_words", SplitWords)
    d = tables(spark, sf_dir)("documents").filter(F.col("doc_id") % 50 == 0)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """SELECT d.doc_id, t.word
           FROM docs_for_udtf d, LATERAL corpus_split_words(d.text) t"""
    )


@q(
    "c64b_map_in_arrow",
    """SELECT doc_id, n_chars, n_chars * 2 AS doubled,
              CAST(n_chars % 7 AS BIGINT) AS bucket
       FROM documents""",
)
def c64b(spark, sf_dir):
    """C64 variant: mapInArrow — the zero-copy batch escape hatch. The
    transform runs pyarrow.compute kernels directly on Arrow RecordBatches
    (no pandas conversion at all), the cheapest Python path Spark offers;
    use it when the logic is columnar kernels rather than pandas idioms."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def double_chars(batches):
        for batch in batches:
            n = batch.column("n_chars")
            seven = pa.scalar(7, n.type)
            # arrow has no mod kernel: n - (n // 7) * 7 (divide on ints truncates)
            mod = pc.subtract(n, pc.multiply(pc.divide(n, seven), seven))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    n,
                    pc.multiply(n, pa.scalar(2, n.type)),
                    pc.cast(mod, pa.int64()),
                ],
                ["doc_id", "n_chars", "doubled", "bucket"],
            )

    d = tables(spark, sf_dir)("documents").select("doc_id", "n_chars")
    return d.mapInArrow(
        double_chars, "doc_id long, n_chars long, doubled long, bucket long"
    )


@q(
    "c62b_cogroup_in_pandas",
    """SELECT seg, n_customers, n_orders,
              round(CAST(bal AS DOUBLE) / greatest(n_customers, 1), 6) AS avg_bal
       FROM (
         SELECT c.c_mktsegment AS seg,
                count(DISTINCT c.c_custkey) AS n_customers,
                CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal,
                COALESCE(o.n_orders, 0) AS n_orders
         FROM customer c
         LEFT JOIN (
             SELECT c2.c_mktsegment AS seg2, count(*) AS n_orders
             FROM orders o2 JOIN customer c2 ON o2.o_custkey = c2.c_custkey
             GROUP BY 1) o ON o.seg2 = c.c_mktsegment
         GROUP BY c.c_mktsegment, o.n_orders)""",
)
def c62b(spark, sf_dir):
    """C62 variant: cogrouped applyInPandas — pandas-side merge of TWO
    grouped relations per key (`groupBy().cogroup().applyInPandas`), the
    two-sided escape hatch. Each side arrives as its own pandas frame per
    key; Spark co-partitions both groupings in one exchange pair. The
    aggregate arithmetic runs in pandas to exercise the path; dedup-sum
    uses decimal so hash-compare holds."""
    t = tables(spark, sf_dir)
    cust = t("customer").select("c_mktsegment", "c_custkey", F.col("c_acctbal").cast("decimal(18,4)").alias("bal"))
    orders = (
        t("orders")
        .join(t("customer").select("c_custkey", "c_mktsegment"), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "o_orderkey")
    )

    def merge(key, cdf: pd.DataFrame, odf: pd.DataFrame) -> pd.DataFrame:
        n_cust = cdf["c_custkey"].nunique()
        bal = float(cdf["bal"].sum()) if len(cdf) else 0.0
        return pd.DataFrame(
            {
                "seg": [key[0]],
                "n_customers": [n_cust],
                "n_orders": [len(odf)],
                "avg_bal": [round(bal / max(n_cust, 1), 6)],
            }
        )

    return (
        cust.groupBy("c_mktsegment")
        .cogroup(orders.groupBy("c_mktsegment"))
        .applyInPandas(merge, "seg string, n_customers long, n_orders long, avg_bal double")
    )
