"""The round-11 corpus-cleaning ladder, chained end to end.

Runnable against the synthetic test corpus:

    python examples/cleaning_ladder.py [sf_dir]

Order follows the public web-pipeline recipes (C4 / CCNet / RefinedWeb /
Lee et al.): cheap row-local audits first, cross-corpus dedup last —

  1. encoding audit   (d146, text.encoding_quality)  — drop mojibake docs
  2. C4 line filter   (d138, text.c4_line_filter)    — line/page rules
  3. corpus line dedup(d139, text.dedup_lines_corpus)— cross-page boilerplate
  4. duplicate spans  (d134, text.duplicate_spans)   — exact-substring cuts
  5. temperature mix  (d140, text.temperature_mix_weights) — sampling plan

Stages 1–3 stay ONE lazy DataFrame program (no action between them); the
span scan and the mix report are separate aggregates by nature. Each
stage's containment count prints so retention is auditable.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pandas_db_sdk_spark import get_spark, text
from pandas_db_sdk_spark.io import tables


def main(sf_dir: str) -> None:
    spark = get_spark("cleaning-ladder-example")
    docs = tables(spark, sf_dir)("documents")

    # 1. encoding audit: keep clean docs (the fixture corpus is clean, so
    #    this is a pass-through gate here — on scraped data it bites)
    enc = text.encoding_quality(docs, "doc_id", "text")
    clean = docs.join(
        enc.filter(~F.col("is_suspect")).select("doc_id"), "doc_id", "left_semi"
    )

    # 2. C4 line rules over synthesized lines (8-word chunks as lines)
    toks = F.split(F.col("text"), " ")
    lined = clean.select(
        "doc_id",
        "lang",
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(8)
                ),
                lambda s: F.concat(
                    F.array_join(F.slice(toks, s, 8), " "), F.lit(".")
                ),
            ),
            "\n",
        ).alias("text"),
    )
    c4 = text.c4_line_filter(lined, "doc_id", "text")
    kept = (
        c4.filter(F.col("doc_kept"))
        .select("doc_id", F.col("clean_text").alias("text"))
        .join(lined.select("doc_id", "lang"), "doc_id")
    )

    # 3. corpus-wide line dedup over the surviving lines
    lines = kept.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("line_no", "line")
    )
    deduped = text.dedup_lines_corpus(lines, "doc_id", "line_no", "line")

    # one job: every containment count of stages 1-3 in a single action
    report = deduped.join(kept.select("doc_id", "lang"), "doc_id").agg(
        F.count("*").alias("docs_after_c4"),
        F.sum("n_lines").alias("lines_in"),
        F.sum("n_kept_lines").alias("lines_kept"),
        F.sum((F.col("n_kept_lines") == 0).cast("int")).alias("hollow_docs"),
    )
    r = report.collect()[0]
    print(
        f"c4-kept docs={r.docs_after_c4} lines={r.lines_in}->{r.lines_kept} "
        f"hollow={r.hollow_docs}"
    )

    # 4. exact-substring duplicate spans over the deduped text
    spans = text.duplicate_spans(
        deduped.filter(F.col("n_kept_lines") > 0).select(
            "doc_id", F.col("dedup_text").alias("text")
        ),
        "doc_id",
        "text",
        length=30,
    )
    print(f"duplicate spans to cut: {spans.count()}")

    # 5. sampling plan for what survived
    mix = text.temperature_mix_weights(
        deduped.join(kept.select("doc_id", "lang"), "doc_id").filter(
            F.col("n_kept_lines") > 0
        ),
        "lang",
        alpha=0.3,
    )
    for row in mix.orderBy("lang").collect():
        print(
            f"lang={row.lang} n={row.cnt} p={row.natural_frac} "
            f"q={row.sampled_frac} w={row.weight}"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
