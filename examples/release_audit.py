"""Corpus-release audit: the checks a training-data release runs LAST.

Runnable against the synthetic test corpus:

    python examples/release_audit.py [sf_dir] [warehouse_dir]

Composes the round-6 governance operators over a landed corpus:

1. per-source DATA CARD (d92)  — docs / token mass / dup rate / vocab
2. source-KL divergence (d89)  — which slice is distributionally unlike
                                  the rest (DoReMi-style reweight signal)
3. k-anonymity audit (d91)     — re-identifiable quasi-identifier groups
4. incremental dashboard rollup — a materialized per-source aggregate
   that future appends refresh in O(append), not O(corpus)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_db_sdk_spark import DataFrameEngine, get_spark
from pandas_db_sdk_spark import text
from pandas_db_sdk_spark.io import tables


def main(sf_dir: str, warehouse: str) -> None:
    spark = get_spark("release-audit-example")
    docs = tables(spark, sf_dir)("documents")

    print("== data card (per source) ==")
    from pandas_db_sdk_spark.corpus.llm import QUERIES as LLMQ

    LLMQ["d92_source_data_card"](spark, sf_dir).orderBy("source").show(
        8, truncate=False
    )

    print("== distributional divergence (KL vs corpus) ==")
    text.source_kl_divergence(docs, "text", "source").orderBy(
        "kl_vs_corpus", ascending=False
    ).show(8, truncate=False)

    print("== privacy gate (k-anonymity / l-diversity) ==")
    LLMQ["d91_k_anonymity_audit"](spark, sf_dir).show(truncate=False)

    print("== incremental rollup: land corpus, define, refresh, append ==")
    eng = DataFrameEngine(spark, warehouse)
    eng.save(docs, "release/docs")
    eng.define_rollup(
        "release/docs_by_source",
        "release/docs",
        ["source"],
        {"n_docs": ("count", None), "avg_quality": ("avg", "quality_score")}
        if "quality_score" in docs.columns
        else {"n_docs": ("count", None)},
    )
    print("refresh 1:", eng.refresh_rollup("release/docs_by_source"))
    # simulate tomorrow's append: one new micro-slice
    eng.save(docs.limit(10), "release/docs")
    print("refresh 2 (scans ONLY the append):",
          eng.refresh_rollup("release/docs_by_source"))
    eng.read_rollup("release/docs_by_source").orderBy("source").show(8)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wh = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="release_audit_")
    main(sf, wh)
