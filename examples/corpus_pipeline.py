"""End-to-end LLM training-corpus preparation on the engine.

Runnable against the synthetic test corpus:

    python examples/corpus_pipeline.py [sf_dir] [warehouse_dir]

Walks the full production shape: quality gate -> benchmark decontamination
-> exact dedup -> MinHash near-dedup -> sequence packing -> shard layout,
then lands the result as a versioned dataset with save-time expectations
and prints the provenance DESCRIBE. Every step is the same operator the
oracle corpus certifies (d10/d19/d01/d02/d17/d22).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pandas_db_sdk_spark import DataFrameEngine, get_spark
from pandas_db_sdk_spark import pipeline
from pandas_db_sdk_spark.io import tables


def main(sf_dir: str, warehouse: str) -> None:
    spark = get_spark("corpus-pipeline-example")
    docs = tables(spark, sf_dir)("documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")  # stand-in eval set

    prepared = pipeline.prepare_corpus(
        docs,
        id_col="doc_id",
        text_col="text",
        min_quality=0.5,
        benchmark=bench,
        token_budget=512,
        n_shards=8,
    )

    eng = DataFrameEngine(spark, warehouse)
    eng.save(
        prepared,
        "training/corpus",
        expectations={
            "tokens_positive": "n_tokens > 0",
            "packed": "bin_idx IS NOT NULL AND shard IS NOT NULL",
        },
    )
    desc = eng.describe_dataset("training/corpus")
    n = eng.load("training/corpus", use_last=True).count()
    print(f"landed {n} packed rows across versions={len(desc['versions'])}")
    print("schema cols:", sorted(c["name"] for c in desc["schema"]["fields"])[:8], "...")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wh = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_wh_")
    main(sf, wh)
