"""Tokenizer training + distribution monitoring: the round-7 tier end to end.

Runnable against the synthetic test corpus:

    python examples/tokenizer_and_drift.py [sf_dir] [warehouse_dir]

1. BPE merge learning (d98)     — the Sennrich loop over vocabulary-sized
                                  state; first merge is oracle-certified
2. Kneser-Ney bigrams (d97)     — properly-smoothed LM probabilities for
                                  perplexity-gated filtering
3. batch PSI report (c95)       — monthly drift of a value distribution
                                  against the corpus decile reference
4. streaming drift monitor      — the same PSI/KS math as a continuous
                                  per-epoch alarm into the versioned
                                  warehouse (frozen reference profile)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pandas_db_sdk_spark import DataFrameEngine, get_spark
from pandas_db_sdk_spark import stats, text
from pandas_db_sdk_spark.io import tables


def main(sf_dir: str, warehouse: str) -> None:
    spark = get_spark("tokenizer-drift-example")
    t = tables(spark, sf_dir)
    docs = t("documents")

    print("== BPE merge rules (first 8, learned sequentially) ==")
    text.bpe_merges(docs, "text", n_merges=8).show(truncate=False)

    print("== batched BPE: 60 merges in ~4 rounds (top-20 disjoint batches) ==")
    merges, rounds = text.bpe_merges_batched(docs, "text", n_merges=60, batch=20)
    rounds.show(truncate=False)  # per-round head count + mass conservation
    merges.orderBy("rank").show(8, truncate=False)

    print("== apply the learned rules: per-source fertility/compression ==")
    text.bpe_encode_stats(docs, "text", "source", n_merges=4).orderBy(
        "source"
    ).show(6, truncate=False)

    print("== unigram-LM vocabulary (SentencePiece family, hard-EM) ==")
    pieces, em_rounds = text.unigram_lm_vocab(
        docs, "text", vocab_size=120, max_piece_len=4, em_iters=3
    )
    em_rounds.show(truncate=False)  # mass conserved exactly, NLL monotone
    pieces.orderBy("rank").show(8, truncate=False)

    print("== Kneser-Ney bigram model (top 10 by count) ==")
    text.kneser_ney_bigram(docs, "text", k=10).show(truncate=False)

    print("== monthly PSI of order value vs corpus deciles ==")
    orders = t("orders").select(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("month"),
        "o_totalprice",
    )
    stats.psi_report(orders, "month", "o_totalprice").orderBy(
        "psi", ascending=False
    ).show(6, truncate=False)

    print("== streaming drift monitor (events value vs frozen reference) ==")
    from pandas_db_sdk_spark.streaming.ingest import drift_monitor_into_engine

    eng = DataFrameEngine(spark, warehouse)
    events = t("events").limit(5000)
    stream_dir = os.path.join(warehouse, "_stream_src")
    events.coalesce(2).write.mode("overwrite").parquet(stream_dir)
    stream = (
        spark.readStream.schema(events.schema).parquet(stream_dir)
    )
    q = drift_monitor_into_engine(
        stream,
        eng,
        "monitor/events_value",
        reference=events,
        value_col="value",
        checkpoint_dir=os.path.join(warehouse, "_ckpt"),
    )
    q.awaitTermination()
    eng.load("monitor/events_value").show(truncate=False)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wh = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="pdb_wh_")
    main(sf, wh)
