"""Change-data-capture out of the engine: incremental consumers without
corpus rescans.

    python examples/cdc_replication.py [sf_dir]

The production loop this demonstrates (engine.stream_changes — the
consumer-side twin of streaming.stream_into_engine):

  1. a producer appends versions to a dataset (here: two batches of
     orders),
  2. a CHECKPOINTED consumer drains the change feed and maintains a
     downstream artifact — a filtered replica plus a running aggregate —
     touching ONLY the new files each run,
  3. the consumer restarts after another append and processes just the
     delta (the file source's seen-files log is the resume cursor),
  4. the incremental aggregate equals a from-scratch recompute.

At 100 TB the difference is the whole game: the feed lists new files per
trigger instead of rescanning the corpus, so consumer cost is
append-proportional — the same economics refresh_rollup gets from
version-pruned scans, generalized to ANY downstream job.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pandas_db_sdk_spark import get_spark
from pandas_db_sdk_spark.engine import DataFrameEngine
from pandas_db_sdk_spark.io import tables


def main(sf_dir: str) -> None:
    spark = get_spark("cdc-replication-example")
    work = tempfile.mkdtemp(prefix="cdc_example_")
    eng = DataFrameEngine(spark, os.path.join(work, "wh"))
    ck = os.path.join(work, "ck")

    orders = tables(spark, sf_dir)("orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    day1 = orders.filter(F.col("o_orderkey") % 3 != 0)
    day2 = orders.filter(F.col("o_orderkey") % 3 == 0)

    eng.save(day1, "orders_raw", external_key="day1")

    def run_consumer() -> int:
        """Drain the feed once (availableNow); return rows processed."""
        seen = {"n": 0}

        def sink(batch_df, _epoch):
            if batch_df.isEmpty():
                return
            seen["n"] = batch_df.count()
            # A catch-up batch can span SEVERAL appended versions (the
            # consumer was down while the producer kept appending), so
            # save each version's urgent subset under its OWN external
            # key — labeling the whole batch with the first row's
            # __version would mislabel the rest.  overwrite_version is
            # then replay-idempotent per version.  (Don't combine this
            # sink with maxFilesPerTrigger: splitting one version across
            # batches would make the overwrite clobber the earlier part —
            # stream_changes' availableNow default delivers whole
            # versions.)
            versions = sorted(
                r[0] for r in batch_df.select("__version").distinct().collect()
            )
            for v in versions:
                urgent = batch_df.filter(
                    (F.col("__version") == v)
                    & (F.col("o_orderpriority") == "1-URGENT")
                )
                eng.save(
                    urgent.drop("__version"),
                    "orders_urgent_replica",
                    external_key=str(v),
                    overwrite_version=True,  # replay-idempotent
                )

        q = (
            eng.stream_changes("orders_raw")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return seen["n"]

    n1 = run_consumer()
    print(f"consumer run 1: processed {n1} rows (day1 backfill)")

    eng.save(day2, "orders_raw", external_key="day2")
    n2 = run_consumer()
    print(f"consumer run 2: processed {n2} rows (day2 delta only)")
    assert n2 == day2.count(), "resume must deliver exactly the delta"

    # the incrementally-maintained replica equals a from-scratch filter
    replica = eng.load("orders_urgent_replica").count()
    direct = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    print(f"urgent replica rows: {replica} (from-scratch: {direct})")
    assert replica == direct

    # and the engine's own incremental rollup rides the same appends
    eng.define_rollup(
        "orders_by_priority", "orders_raw", ["o_orderpriority"],
        {"n": ("count", None), "revenue": ("sum", "o_totalprice")},
    )
    print("rollup refresh:", eng.refresh_rollup("orders_by_priority"))
    eng.read_rollup("orders_by_priority").orderBy("o_orderpriority").show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
