"""Build, persist, grow, query, and maintain an IVF-PQ ANN index.

    python examples/ann_serving.py [sf_dir] [index_dir]

The production lifecycle: train quantizers + encode the corpus once (an
ingest-time step), write the cid-partitioned inverted file, append new
vectors against the FROZEN quantizers, query with dynamic partition
pruning, and compact the fragmented tree (d03g's operator family).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pandas_db_sdk_spark import get_spark, similarity
from pandas_db_sdk_spark.io import tables


def main(sf_dir: str, index_dir: str) -> None:
    spark = get_spark("ann-serving-example")
    emb = tables(spark, sf_dir)("embeddings")
    corpus, latecomers = emb.filter(F.col("vec_id") >= 8), emb.filter(F.col("vec_id") < 8)

    cent, books, index = similarity.ivf_pq_index(
        corpus, "vec_id", "embedding", n_centroids=16, m_subspaces=8, n_codes=16
    )
    similarity.write_ivf_pq_index(index, index_dir)

    delta = similarity.ivf_pq_index_append(latecomers, cent, books, "vec_id")
    similarity.write_ivf_pq_index(delta, index_dir, mode="append")

    disk = similarity.read_ivf_pq_index(spark, index_dir)
    hits = similarity.ivf_pq_topk(
        latecomers, cent, books, disk, "vec_id", k=3, n_probes=4
    )
    top1 = {r.query_id: r.neighbor_id for r in hits.collect() if r.rn == 1}
    print("self-retrieval rank-1:", top1)

    report = similarity.compact_ivf_pq_index(spark, index_dir)
    print("compaction:", report)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    ix = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="ann_ix_") + "/ivf_pq"
    main(sf, ix)
