"""The end-to-end web-crawl → training-corpus pipeline (d116's demo form).

    python examples/crawl_pipeline.py [sf_dir]

One declarative DataFrame program over ``pipeline.crawl_corpus``:

    .warc.gz walk → HTTP-200 gate → RFC 9309 robots gate (wildcards,
    $-anchors, per-agent groups) → canonical-URL dedup → HTML
    boilerplate strip → language gate → gopher quality gate → MinHash
    near-dedup

The stages dict it returns is the audit surface: this script prints the
per-stage survivor funnel and a sample of the final corpus — the same
frames d116's invariants certify against DuckDB every round.

At 100 TB the only change is the source: replace the synthesized
``.warc.gz`` payloads with ``spark.read.format("binaryFile")`` over the
crawl bucket (or a table of fetched payloads); every stage downstream
is partition-parallel — the robots decision runs on a slim
(id, host, path) projection, bodies never enter a decision shuffle, and
the MinHash stage is band-blocked, never all-pairs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pandas_db_sdk_spark import get_spark, multimodal, pipeline
from pandas_db_sdk_spark.io import tables


def main(sf_dir: str) -> None:
    spark = get_spark("crawl-pipeline-example")
    d = tables(spark, sf_dir)("documents")

    # --- synthesize the crawl (stand-in for the fetch tier) -------------
    m260 = F.col("doc_id") % 260
    k = (m260 % 5).cast("string")
    d13 = (m260 % 13).cast("string")
    html = F.concat(
        F.lit("<html><head><title>doc "), F.col("doc_id").cast("string"),
        F.lit("</title><script>var x=1;</script></head><body>"),
        F.lit('<nav><a href="/">home</a></nav><div class="main"><p>'),
        F.col("text"),
        F.lit("</p></div><footer>(c) corpus</footer></body></html>"),
    )
    uri = F.concat(
        F.lit("https://www.site"), k, F.lit(".com/Docs/"), d13,
        F.lit("/doc"), m260.cast("string"),
        F.lit("?utm_source=feed"), (F.col("doc_id") % 2).cast("string"),
        F.lit("&q=1"),
    )
    src = d.select("doc_id", html.alias("html"), uri.alias("uri"))
    files = multimodal.synth_warc_gz(src, "html", "uri", "doc_id")
    parsed = multimodal.parse_warc(files, "payload", "doc_id")

    # --- politeness rules (per-domain robots.txt) ------------------------
    dis = (F.col("k") * 3) % 13
    robots = (
        d.select((F.col("doc_id") % 5).alias("k"))
        .distinct()
        .select(
            F.concat(
                F.lit("www.site"), F.col("k").cast("string"), F.lit(".com")
            ).alias("domain"),
            F.concat(
                F.lit("User-agent: otherbot\nDisallow: /\n\n"),
                F.lit("User-agent: corpusbot\n"),
                F.lit("Disallow: /Docs/"), dis.cast("string"), F.lit("/\n"),
                F.lit("Allow: /Docs/"), dis.cast("string"), F.lit("/doc9*\n\n"),
                F.lit("User-agent: *\nDisallow: /\n"),
            ).alias("robots_txt"),
        )
    )

    # --- the pipeline -----------------------------------------------------
    stages = pipeline.crawl_corpus(
        parsed, robots, agent="CorpusBot", languages=("en",),
        jaccard_threshold=0.5,
    )

    print("\nstage funnel:")
    prev = None
    for name, frame in stages.items():
        n = frame.count()
        drop = "" if prev is None else f"  (-{prev - n})"
        print(f"  {name:>15}: {n}{drop}")
        prev = n

    print("\nfinal corpus sample:")
    stages["final"].select(
        "doc_id", "canonical_url", "predicted_lang",
        F.substring("text", 1, 60).alias("text_head"),
    ).orderBy("doc_id").show(5, truncate=False)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
