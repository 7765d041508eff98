"""The fused webtext pass as a STREAMING quality gate: the same
``webtext_signals`` plan (one Arrow kernel, broadcast NB/LM/bench sides)
applied to a ``readStream`` source under ``Trigger.AvailableNow`` must
equal the batch run on the same input — the shape a crawl-ingest
pipeline runs it in (score each micro-batch as it lands; the models are
batch side inputs trained on fixed seed corpora)."""

from __future__ import annotations

from pyspark.sql import functions as F

from marc_solr_profiling_spark.corpus import generate_web_pages
from marc_solr_profiling_spark.functions.webtext_pass import webtext_signals


def test_streaming_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = (
        generate_web_pages(spark, 120, seed=23, partitions=3)
        .withColumn("doc_id",
                    F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"))
        .select("doc_id", "text")
    )
    docs.write.parquet(src, mode="overwrite")

    pos = docs.filter("doc_id % 7 = 0")
    neg = docs.filter("doc_id % 7 = 1")
    ref = docs.filter("doc_id % 5 = 0")

    def signals(df):
        return webtext_signals(
            df, n_hashes=4, ref_docs=ref,
            nb_pos_docs=pos, nb_neg_docs=neg,
        )

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    (signals(stream)
     .writeStream.format("parquet")
     .option("path", out).option("checkpointLocation", ckpt)
     .trigger(availableNow=True).start().awaitTermination(300))

    got = {r["doc_id"]: tuple(r) for r in spark.read.parquet(out).collect()}
    want = {r["doc_id"]: tuple(r)
            for r in signals(spark.read.parquet(src)).collect()}
    assert got == want and len(got) > 100

    # a second drain with no new files must add nothing (checkpointed)
    (signals(spark.readStream.schema("doc_id long, text string").parquet(src))
     .writeStream.format("parquet")
     .option("path", out).option("checkpointLocation", ckpt)
     .trigger(availableNow=True).start().awaitTermination(300))
    assert spark.read.parquet(out).count() == len(got)
