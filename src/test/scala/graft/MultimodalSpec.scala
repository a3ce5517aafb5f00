package graft

import graft.ext.Multimodal

/** Multimodal plumbing tests: schema, batch shape, deterministic stub
  * decode, and feature-vector readiness for the ANN path. */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("attachPayload produces binary payloads with typed metadata") {
    val recs = Multimodal.attachPayload(
      spark.read.parquet(s"$dir/documents.parquet"))
    val first = recs.head()
    assert(first.payload.nonEmpty)
    assert(first.mime.startsWith("application/x-fake-"))
    assert(recs.schema("payload").dataType.typeName == "binary")
  }

  test("extractFeatures is deterministic and preserves counts") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val feats = Multimodal.extractFeatures(Multimodal.attachPayload(docs))
    assert(feats.count() == n)
    val f1 = feats.filter(_.doc_id == 0L).head()
    val f2 = feats.filter(_.doc_id == 0L).head()
    assert(f1.feature.toSeq == f2.feature.toSeq) // deterministic stub
    assert(f1.feature.length == 8)
    assert(f1.n_bytes > 0 && f1.width >= 16 && f1.height >= 16)
  }

  test("pipeline output schema is ANN-ready (array<float> feature)") {
    val out = Multimodal.pipeline(spark, dir)
    assert(out.schema("feature").dataType.simpleString == "array<float>")
    assert(out.count() == 500)
  }
}
