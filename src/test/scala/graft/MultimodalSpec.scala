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

  test("sampleFrames fans out the expected frame rows with exact checksums") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val recs = Multimodal.attachPayload(docs)
    val frames = Multimodal.sampleFrames(recs).collect()
    // independent reference on the driver from the raw payload bytes
    val byDoc = recs.collect().map(r => r.doc_id -> r.payload).toMap
    assert(frames.nonEmpty)
    frames.foreach { f =>
      val p = byDoc(f.doc_id)
      assert(f.n_frames == p.length / 64)
      assert(f.frame_idx % 2 == 0 && f.frame_idx < f.n_frames)
      val want = (f.frame_idx * 64 until f.frame_idx * 64 + 64)
        .map(i => (p(i) & 0xff).toLong).sum
      assert(f.checksum == want, s"doc ${f.doc_id} frame ${f.frame_idx}")
    }
    // fan-out arithmetic: every doc contributes ceil(nFrames/2) rows
    val wantRows = byDoc.values.map(p => (p.length / 64 + 1) / 2).sum
    assert(frames.length == wantRows)
  }

  test("resizeAll pins the nearest-neighbor index mapping, up- and down-sampling") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val recs = Multimodal.attachPayload(docs)
    val resized = Multimodal.resizeAll(recs).collect()
      .map(r => r.doc_id -> r).toMap
    val byDoc = recs.collect().map(r => r.doc_id -> r.payload).toMap
    assert(resized.size == byDoc.size)
    byDoc.foreach { case (id, p) =>
      val want = (0 until 64).map(k => (p((k.toLong * p.length / 64).toInt) & 0xff).toLong).sum
      assert(resized(id).resized_checksum == want, s"doc $id")
      assert(resized(id).n_bytes == p.length)
    }
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

  test("feature bucket occupancy is observable and the default bits split the corpus") {
    val feats = Multimodal.pipeline(spark, dir)
    // default bits (the documented scale policy, >= 8) — occupancy must
    // show a genuinely split corpus, not one or two mega-buckets
    val occ = Multimodal.featureBucketOccupancy(feats).collect()
      .map(r => r.getAs[Long]("n_docs") -> r.getAs[Long]("n_buckets"))
    val nBuckets = occ.map(_._2).sum
    val maxOcc = occ.map(_._1).max
    val total = feats.count()
    assert(nBuckets > 16, s"only $nBuckets buckets under the default bits")
    assert(maxOcc < total / 2,
      s"one bucket holds $maxOcc of $total vectors — bits policy broken")
    assert(occ.map { case (n, b) => n * b }.sum == total) // partition of corpus
  }

  test("decoded features flow into the bucketed ANN join end-to-end") {
    val feats = Multimodal.pipeline(spark, dir)
    // explicit narrow bits for the 500-doc stub corpus (8 would leave
    // near-singleton buckets and an empty join); production uses the
    // default >= 8 policy with featureBucketOccupancy as the check
    val nn = Multimodal.nearestNeighbors(feats, bits = 4, k = 3)
    val rows = nn.collect()
    assert(rows.nonEmpty)
    // per-query top-k contract
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.values.forall(_.length <= 3))
    byQ.values.foreach { g =>
      val ranked = g.sortBy(_.getAs[Long]("rk"))
      assert(ranked.map(_.getAs[Long]("rk")).toSeq == (1L to ranked.length).toSeq)
      // cosine non-increasing with rank
      assert(ranked.map(_.getAs[Double]("cos6")).toSeq
        .sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
    // centered sign-bit bucketing actually splits the corpus (the raw
    // non-negative features would collapse into a single bucket)
    assert(rows.map(_.getAs[String]("bucket")).distinct.length > 1)
    // spot-check one query against brute-force cosine within its bucket
    val feat0 = feats.collect().map(r =>
      r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Float]]("feature").toSeq.map(_.toDouble)).toMap
    val q = rows.head.getAs[Long]("qid")
    val qBucket = rows.filter(_.getAs[Long]("qid") == q)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      BigDecimal(d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    qBucket.foreach { r =>
      val expected = cos(feat0(q), feat0(r.getAs[Long]("nid")))
      assert(math.abs(expected - r.getAs[Double]("cos6")) < 1e-6,
        s"qid=$q nid=${r.getAs[Long]("nid")}: $expected vs ${r.getAs[Double]("cos6")}")
    }
  }
}
