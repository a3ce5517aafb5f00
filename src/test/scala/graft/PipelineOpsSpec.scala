package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{DedupOps, SimilarityOps, TextOps}

/** Behavior guards for the round-5-late pipeline operators: k-means,
  * SemDeDup, paragraph dedup, DSIR importance resampling. The oracle
  * gate pins cross-engine hashes; these specs pin the SEMANTICS the
  * hashes encode (argmin really is argmin, a drop really has an
  * earlier near neighbor, a dup segment really occurred before,
  * importance weights really prefer the target domain).
  */
class PipelineOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  // matches Spark's Round on DoubleType (BigDecimal.valueOf = shortest
  // decimal repr, then HALF_UP)
  private def round6(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  test("embedding_kmeans assigns every vector to one of K clusters, deterministically") {
    val out = SimilarityOps.embeddingKmeans(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 500)
    val clusters = out.map(_._2).toSet
    assert(clusters == (0L until SimilarityOps.KmeansK.toLong).toSet,
      s"expected ${SimilarityOps.KmeansK} live clusters, got $clusters")
    // no degenerate giant cluster: Lloyd's on this corpus balances
    val sizes = out.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.max < 200, s"degenerate clustering: $sizes")
    // determinism: a second full run (fresh literal chain) is identical
    val again = SimilarityOps.embeddingKmeans(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("embedding_kmeans matches a full driver-side Lloyd recompute") {
    // independent reimplementation of the whole chain: init = vectors of
    // the K lowest vec_ids, 2 iterations of (assign by round-6
    // |c|²−2·v·c with smaller-cluster tie-break, update = per-dim
    // round-6 mean), then a final assignment — compared exactly.
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def assign(cents: Seq[(Long, Array[Double])]): Map[Long, (Long, Double)] =
      vecs.map { case (id, v) =>
        var bestK = -1L; var bestD = Double.PositiveInfinity
        cents.foreach { case (k, c) =>
          val d = round6(dot(c, c) - 2.0 * dot(v, c))
          if (d < bestD) { bestK = k; bestD = d }
        }
        id -> ((bestK, bestD))
      }.toMap
    var cents: Seq[(Long, Array[Double])] =
      vecs.filter(_._1 < SimilarityOps.KmeansK).map { case (id, v) => (id, v) }
    for (_ <- 1 to SimilarityOps.KmeansIters) {
      val a = assign(cents)
      cents = vecs.groupBy { case (id, _) => a(id)._1 }.toSeq.sortBy(_._1)
        .map { case (k, members) =>
          val c = Array.tabulate(64) { i =>
            round6(members.map(_._2(i)).sum / members.length)
          }
          (k, c)
        }
    }
    val expected = assign(cents)
    val got = SimilarityOps.embeddingKmeans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == expected.size)
    got.foreach { case (id, cluster, d6) =>
      val (expK, expD) = expected(id)
      assert(cluster == expK, s"vec $id assigned $cluster, expected $expK")
      assert(d6 == expD, s"vec $id d6 $d6, expected $expD")
    }
  }

  test("dedup_semantic drop verdicts match a driver-side brute-force recompute") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val norm = rows.map { case (id, _, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val expected = rows.map { case (id, label, v) =>
      val earlier = rows.filter { case (oid, olabel, _) => olabel == label && oid < id }
      val maxCos = earlier.map { case (oid, _, ov) =>
        round6(dot(v, ov) / (norm(id) * norm(oid)))
      }.sorted.lastOption
      id -> ((maxCos, maxCos.exists(_ >= DedupOps.SemdedupTau)))
    }.toMap
    val got = DedupOps.dedupSemantic(spark, dir).collect()
      .map(r => (r.getLong(0),
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))), r.getBoolean(3)))
    assert(got.length == rows.length)
    got.foreach { case (id, maxCos, dropped) =>
      val (_, expCos, expDrop) = (id, expected(id)._1, expected(id)._2)
      assert(maxCos == expCos, s"vec $id: max_earlier_cos6 $maxCos != $expCos")
      assert(dropped == expDrop, s"vec $id: dropped $dropped != $expDrop")
    }
    assert(got.count(_._3) > 0, "tau marks nothing on this corpus — vacuous entry")
  }

  test("dedup_semantic_kmeans composes the learned clusters with the drop verdicts") {
    val assign = SimilarityOps.embeddingKmeans(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = DedupOps.dedupSemanticKmeans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))), r.getBoolean(3)))
    assert(rows.length == assign.size)
    // the operator's clusters ARE the k-means assignment
    rows.foreach { case (id, cluster, _, _) =>
      assert(cluster == assign(id), s"vec $id cluster $cluster != kmeans ${assign(id)}")
    }
    assert(rows.count(_._4) > 0, "tau marks nothing over the learned clusters — vacuous")
    // the first vector of every cluster can never be dropped
    rows.groupBy(_._2).foreach { case (c, members) =>
      val first = members.minBy(_._1)
      assert(!first._4 && first._3.isEmpty, s"cluster $c first ${first._1} has evidence")
    }
  }

  test("dedup_paragraph flags exactly the re-occurring segments, first occurrence wins") {
    val segLen = DedupOps.ParaSegTokens
    val seg1 = (1 to segLen).map(i => s"w$i").mkString(" ")
    val seg2 = (1 to segLen).map(i => s"x$i").mkString(" ")
    val seg3 = (1 to segLen).map(i => s"y$i").mkString(" ")
    val docsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(10L, s"$seg1 $seg2"),        // doc 10: segs [seg1, seg2]
        Row(20L, s"$seg3 $seg1"),        // doc 20: seg1 re-occurs -> dup
        Row(30L, seg2 + " tail tokens")  // doc 30: seg2 dup + short unique tail
      )),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val tmp = s"$scratch/para_docs"
    docsDf.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = DedupOps.dedupParagraph(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(10L) == ((2L, 0L, 0.0)), s"doc 10 got ${out(10L)}")
    assert(out(20L) == ((2L, 1L, 0.5)), s"doc 20 got ${out(20L)}")
    assert(out(30L) == ((2L, 1L, 0.5)), s"doc 30 got ${out(30L)}")
  }

  test("corpus_importance_dsir ranks target-domain documents above raw-domain ones") {
    val en = (1 to 40).map(i => Row(i.toLong, "en", "alpha common " * 10 + "alpha"))
    val de = (41 to 80).map(i => Row(i.toLong, "de", "beta common " * 10 + "beta"))
    val docsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(en ++ de),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("lang", StringType), StructField("text", StringType))))
    val tmp = s"$scratch/dsir_docs"
    docsDf.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextOps.corpusImportanceDsir(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 80) // TopK (100) exceeds the corpus — all rows emitted
    val enScores = out.filter(_._1 <= 40).map(_._3)
    val deScores = out.filter(_._1 > 40).map(_._3)
    assert(enScores.min > deScores.max,
      s"en docs (min ${enScores.min}) must outscore de docs (max ${deScores.max})")
    // selection order: the first 40 by score are exactly the en docs
    assert(out.sortBy(r => (-r._3, r._1)).take(40).forall(_._1 <= 40))
  }

  test("embedding_kmeans stream twin scores the stream identically to the batch assignment") {
    val batch = SimilarityOps.embeddingKmeans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val stream = SimilarityOps.embeddingKmeansStreamTwin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(stream.length == batch.length)
    assert(stream.sameElements(batch), "stream scoring diverged from batch assignment")
  }

  test("text_perplexity_bucket splits the corpus into ordered thirds") {
    val rows = TextOps.textPerplexityBucket(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val byBucket = rows.groupBy(_._3)
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // thirds by construction (percentile thresholds): each bucket holds
    // roughly a third of the scored docs
    byBucket.foreach { case (b, rs) =>
      assert(rs.length > rows.length / 5 && rs.length < rows.length / 2,
        s"bucket $b has ${rs.length} of ${rows.length}")
    }
    // ordering: every head score >= every middle score >= every tail score
    assert(byBucket("head").map(_._2).min >= byBucket("middle").map(_._2).max)
    assert(byBucket("middle").map(_._2).min >= byBucket("tail").map(_._2).max)
  }

  test("corpus_mix_rebalance weights invert token shares against a uniform target") {
    val rows = TextOps.corpusMixRebalance(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 5) // five languages in the corpus
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "shares must sum to ~1")
    // weight ~ target/actual: the largest share gets the smallest weight
    val byShare = rows.sortBy(_._4)
    assert(byShare.map(_._5).reverse.sameElements(byShare.map(_._5).sorted),
      s"weights not inverse-ordered to shares: $rows")
    // uniform target: share6 * weight6 ≈ 1/n_langs for every language
    rows.foreach { case (lang, _, _, share, weight) =>
      assert(math.abs(share * weight - 0.2) < 1e-4, s"$lang: $share * $weight != 0.2")
    }
  }

  test("corpus_mix_temperature stays finite when a language's round-6 share is zero") {
    import spark.implicits._
    // one language with 4M tokens, one with 1 token: the tail's true
    // share ≈ 2.5e-7 rounds to share6 = 0.0 — the pre-round-10 form
    // divided weight6 by share6 and emitted Infinity with
    // engine-divergent rendering; the kernel now divides by the
    // UNROUNDED share (as tshare6 × tot/lang), so every output is a
    // finite double on every input
    val big = (1 to 4000).map(i => ("en", Seq.fill(1000)("w").mkString(" ")))
    val tiny = Seq(("xx", "solo"))
    val docs = (big ++ tiny).toDF("lang", "text")
    val rows = TextOps.mixTemperature(docs).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (tshare, weight) = (r.getDouble(4), r.getDouble(5))
      assert(!weight.isNaN && !weight.isInfinite, s"non-finite weight: $r")
      assert(!tshare.isNaN && !tshare.isInfinite, s"non-finite tshare: $r")
    }
    val byLang = rows.map(r => r.getString(0) ->
      (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // the zero-share tail: share6 rounds to 0, so sqrt-micro-rounding
    // gives it r = 0 and tshare6 = 0 — down-weighted to 0, never blown
    // up to Infinity (the sampling law's T=2 smoothing only applies to
    // languages the share resolution can see at all)
    assert(byLang("xx")._1 == 0.0 && byLang("xx")._3 == 0.0, byLang.toString)
    // the head keeps weight ≈ 1 (it IS the corpus)
    assert(math.abs(byLang("en")._3 - 1.0) < 1e-4, byLang.toString)
  }

  test("ann_ivf_kmeans probes only the query's trained cell, ranked by cosine") {
    val assign = SimilarityOps.embeddingKmeans(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SimilarityOps.annIvfKmeans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, nid, bucket, _, rk) =>
      assert(assign(qid) == bucket && assign(nid) == bucket,
        s"pair ($qid,$nid) crosses cells: ${assign(qid)}/${assign(nid)} vs $bucket")
      assert(rk >= 1 && rk <= 3)
    }
    // within each query the ranks order by cosine descending
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val byRk = rs.sortBy(_._5).map(_._4)
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b }, s"qid $qid: $rs")
    }
  }

  test("corpus_sample_weighted rebalances kept counts toward the uniform target") {
    val kept = TextOps.corpusSampleWeighted(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perLang.keySet == Set("en", "de", "es", "fr", "zh"))
    // raw corpus is 218 en vs ~70 per other lang; the weighted sampler
    // must pull kept counts toward equality (~25 each at rate 0.25)
    perLang.foreach { case (lang, n) =>
      assert(n >= 10 && n <= 45, s"$lang kept $n — weighting broken: $perLang")
    }
    // deterministic: same keep-set on a re-run
    val again = TextOps.corpusSampleWeighted(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(kept.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("dedup_paragraph_rebuild reassembles only first-occurrence segments in order") {
    import java.security.MessageDigest
    def md5(s: String) = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val segLen = DedupOps.ParaSegTokens
    val seg1 = (1 to segLen).map(i => s"w$i").mkString(" ")
    val seg2 = (1 to segLen).map(i => s"x$i").mkString(" ")
    val seg3 = (1 to segLen).map(i => s"y$i").mkString(" ")
    val docsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(10L, s"$seg1 $seg2"),
        Row(20L, s"$seg3 $seg1"),        // seg1 dropped -> rebuilt text = seg3
        Row(30L, seg2 + " tail tokens")  // seg2 dropped -> rebuilt text = "tail tokens"
      )),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val tmp = s"$scratch/para_rebuild"
    docsDf.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = DedupOps.dedupParagraphRebuild(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(10L) == ((2L, 2L * segLen, md5(s"$seg1 $seg2"))), s"doc 10: ${out(10L)}")
    assert(out(20L) == ((1L, segLen.toLong, md5(seg3))), s"doc 20: ${out(20L)}")
    assert(out(30L) == ((1L, 2L, md5("tail tokens"))), s"doc 30: ${out(30L)}")
  }

  test("text_langid_confusion recall shares sum to 1 per labeled language") {
    val rows = TextOps.textLangidConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet == Set("en", "de", "es", "fr", "zh"))
    rows.groupBy(_._1).foreach { case (label, cells) =>
      assert(math.abs(cells.map(_._4).sum - 1.0) < 1e-4,
        s"$label recall shares: ${cells.toSeq}")
    }
    // the stopword heuristic must actually catch English
    val enDiag = rows.find(r => r._1 == "en" && r._2 == "en").map(_._4).getOrElse(0.0)
    assert(enDiag > 0.5, s"en→en recall $enDiag")
  }

  test("events_path_transitions probabilities sum to 1 per source type") {
    val rows = graft.ops.EventOps.queries.toMap.apply("events_path_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (from, cells) =>
      assert(math.abs(cells.map(_._4).sum - 1.0) < 1e-3, s"$from: ${cells.toSeq}")
      assert(cells.forall(_._3 > 0))
    }
  }

  test("events_tumbling stream twin equals the batch hourly aggregate") {
    val batch = graft.ops.EventOps.queries.toMap.apply("events_tumbling")(spark, dir)
      .select("hour", "n", "value_c").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val stream = graft.ops.EventOps.queries.toMap.apply("events_tumbling_stream_twin")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(stream.nonEmpty)
    assert(stream.sameElements(batch), "complete-mode stream diverged from batch hourly totals")
  }

  test("trigram backoff accounting: levels partition every trigram and scores are sane") {
    val rows = SparkEntry.queries("text_trigram_backoff")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTri, h3, h2, h1) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // every trigram lands in exactly one backoff level
      assert(h3 + h2 + h1 == nTri, s"doc ${r.getLong(0)}: $h3+$h2+$h1 != $nTri")
      // avg log-score of a probability-like quantity is strictly negative
      assert(r.getDouble(5) <= 0.0) // ln of a probability-like S; 0.0 exactly when every trigram is deterministic in train
    }
    // the held-out split must actually exercise backoff somewhere —
    // a corpus scored against itself would read hits3 == n_tri
    // everywhere and the entry would be testing nothing
    assert(rows.map(_.getLong(3)).sum + rows.map(_.getLong(4)).sum > 0,
      "no backoff ever fired — the eval/train split is broken")
  }

  test("corpus_importance_dsir top-k on the real corpus is en-dominated and bounded") {
    val out = TextOps.corpusImportanceDsir(spark, dir)
    val rows = out.collect()
    assert(rows.length == TextOps.DsirTopK)
    val langs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang")
    val enCount = out.join(langs, "doc_id").filter(col("lang") === "en").count()
    assert(enCount > TextOps.DsirTopK / 2,
      s"only $enCount of ${TextOps.DsirTopK} selected docs are target-domain")
  }
}
