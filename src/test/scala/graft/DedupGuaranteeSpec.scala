package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** The DETECTION THEOREMS of the two sub-document dedup operators,
  * pinned as executable properties (the oracle gate proves both
  * engines agree; these prove the operators catch what their papers
  * promise they catch):
  *
  *  - Exact-substring (Lee et al., bounded): spans of
  *    [[DedupOps.SubstrSpanTokens]] tokens at EVERY alignment
  *    (stride 1), so any verbatim duplicated run of ≥ span-length
  *    tokens contains at least one fully-duplicated aligned span —
  *    in fact L − span + 1 of them.
  *
  *  - Winnowing (Schleimer et al.): with k-token shingles and
  *    w-window minima, any shared run of ≥ w + k − 1 tokens yields at
  *    least one shared fingerprint — the run contains a full window of
  *    identical shingle hashes in both documents, whose minimum is
  *    content-determined (md5 ties are negligible), so both documents
  *    keep it.
  *
  * Both tests plant duplicated runs inside otherwise-random filler and
  * use seeded randomness (deterministic failures). */
class DedupGuaranteeSpec extends SparkSpec {

  private val rnd = new Random(1234)

  /** Random filler tokens drawn from a wide space so accidental
    * cross-doc repeats of whole spans are impossible in practice. */
  private def filler(n: Int): Seq[String] =
    Seq.fill(n)(s"f${rnd.nextInt(1000000)}")

  test("exact-substring: every >= span-length verbatim run is detected") {
    import spark.implicits._
    val span = DedupOps.SubstrSpanTokens
    // 10 random trials: doc A carries the run; doc B embeds a verbatim
    // copy of runLen >= span tokens at a random offset inside its own
    // filler. Theorem: B has exactly runLen - span + 1 duplicated
    // aligned spans (its filler cannot collide with anything).
    val cases = (0 until 10).map { i =>
      val runLen = span + rnd.nextInt(30) // 50..79
      val run = Seq.fill(runLen)(s"r${i}_${rnd.nextInt(1000000)}")
      val aPad = filler(rnd.nextInt(20))
      val bPre = filler(rnd.nextInt(40))
      val bPost = filler(rnd.nextInt(40))
      val aId = 2L * i      // A first (smaller doc_id wins first-occurrence)
      val bId = 2L * i + 1
      (aId, bId, runLen,
        (aPad ++ run).mkString(" "),
        (bPre ++ run ++ bPost).mkString(" "))
    }
    val docs = cases.flatMap { case (aId, bId, _, aText, bText) =>
      Seq((aId, aText, "en", "srcA", aText.length.toLong),
        (bId, bText, "en", "srcB", bText.length.toLong))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft_substr_guarantee_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val result = SparkEntry.queries("dedup_substring")(spark, dir)
      .select("doc_id", "n_dup_spans").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (aId, bId, runLen, _, _) =>
      assert(result.getOrElse(aId, -1L) == 0L,
        s"doc $aId (first occurrence) flagged ${result.get(aId)} dup spans")
      val expected = runLen - span + 1L
      assert(result.getOrElse(bId, -1L) == expected,
        s"doc $bId: expected $expected dup spans for a $runLen-token run, " +
          s"got ${result.get(bId)}")
    }
  }

  test("winnowing: every shared run of >= w + k - 1 tokens shares a fingerprint") {
    import spark.implicits._
    val guarantee = DedupOps.WinnowK + DedupOps.WinnowW - 1
    val cases = (0 until 10).map { i =>
      val runLen = guarantee + rnd.nextInt(10)
      val run = Seq.fill(runLen)(s"w${i}_${rnd.nextInt(1000000)}")
      (2L * i, 2L * i + 1,
        (filler(5 + rnd.nextInt(20)) ++ run ++ filler(rnd.nextInt(10))).mkString(" "),
        (filler(rnd.nextInt(25)) ++ run ++ filler(5 + rnd.nextInt(15))).mkString(" "))
    }
    val docs = cases.flatMap { case (aId, bId, aText, bText) =>
      Seq((aId, aText), (bId, bText))
    }.toDF("doc_id", "text")
    val fps = DedupOps.winnowFpArraysHof(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    cases.foreach { case (aId, bId, _, _) =>
      val shared = fps(aId) & fps(bId)
      assert(shared.nonEmpty,
        s"docs $aId/$bId share a $guarantee+-token run but no fingerprint — " +
          "the winnowing guarantee is broken")
    }
    // and unrelated documents (pure filler) share nothing: pair docs
    // from different cases — their token spaces are disjoint
    val crossShared = fps(0L) & fps(3L)
    assert(crossShared.isEmpty, s"unrelated docs share fingerprints: $crossShared")
  }

  test("containment flags a subset duplicate that Jaccard under-scores") {
    import spark.implicits._
    // doc A = a 30-token run; doc B = the same run + 90 filler tokens.
    // Token-set containment is 1.0 while Jaccard is 30/120 = 0.25 —
    // which a 2x8 minhash band join by design never surfaces (that is
    // the point of this operator using the winnowing index instead).
    // Detection is DETERMINISTIC: a shared contiguous run of 30 >=
    // w+k-1 = 11 tokens yields >= ceil((30-11+1)/w) = 5 >= 2 shared
    // fingerprints, so every planted pair must be a candidate and
    // must read cont6 = 1.0 / subset_dup = 1.
    val rnd2 = new Random(99)
    val cases = (0 until 8).map { i =>
      val core = (0 until 30).map(j => s"c${i}_$j")
      val extras = (0 until 90).map(j => s"x${i}_${rnd2.nextInt(1000000)}_$j")
      (2L * i, 2L * i + 1, core.mkString(" "),
        (core ++ extras).mkString(" "))
    }
    val docs = cases.flatMap { case (aId, bId, aText, bText) =>
      Seq((aId, aText, "en", "srcA", aText.length.toLong),
        (bId, bText, "en", "srcB", bText.length.toLong))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft_containment_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("dedup_containment")(spark, dir).collect()
    val planted = cases.map { case (aId, bId, _, _) => (aId, bId) }.toSet
    val hits = rows.filter(r => planted.contains((r.getLong(0), r.getLong(1))))
    assert(hits.length == planted.size,
      s"only ${hits.length}/${planted.size} planted subset pairs detected — " +
        "the winnowing shared-run guarantee is broken")
    hits.foreach { r =>
      assert(r.getLong(2) == 30L, s"intersection ${r.getLong(2)} != 30")
      assert(r.getDouble(5) == 1.0, s"containment ${r.getDouble(5)} != 1.0")
      assert(r.getLong(6) == 1L, "subset_dup flag not set")
      // and the Jaccard view of the same pair is far below threshold
      val jacc = 30.0 / (r.getLong(3) + r.getLong(4) - 30.0)
      assert(jacc < 0.3, s"fixture broken: jacc $jacc not a subset shape")
    }
  }

  test("semantic decontamination: evidence == max cos over Hamming<=1 heldout pairs (sound + probe-complete)") {
    val sfDir = "/root/testdata/sf0.001"
    val out = DedupOps.dedupDecontaminateSemantic(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))), r.getBoolean(2)))
      .toMap

    // ground truth rebuilt driver-side, independent of the operator:
    // every train x held pair's cos6 (same fold order + HALF_UP round
    // as the dataflow) and the sign-bit bucket Hamming distance
    val bits = 8
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map { r =>
        val v = r.getSeq[Double](1).toArray
        val bucket = (0 until bits).map(i => if (v(i) >= 0) '1' else '0').mkString
        (r.getLong(0), v, math.sqrt(v.map(x => x * x).sum), bucket)
      }
    val (held, train) = all.partition(_._1 % 10 == 0)
    assert(train.nonEmpty && held.nonEmpty)
    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected: Map[Long, Option[Double]] = train.map { case (tid, tv, tn, tb) =>
      val near = held.flatMap { case (_, hv, hn, hb) =>
        val hd = tb.zip(hb).count { case (a, b) => a != b }
        if (hd > 1) None
        else {
          var dot = 0.0
          var i = 0
          while (i < tv.length) { dot += tv(i) * hv(i); i += 1 }
          Some(round6(dot / (tn * hn)))
        }
      }
      tid -> (if (near.isEmpty) None else Some(near.max))
    }.toMap

    assert(out.keySet == expected.keySet, "one verdict per train vector")
    for ((tid, (evidence, contaminated)) <- out) {
      assert(evidence == expected(tid),
        s"vec $tid: evidence $evidence != Hamming<=1 max ${expected(tid)}")
      assert(contaminated == evidence.exists(_ >= DedupOps.SemdedupTau),
        s"vec $tid: verdict/evidence mismatch")
    }
    // the data must exercise BOTH verdicts or the theorem is vacuous
    assert(out.values.exists(_._2) && out.values.exists(!_._2),
      s"fixture exercises one verdict only: ${out.values.count(_._2)} flagged")
  }
}
