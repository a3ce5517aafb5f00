package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{DedupOps, TextOps}

/** Randomized (seeded) equivalence tests for the pipeline operators
  * whose semantics a single fixture can't pin: corpora are generated
  * with deliberate structure (shared segments, skewed language mixes)
  * and the operator output is compared against an independent
  * from-first-principles recompute in plain Scala — the same
  * reference-implementation discipline as ReconcilePropertySpec.
  */
class PipelinePropertySpec extends SparkSpec {

  private val rnd = new Random(42)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def writeDocs(rows: Seq[(Long, String, String)], name: String): String = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, lang, text) => Row(id, lang, text) }),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("lang", StringType), StructField("text", StringType))))
    val dir = s"$scratch/$name"
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_paragraph equals a brute-force recompute on random shared-segment corpora") {
    val segLen = DedupOps.ParaSegTokens
    (1 to 4).foreach { round =>
      // a shared pool of segments forces real cross-document duplication;
      // fresh segments and ragged tails exercise the boundaries
      val pool = (1 to 6).map(p => (1 to segLen).map(_ => s"p${p}w${rnd.nextInt(9)}").mkString(" "))
      val docs = (1L to 30L).map { id =>
        val nSegs = 1 + rnd.nextInt(4)
        val segs = (1 to nSegs).map { _ =>
          if (rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
          else (1 to segLen).map(_ => s"u${rnd.nextInt(50)}").mkString(" ")
        }
        val tail = if (rnd.nextBoolean()) " " + (1 to rnd.nextInt(segLen - 1).max(1))
          .map(_ => s"t${rnd.nextInt(9)}").mkString(" ") else ""
        (id, "en", segs.mkString(" ") + tail)
      }
      val dir = writeDocs(docs, s"para_prop_$round")
      // reference: segment, hash, first-occurrence by (doc_id, seg_idx)
      val allSegs = docs.flatMap { case (id, _, text) =>
        val tk = text.split(" ", -1)
        tk.grouped(segLen).zipWithIndex.map { case (seg, i) =>
          (id, i.toLong, md5hex(seg.mkString(" ")))
        }
      }
      val firstOf = allSegs.groupBy(_._3).view
        .mapValues(_.map(r => (r._1, r._2)).min).toMap
      val expected = allSegs.groupBy(_._1).view.mapValues { segs =>
        val dups = segs.count(s => firstOf(s._3) != ((s._1, s._2)))
        (segs.size.toLong, dups.toLong)
      }.toMap
      val got = DedupOps.dedupParagraph(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected, s"round $round: $got vs $expected")
    }
  }

  test("corpus_sample_weighted equals the first-principles keep-set on skewed mixes") {
    (1 to 3).foreach { round =>
      val langs = Seq("aa", "bb", "cc")
      // skewed mix: language i gets ~10×(i+1) docs of varying length
      val docs = langs.zipWithIndex.flatMap { case (lang, i) =>
        (1 to 10 * (i + 1) + rnd.nextInt(5)).map { j =>
          val text = (1 to 5 + rnd.nextInt(40)).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")
          (lang, text)
        }
      }.zipWithIndex.map { case ((lang, text), idx) => (idx.toLong, lang, text) }
      val dir = writeDocs(docs, s"wsample_prop_$round")
      // reference recompute: weights round-6 (Spark Round semantics:
      // BigDecimal.valueOf + HALF_UP), power-of-two threshold math
      val tokens = docs.groupBy(_._2).view
        .mapValues(_.map(_._3.split(" ", -1).length.toLong).sum).toMap
      val tot = tokens.values.sum
      val nLangs = tokens.size
      val keepSet = docs.filter { case (_, lang, text) =>
        val w6 = JBigDecimal.valueOf(tot.toDouble / (nLangs * tokens(lang)))
          .setScale(6, RoundingMode.HALF_UP).doubleValue()
        val cut = math.floor(math.min(1.0, w6 * TextOps.WeightedSampleRate)
          * 4503599627370496.0).toLong
        val h52 = java.lang.Long.parseLong(md5hex(text).substring(0, 13), 16)
        h52 < cut
      }.map(_._1).toSet
      val got = TextOps.corpusSampleWeighted(spark, dir).collect()
        .map(_.getLong(0)).toSet
      assert(got == keepSet, s"round $round: ${got.size} kept vs expected ${keepSet.size}")
      assert(keepSet.nonEmpty, s"round $round: vacuous keep-set")
    }
  }
}
