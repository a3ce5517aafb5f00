package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.MigrationOps

/** Randomized (seeded) semantics tests for the generic MERGE kernel
  * ([[graft.ops.MigrationOps.mergeBatch]]): random snapshots and
  * change batches — including the edge classes the fixture-derived
  * catalog entry never produces (updates/deletes of absent keys,
  * null payload columns meaning "keep", empty batch, empty snapshot,
  * delete-everything) — compared row-for-row against a
  * from-first-principles Scala reference (the
  * ReconcilePropertySpec discipline).
  */
class CdcPropertySpec extends SparkSpec {

  private val rnd = new Random(1234)

  private def snapshotDf(rows: Seq[(Long, Long, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, p, s) => Row(k, p, s) }, 4),
      StructType(Seq(StructField("key", LongType),
        StructField("s_price", LongType), StructField("s_status", StringType))))

  private def changesDf(rows: Seq[(Long, String, Option[Long], Option[String])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, op, p, s) =>
        Row(k, op, p.map(Long.box).orNull, s.orNull) }, 4),
      StructType(Seq(StructField("key", LongType), StructField("op", StringType),
        StructField("c_price", LongType), StructField("c_status", StringType))))

  /** The independent reference: a plain Map fold. */
  private def reference(
      snap: Seq[(Long, Long, String)],
      chg: Seq[(Long, String, Option[Long], Option[String])])
      : Map[Long, (Option[Long], Option[String])] = {
    val base: Map[Long, (Option[Long], Option[String])] =
      snap.map { case (k, p, s) => k -> (Option(p), Option(s)) }.toMap
    chg.foldLeft(base) { case (acc, (k, op, p, s)) =>
      op match {
        case "delete" => acc - k
        case _ => // insert/update: per-column coalesce over the prior image
          val prior = acc.getOrElse(k, (None, None))
          acc + (k -> (p.orElse(prior._1), s.orElse(prior._2)))
      }
    }
  }

  test("mergeBatch equals the reference fold on randomized batches with all edge classes") {
    (1 to 6).foreach { round =>
      val keySpace = 40L
      val snap = (0L until keySpace).filter(_ => rnd.nextBoolean())
        .map(k => (k, rnd.nextInt(1000).toLong, s"s${rnd.nextInt(3)}"))
      // one op per key (the kernel's documented precondition), keys
      // drawn from the WHOLE space so absent-key updates/deletes occur
      val chg = rnd.shuffle((0L until keySpace).toList)
        .take(rnd.nextInt(keySpace.toInt))
        .map { k =>
          val op = Seq("insert", "update", "delete")(rnd.nextInt(3))
          val p = if (op == "delete" || rnd.nextInt(4) == 0) None
                  else Some(rnd.nextInt(1000).toLong)
          val s = if (op == "delete" || rnd.nextInt(4) == 0) None
                  else Some(s"c${rnd.nextInt(3)}")
          (k, op, p, s)
        }
      val got = MigrationOps
        .mergeBatch(snapshotDf(snap), changesDf(chg), Seq("price", "status"))
        .collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[String])))
        .toMap
      val want = reference(snap, chg)
      assert(got == want, s"round $round: got ${got.size} keys, want ${want.size}")
    }
  }

  /** Plain keyed frames (post-merge column shape) for the diff pair. */
  private def plainDf(rows: Seq[(Long, Option[Long], Option[String])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, p, s) =>
        Row(k, p.map(Long.box).orNull, s.orNull) }, 4),
      StructType(Seq(StructField("key", LongType),
        StructField("price", LongType), StructField("status", StringType))))

  private def randomPlain(keySpace: Long): Seq[(Long, Option[Long], Option[String])] =
    (0L until keySpace).filter(_ => rnd.nextBoolean()).map { k =>
      (k,
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(1000).toLong),
        if (rnd.nextInt(4) == 0) None else Some(s"s${rnd.nextInt(3)}"))
    }

  test("tableDiff/applyDiff roundtrip: applying the feed reconstructs the new snapshot exactly") {
    // arbitrary s0, s1 — including NULL payloads and non-null → null
    // transitions, the case per-column null-means-keep cannot express
    // and post-image semantics must survive
    (1 to 6).foreach { round =>
      val s0 = randomPlain(40L)
      val s1 = randomPlain(40L)
      val diff = MigrationOps.tableDiff(plainDf(s0), plainDf(s1),
        Seq("price", "status"))
      val rebuilt = MigrationOps.applyDiff(plainDf(s0), diff).collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[String]))).toMap
      val want = s1.map { case (k, p, s) => k -> (p, s) }.toMap
      assert(rebuilt == want, s"round $round: rebuilt ${rebuilt.size}, want ${want.size}")
      // and the feed is churn-sized: unchanged keys never appear
      val unchanged = s0.toSet & s1.toSet
      val feedKeys = diff.select("key").collect().map(_.getLong(0)).toSet
      assert(unchanged.forall { case (k, _, _) => !feedKeys.contains(k) })
    }
  }

  test("tableDiff inverts mergeBatch: the feed recovers the batch's effective rows") {
    val snap = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
    val chg = Seq(
      (1L, "update", Some(11L), None),         // effective: post-image (11, a)
      (2L, "delete", None, None),              // effective: delete
      (5L, "insert", Some(50L), Some("x")),    // effective: insert
      (3L, "update", None, Some("c")))         // NO-OP: coalesces to the same row
    val s0 = snapshotDf(snap)
      .withColumnRenamed("s_price", "price").withColumnRenamed("s_status", "status")
    val s1 = MigrationOps.mergeBatch(snapshotDf(snap), changesDf(chg),
      Seq("price", "status"))
    val feed = MigrationOps.tableDiff(s0, s1, Seq("price", "status")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[String]))).toSet
    // key 3's no-op update must NOT surface; the others surface with
    // post-images (key 1 keeps status 'a' through the coalesce)
    assert(feed == Set(
      (1L, "update", Some(11L), Some("a")),
      (2L, "delete", None, None),
      (5L, "insert", Some(50L), Some("x"))), feed.toString)
  }

  test("tableDiff on a key-only table yields an insert/delete-only feed") {
    // empty payload (a membership/tombstone set): no update can exist —
    // the feed is pure set difference, and the empty comparison chain
    // must fold to false, not crash on an empty reduce
    import org.apache.spark.sql.Row
    def keys(ks: Seq[Long]) = spark.createDataFrame(
      spark.sparkContext.parallelize(ks.map(Row(_)), 2),
      StructType(Seq(StructField("key", LongType))))
    val feed = MigrationOps.tableDiff(keys(Seq(1L, 2L)), keys(Seq(2L, 3L)), Nil)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed == Set((1L, "delete"), (3L, "insert")))
  }

  test("degenerate shapes: empty batch, empty snapshot, delete-everything") {
    val snap = Seq((1L, 10L, "a"), (2L, 20L, "b"))
    // empty batch → identity
    val id = MigrationOps.mergeBatch(snapshotDf(snap),
      changesDf(Nil), Seq("price", "status")).collect()
    assert(id.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // empty snapshot → inserts only
    val ins = MigrationOps.mergeBatch(snapshotDf(Nil),
      changesDf(Seq((5L, "insert", Some(50L), Some("x")))),
      Seq("price", "status")).collect()
    assert(ins.length == 1 && ins.head.getLong(0) == 5L && ins.head.getLong(1) == 50L)
    // delete everything (incl. an absent key — idempotent) → empty
    val none = MigrationOps.mergeBatch(snapshotDf(snap),
      changesDf(Seq((1L, "delete", None, None), (2L, "delete", None, None),
        (99L, "delete", None, None))),
      Seq("price", "status")).collect()
    assert(none.isEmpty)
  }
}
