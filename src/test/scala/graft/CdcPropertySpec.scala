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
