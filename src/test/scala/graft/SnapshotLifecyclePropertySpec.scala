package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** Model-checked randomized sequences over the round-17 verbs: a
  * seeded RNG drives append / MOR delete / MOR update / optimize /
  * truncate / restore against a table AND a driver-side model
  * (key → value per version); afterwards EVERY surviving version's
  * read must equal its model — then the whole table REHOMES and the
  * same per-version equality must hold at the new location (the
  * manifest rewrite + sidecar rewrite under arbitrary interleavings
  * of masks, rewrites, truncates, and restores). Deterministic seeds,
  * so a failure replays exactly. */
class SnapshotLifecyclePropertySpec extends SparkSpec {

  private def readModel(dir: String, v: Long): Map[Long, Long] =
    SnapshotLog.read(spark, dir, asOf = Some(v)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def df(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "v").repartition(2)
  }

  test("random verb sequences: every version reads its model, before and after rehome") {
    for (seed <- Seq(7L, 23L)) {
      val rnd = new scala.util.Random(seed)
      val dir = s"$scratch/prop_$seed"
      var nextKey = 0L
      def freshBatch(n: Int): Seq[(Long, Long)] = {
        val b = (nextKey until nextKey + n).map(k => k -> rnd.nextLong(1000))
        nextKey += n
        b
      }
      // version -> model state
      val models = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Long]]
      SnapshotLog.commit(spark, dir, df(freshBatch(24)))
      models += readModel(dir, 0L) // trust v0 once; everything after is modeled
      var cur = models.head
      (1 to 10).foreach { _ =>
        val live = cur.keys.toSeq.sorted
        rnd.nextInt(7) match {
          case 0 => // append fresh keys
            val b = freshBatch(1 + rnd.nextInt(8))
            SnapshotLog.commitAppend(spark, dir, df(b))
            cur = cur ++ b
          case 1 => // MOR delete some keys; a miss-delete (no live
            // keys, right after a truncate) publishes an unchanged
            // version — the model stands still
            val picks = rnd.shuffle(live).take(1 + rnd.nextInt(4))
            if (picks.isEmpty)
              SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(-1L))
            else {
              SnapshotLog.deleteWhereInMOR(spark, dir, "k", picks)
              cur = cur -- picks
            }
          case 2 => // MOR update some keys to a constant
            val picks = rnd.shuffle(live).take(1 + rnd.nextInt(4))
            val nv = rnd.nextLong(1000)
            if (picks.isEmpty) {
              SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(-1L))
              // no live keys: a miss-delete publishes an unchanged version
            } else {
              SnapshotLog.updateWhereInMOR(spark, dir, "k", picks,
                Map("v" -> lit(nv)))
              cur = cur ++ picks.map(_ -> nv)
            }
          case 3 => // maintenance rewrite: content-identical. On an
            // EMPTY table optimize is a version-less no-op (by design
            // since r17) — publish a miss-delete instead so every loop
            // step still lands exactly one version for the model
            if (cur.isEmpty)
              SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(-1L))
            else
              SnapshotLog.optimize(spark, dir, targetRecordsPerFile = 1000)
          case 4 => // truncate: metadata-only empty
            SnapshotLog.truncate(dir)
            cur = Map.empty
          case 5 => // restore to a random surviving version
            val target = rnd.nextInt(models.size).toLong
            SnapshotLog.restore(dir, target)
            cur = models(target.toInt)
          case 6 => // rebucket: content-identical bucket(n, k) rewrite
            // (the SPJ layout verb) — on an EMPTY table it refuses by
            // design, publish a miss-delete instead (one version per
            // loop step, like the optimize arm)
            if (cur.isEmpty)
              SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(-1L))
            else
              SnapshotLog.rebucket(spark, dir, "k", 2 + rnd.nextInt(3))
        }
        models += cur
        assert(SnapshotLog.latestVersion(dir).contains(models.size - 1L),
          s"seed=$seed: version drift — model=${models.size - 1}, " +
            s"log=${SnapshotLog.latestVersion(dir)}")
      }
      // every version reads its model
      models.zipWithIndex.foreach { case (m, v) =>
        val got = readModel(dir, v.toLong)
        assert(got == m, s"seed=$seed v=$v: ${got.size} vs model ${m.size}")
      }
      // rehome, then the SAME per-version equality at the new location
      val moved = s"$scratch/prop_${seed}_moved"
      SnapshotLog.rehome(spark, dir, moved)
      models.zipWithIndex.foreach { case (m, v) =>
        val got = readModel(moved, v.toLong)
        assert(got == m, s"seed=$seed v=$v post-rehome: ${got.size} vs ${m.size}")
      }
    }
  }
}
