package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** The MERGE-ON-READ cost model, measured: COW [[SnapshotLog
  * .deleteWhereIn]] vs MOR [[SnapshotLog.deleteWhereInMOR]] on the
  * same table/keys, plus the read-side price of the mask and the
  * [[SnapshotLog.compactDeletes]] bill that retires it.
  *
  * The shape that matters at 100 TB: a point delete whose keys land in
  * MANY large files (the unclustered GDPR queue). COW pays a rewrite
  * of every file the stats+bloom stages cannot exonerate — O(affected
  * bytes); MOR pays one scan of the same files plus a sidecar of
  * O(matching rows) — the scan is unavoidable either way (the rows
  * must be FOUND), so the delta is exactly the rewrite I/O, and it
  * grows with file size while the MOR bill does not. Reads then pay
  * the anti-join until compaction; the compaction itself costs what
  * the COW delete would have, but batched across every delete since
  * the last one (k deletes: COW pays k rewrites, MOR pays one).
  *
  * Ladder: N rows in F files, delete K keys spread across all files
  * (worst case for pruning). Reports seconds for cowDelete /
  * morDelete / read(clean) / read(masked) / compact. Run:
  * `sbt "runMain graft.tools.MorBench"` (defaults N=8M, F=16, K=64).
  * Results in SCALING.md + NOTES_r15.md. */
object MorBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("MOR_N", "8000000").toLong
    val nFiles = sys.env.getOrElse("MOR_FILES", "16").toInt
    val k = sys.env.getOrElse("MOR_K", "64").toInt
    // row-width multiplier: the COW bill is the REWRITE of affected
    // bytes, so widening rows separates the two cost models (MOR's
    // sidecar stays K rows whatever the width)
    val pay = sys.env.getOrElse("MOR_PAY", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("mor_bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val root = Files.createTempDirectory("graft_mor_bench_").toString
    try {
      // keys spread across every file: id-clustered layout, keys at a
      // fixed stride — stats exonerate nothing, the worst COW case
      def mkTable(sub: String): String = {
        val t = s"$root/$sub"
        SnapshotLog.commit(spark, t,
          spark.range(n).repartitionByRange(nFiles, col("id")).select(
            col("id").as("key"),
            repeat(md5(col("id").cast("string")), pay).as("pay"),
            (col("id") % 97).as("v")))
        t
      }
      val keys: Seq[Any] = (0 until k).map(i => i.toLong * (n / k) + 7L)

      val cowT = mkTable("cow")
      val (_, cowSec) = timed(SnapshotLog.deleteWhereIn(spark, cowT, "key", keys))

      val morT = mkTable("mor")
      val (_, morSec) = timed(SnapshotLog.deleteWhereInMOR(spark, morT, "key", keys))

      def readAll(t: String): Long = SnapshotLog.read(spark, t)
        .agg(count(lit(1)), sum("v")).collect()(0).getLong(0)
      // warm + measure (median of 3)
      def med(f: => Double): Double = Seq(f, f, f).sorted.apply(1)
      val cleanSec = med(timed(readAll(cowT))._2)
      val maskedSec = med(timed(readAll(morT))._2)
      require(readAll(cowT) == readAll(morT),
        "COW and MOR must agree on the surviving rows")

      val (_, compactSec) = timed(SnapshotLog.compactDeletes(spark, morT))
      val cleanAfter = med(timed(readAll(morT))._2)

      // MERGE: the same K keys as a churn feed (half updates, half
      // deletes, a few inserts) — COW rewrites every touched file's
      // survivors, MOR masks + appends the post-images
      import org.apache.spark.sql.DataFrame
      def mergeFeed: DataFrame = {
        val ks = keys.map(_.asInstanceOf[Long])
        val del = ks.take(k / 2).map(x => (x, "delete", null: String, 0L))
        val upd = ks.drop(k / 2).map(x => (x, "update", "post", -1L))
        val ins = (0 until 8).map(i => (n * 2 + i, "insert", "new", -2L))
        import spark.implicits._
        (del ++ upd ++ ins).toDF("key", "op", "pay", "v")
          .select(col("key"), col("op"), col("pay"), col("v"))
      }
      val cowM = mkTable("cowm")
      val (_, cowMergeSec) = timed(SnapshotLog.mergeInto(spark, cowM, mergeFeed, "key"))
      val morM = mkTable("morm")
      val (_, morMergeSec) = timed(SnapshotLog.mergeIntoMOR(spark, morM, mergeFeed, "key"))
      require(readAll(cowM) == readAll(morM),
        "COW and MOR merge must agree on the surviving rows")

      // INDEXED rung: a stats-blind (scrambled-key) layout with a
      // bloom index on the key, and a POINT-shaped delete (few keys):
      // the MOR marks scan's candidate set is INDEX-pruned, so the
      // delete bill rides the index's kept-file count, not the table's
      // file count — the "MOR bill is flat in table size" claim
      // extended to the indexed regime (SCALING.md §MOR). The
      // unindexed twin scans every file (stats see a scrambled key
      // column as full-range everywhere).
      val kIdx = 4
      def mkScrambled(sub: String): String = {
        val t = s"$root/$sub"
        SnapshotLog.commit(spark, t,
          spark.range(n).repartitionByRange(nFiles, col("id")).select(
            ((col("id") * 2654435761L) % n).as("key"),
            repeat(md5(col("id").cast("string")), pay).as("pay"),
            (col("id") % 97).as("v")))
        t
      }
      val idxKeys: Seq[Any] =
        (0 until kIdx).map(i => ((i * 1000L + 3L) * 2654435761L) % n)
      val noIdxT = mkScrambled("mor_noidx")
      val noIdxCand = SnapshotLog
        .pruneFiles(noIdxT, "key", None, None)._1.size
      val (_, morPointNoIdxSec) = timed(
        SnapshotLog.deleteWhereInMOR(spark, noIdxT, "key", idxKeys))
      val idxT = mkScrambled("mor_idx")
      SnapshotLog.writeBloomIndex(spark, idxT, "key",
        expectedItemsPerFile = n / nFiles, fpp = 0.01)
      // the structural claim (BloomSkipBench's shape, on the DML path):
      // the marks scan's candidate set is kIdx + fpp·files independent
      // of table size, where stats alone keep ALL files. At local-SF
      // the seconds barely move (the marks scan is column-pruned to
      // one key column — tiny either way); the candidate COUNT is what
      // scales: at 100 TB the unindexed marks scan reads every file's
      // key column, the indexed one reads ~kIdx files'.
      val (idxCandFiles, idxTotal) =
        SnapshotLog.bloomPruneFiles(spark, idxT, "key", idxKeys)
      val (_, morPointIdxSec) = timed(
        SnapshotLog.deleteWhereInMOR(spark, idxT, "key", idxKeys))
      require(readAll(noIdxT) == readAll(idxT),
        "indexed and unindexed MOR point deletes must agree")
      require(idxCandFiles.size < idxTotal,
        s"the index must prune the point feed's candidates: " +
          s"kept ${idxCandFiles.size}/$idxTotal")

      println(f"MORBENCH: n=$n files=$nFiles k=$k pay=$pay " +
        f"cow_delete=$cowSec%.2fs mor_delete=$morSec%.2fs " +
        f"read_clean=$cleanSec%.2fs read_masked=$maskedSec%.2fs " +
        f"compact=$compactSec%.2fs read_after_compact=$cleanAfter%.2fs " +
        f"cow_merge=$cowMergeSec%.2fs mor_merge=$morMergeSec%.2fs " +
        f"mor_point_noidx=$morPointNoIdxSec%.2fs/$noIdxCand files " +
        f"mor_point_idx=$morPointIdxSec%.2fs/${idxCandFiles.size} files " +
        f"(kIdx=$kIdx)")
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(Paths.get(root))) { st =>
        st.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      }
      spark.stop()
    }
  }
}
