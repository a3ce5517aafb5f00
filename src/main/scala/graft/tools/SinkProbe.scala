package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe of the two exactly-once streaming ingest sinks over the
  * same workload: the V1 format sink (`writeStream.format
  * ("graft-snaplog")` — micro-batch rebind + the append verb's
  * `df.write.parquet`) vs the table-addressed V2 sink
  * (`writeStream.toTable` — executor DataWriters through Spark's
  * parquet OutputWriter + `appendFilesIdempotent`). Both are one
  * distributed parquet write + one footer-harvest + one manifest per
  * epoch, so the expectation is parity; this probe MEASURES it
  * instead of asserting it (NOTES_r17 §7a records the reading).
  *
  *   sbt "runMain graft.tools.SinkProbe [rowsPerVersion] [versions]"
  *
  * The source is a seeded snapshot table streamed version-per-batch,
  * so both sinks see identical micro-batch boundaries and an
  * identical number of epochs. Each leg reports wall seconds and the
  * sink table's version/row accounting (require()d equal across
  * legs). */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val rowsPerV = args.headOption.map(_.toLong).getOrElse(500000L)
    val versions = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scratch = java.nio.file.Files.createTempDirectory("graft_sinkprobe_")
    java.nio.file.Files.createDirectories(scratch.resolve("lake"))
    spark.conf.set("spark.sql.catalog.sp", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.sp.root", scratch.toString)

    val src = scratch.resolve("lake").resolve("src").toString
    (0 until versions).foreach { i =>
      val batch = spark.range(i * rowsPerV, (i + 1) * rowsPerV)
        .select(col("id").as("k"), (col("id") * 7).as("v"),
          concat(lit("payload-"), col("id")).as("s"))
        .repartition(8)
      if (i == 0) graft.sources.SnapshotLog.commit(spark, src, batch): Unit
      else graft.sources.SnapshotLog.commitAppend(spark, src, batch): Unit
    }
    val total = rowsPerV * versions

    def drain(leg: String)(start: String => org.apache.spark.sql.streaming
        .StreamingQuery): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val q = start(leg)
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val dir = scratch.resolve("lake").resolve(leg).toString
      (wall, graft.sources.SnapshotLog.read(spark, dir).count(),
        graft.sources.SnapshotLog.latestVersion(dir).get)
    }

    // leg A: the V1 format sink (target pre-created, like the contract asks)
    graft.sources.SnapshotLog.createTable(
      scratch.resolve("lake").resolve("fmt").toString,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))))
    val (wallFmt, nFmt, vFmt) = drain("fmt") { leg =>
      spark.readStream.format("graft-snaplog").option("tableDir", src).load()
        .writeStream.format("graft-snaplog")
        .option("tableDir", scratch.resolve("lake").resolve(leg).toString)
        .option("checkpointLocation", scratch.resolve(s"ckpt_$leg").toString)
        .start()
    }
    // leg B: the V2 toTable sink (auto-creates its genesis)
    val (wallTbl, nTbl, vTbl) = drain("tbl") { leg =>
      spark.readStream.format("graft-snaplog").option("tableDir", src).load()
        .writeStream
        .option("checkpointLocation", scratch.resolve(s"ckpt_$leg").toString)
        .toTable(s"sp.lake.$leg")
    }
    require(nFmt == total && nTbl == total,
      s"row accounting diverged: fmt=$nFmt tbl=$nTbl expected=$total")
    println(f"SINKPROBE: rows=$total versions_fmt=$vFmt versions_tbl=$vTbl " +
      f"wall_fmt=$wallFmt%.2fs wall_totable=$wallTbl%.2fs " +
      f"ratio=${wallTbl / wallFmt}%.2f")
    spark.stop()
  }
}
