package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** The `:bytes` pseudo-stat: every commit harvests each file's on-disk
  * size into the manifest (the footer is already open — the length is
  * free), and the DSv2 scans' planning-time statistics answer from it
  * instead of one driver-side filesystem stat per kept file per query
  * plan (at 100k files on an object store, 100k HEAD requests a plan).
  *
  * The proof of "zero filesystem stats at planning" is TAMPERING: the
  * spec rewrites the manifest's recorded sizes to sentinels the real
  * files don't have and asserts the estimate follows the MANIFEST —
  * an implementation that stat'ed the filesystem could not see the
  * sentinel. Fallback is pinned by the inverse: stripping `:bytes`
  * from the manifest must restore the filesystem answer (pre-stat
  * manifests keep planning). */
class SnapshotBytesStatSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_bytes_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    spark.conf.set("spark.sql.catalog.byt", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.byt.root", r)
    r
  }

  private def manifestPath(dir: String): java.nio.file.Path = {
    val v = SnapshotLog.latestVersion(dir).get
    Paths.get(dir, "_log", s"$v.json")
  }

  /** (file → recorded :bytes) of the latest manifest. */
  private def recordedBytes(dir: String): Map[String, Long] = {
    val node = mapper.readTree(Files.readString(manifestPath(dir)))
    val stats = node.get("stats")
    import scala.jdk.CollectionConverters._
    node.get("files").elements().asScala.map(_.asText()).flatMap { f =>
      Option(stats.get(f)).flatMap(c => Option(c.get(":bytes")))
        .flatMap(b => Option(b.get("b"))).map(b => f -> b.asLong())
    }.toMap
  }

  /** Rewrite the latest manifest's per-file `:bytes` values through
    * `f` (None = strip the pseudo-stat entirely). */
  private def editBytes(dir: String, f: Long => Option[Long]): Unit = {
    val p = manifestPath(dir)
    val node = mapper.readTree(Files.readString(p)).asInstanceOf[ObjectNode]
    val stats = node.get("stats").asInstanceOf[ObjectNode]
    import scala.jdk.CollectionConverters._
    stats.properties().asScala.foreach { e =>
      val cols = e.getValue.asInstanceOf[ObjectNode]
      Option(cols.get(":bytes")).foreach { b =>
        f(b.get("b").asLong()) match {
          case Some(nv) =>
            b.asInstanceOf[ObjectNode].put("b", nv): Unit
          case None => cols.remove(":bytes"): Unit
        }
      }
    }
    Files.writeString(p, mapper.writeValueAsString(node)): Unit
  }

  private def scanStats(df: DataFrame): SupportsReportStatistics =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.scan
    }.get.asInstanceOf[SupportsReportStatistics]

  test("every commit harvests :bytes == the file's actual size") {
    root
    val dir = s"$root/lake/t"
    SnapshotLog.commit(spark, dir, spark.range(0, 20000).toDF("k")
      .withColumn("v", col("k") * 3).repartition(4))
    val rec = recordedBytes(dir)
    assert(rec.nonEmpty)
    rec.foreach { case (f, b) =>
      assert(b == Files.size(Paths.get(f)), s"$f recorded $b")
      assert(b > 0L)
    }
  }

  test("bucket-scan statistics answer from the manifest, not the " +
      "filesystem (tamper-proof), and strip restores the fallback") {
    root
    val dir = s"$root/lake/t"
    SnapshotLog.rebucket(spark, dir, "k", 4)
    val real = recordedBytes(dir)
    assert(real.nonEmpty)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      def estimate(): Long =
        scanStats(spark.table("byt.lake.t")).estimateStatistics()
          .sizeInBytes().getAsLong
      assert(estimate() == real.values.sum)
      // tamper: the estimate must follow the manifest — a filesystem
      // stat could never see the sentinel
      editBytes(dir, b => Some(b + 1000000L))
      assert(estimate() == real.values.sum + real.size * 1000000L,
        "planning statistics did not come from the manifest")
      // strip: pre-stat manifests fall back to the filesystem answer
      editBytes(dir, _ => None)
      assert(recordedBytes(dir).isEmpty)
      assert(estimate() == real.values.sum,
        "stripped :bytes must fall back to filesystem sizes")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      // restore the true sizes for any later test of this table
      val node = mapper.readTree(Files.readString(manifestPath(dir)))
        .asInstanceOf[ObjectNode]
      val stats = node.get("stats").asInstanceOf[ObjectNode]
      real.foreach { case (f, b) =>
        Option(stats.get(f)).foreach { cols =>
          val bn = mapper.createObjectNode()
          bn.put("b", b): Unit
          // set[T] infers T from the expected type — pin JsonNode (a
          // Unit ascription would make the generic return cast blow up)
          cols.asInstanceOf[ObjectNode]
            .set[com.fasterxml.jackson.databind.JsonNode](":bytes", bn): Unit
        }
      }
      Files.writeString(manifestPath(dir),
        mapper.writeValueAsString(node)): Unit
    }
  }

  test("scan statistics report EXACT numRows from :rows (minus :masked " +
      "on dv files) — AQE sizes from arithmetic, not byte heuristics") {
    root
    val dir = s"$root/lake/nr"
    SnapshotLog.commit(spark, dir, spark.range(0, 12000).toDF("k")
      .withColumn("v", col("k") * 3).repartition(3))
    def rows(): java.util.OptionalLong =
      scanStats(spark.table("byt.lake.nr")).estimateStatistics().numRows()
    assert(rows().getAsLong == 12000L)
    // dv version: numRows is the exact LIVE count (:rows − :masked)
    SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(5L, 6L, 7L)): Unit
    assert(rows().getAsLong == 11997L,
      "dv-aware numRows must subtract the exact masked cardinality")
    // the bucket scan reports it too
    SnapshotLog.compactDeletes(spark, dir): Unit
    SnapshotLog.rebucket(spark, dir, "k", 4): Unit
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try assert(rows().getAsLong == 11997L)
    finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("a dv-bearing version's masked bytes come from the manifest too") {
    root
    val dir = s"$root/lake/m"
    SnapshotLog.commit(spark, dir, spark.range(0, 20000).toDF("k")
      .withColumn("v", col("k") * 3).repartition(4))
    SnapshotLog.deleteWhereInMOR(spark, dir, "k", Seq(1L, 2L, 3L)): Unit
    val rec = recordedBytes(dir)
    def estimate(): Long =
      scanStats(spark.table("byt.lake.m")).estimateStatistics()
        .sizeInBytes().getAsLong
    val before = estimate()
    assert(before > 0L)
    // inflate every recorded size; the masked files' contribution (at
    // least one file carries the dv) must move the estimate upward by
    // its share — the masked half reads the manifest, not the disk
    editBytes(dir, b => Some(b + 5000000L))
    val after = estimate()
    assert(after > before,
      s"masked-half statistics ignored the manifest ($before -> $after)")
    assert((after - before) % 5000000L == 0L,
      "the delta must be a whole number of per-file sentinels")
    assert(rec.nonEmpty)
  }
}
