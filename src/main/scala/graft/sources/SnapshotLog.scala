package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal atomic snapshot log — the missing piece the versioned-dir
  * convention (IncrementalDemo, the foreachBatch apply test) hand-waves:
  * WHICH version is current, decided atomically, so a reader never sees
  * a half-written snapshot and concurrent readers of different versions
  * both stay consistent. This is the kernel idea of Delta/Iceberg
  * reduced to its load-bearing minimum:
  *
  *   - data files land under a writer-unique `data/v<N>-<token>/`
  *     FIRST (arbitrarily slow, crash-prone — harmless, nothing
  *     references them yet, and no two writers ever share a path);
  *   - the commit is ONE atomic manifest publish into `_log/<N>.json`
  *     (write temp + hard-link put-if-absent): after it the version exists
  *     with its full file list, before it the version does not exist
  *     at all. A crashed writer leaves dead data files, never a
  *     readable torn snapshot;
  *   - readers resolve "current" by listing `_log` and taking the
  *     max version (≤ asOf for time travel), then read exactly the
  *     manifest's files — immune to whatever later writers are doing.
  *
  * On a real object store the same recipe holds wherever a
  * put-if-absent primitive exists (S3 If-None-Match, GCS
  * generation-0 preconditions) — exactly the requirement table
  * formats document. No compaction of the log, no schema evolution, no
  * concurrent-WRITER arbitration (last manifest wins) — those are the
  * parts a real table format adds; SnapshotLogSpec pins the reader
  * guarantees this minimum already provides.
  */
object SnapshotLog {

  private def logDir(tableDir: String) = Paths.get(tableDir, "_log")

  /** Write `df` as version `latest+1` and atomically publish it.
    * Returns the committed version. Throws
    * `FileAlreadyExistsException` if another writer published the same
    * version between the read of `latestVersion` and the publish —
    * the optimistic-concurrency failure a caller retries.
    *
    * Data lands under a WRITER-UNIQUE directory (`data/v<N>-<token>`),
    * not a version-deterministic one: with a shared `data/v<N>` path a
    * racing LOSER's mode("overwrite") would delete the winner's
    * already-committed files before its own publish fails — a torn
    * committed snapshot, exactly what the log exists to exclude. The
    * manifest records the actual paths, so readers never care what the
    * directory is named; a loser's orphaned directory is dead weight
    * for a vacuum pass, never a correctness hazard. */
  def commit(spark: SparkSession, tableDir: String, df: DataFrame): Long = {
    val v = latestVersion(tableDir).getOrElse(-1L) + 1
    val dd = Paths.get(tableDir, "data",
      s"v$v-${java.util.UUID.randomUUID.toString.take(8)}")
    df.write.mode("overwrite").parquet(dd.toString)
    val files = Files.list(dd).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted
    publish(tableDir, v, files)
    v
  }

  /** The commit point, isolated: an atomic PUT-IF-ABSENT. POSIX
    * rename() silently REPLACES an existing target (so ATOMIC_MOVE
    * cannot express "fail if taken"); a hard LINK of the fully-written
    * temp file onto the target is the primitive that both publishes
    * the complete content in one step AND fails with
    * `FileAlreadyExistsException` when a concurrent writer won the
    * version — the caller's optimistic-concurrency retry signal. */
  private[graft] def publish(tableDir: String, v: Long, files: Seq[String]): Unit = {
    Files.createDirectories(logDir(tableDir))
    val manifest = files.map(f => "\"" + f.replace("\\", "\\\\") + "\"")
      .mkString(s"""{"version":$v,"files":[""", ",", "]}")
    val tmp = logDir(tableDir).resolve(s".$v.json.tmp")
    Files.writeString(tmp, manifest)
    val target = logDir(tableDir).resolve(s"$v.json")
    try Files.createLink(target, tmp)
    finally Files.deleteIfExists(tmp)
  }

  /** Highest committed version, if any. */
  def latestVersion(tableDir: String): Option[Long] = {
    val ld = logDir(tableDir)
    if (!Files.isDirectory(ld)) None
    else {
      val vs = Files.list(ld).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && !n.startsWith("."))
        .map(_.stripSuffix(".json").toLong)
        .toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Read a committed snapshot: the latest, or the newest version
    * ≤ `asOf` (time travel). Reads EXACTLY the manifest's files. */
  def read(spark: SparkSession, tableDir: String,
      asOf: Option[Long] = None): DataFrame = {
    val v = (latestVersion(tableDir), asOf) match {
      case (None, _) => sys.error(s"no committed version in $tableDir")
      case (Some(latest), None) => latest
      case (Some(latest), Some(t)) =>
        val vs = (0L to latest).filter(x =>
          Files.exists(logDir(tableDir).resolve(s"$x.json")) && x <= t)
        if (vs.isEmpty) sys.error(s"no version <= $t in $tableDir") else vs.max
    }
    val manifest = Files.readString(logDir(tableDir).resolve(s"$v.json"))
    // minimal parse of the file array this object itself wrote
    val files = "\"(.*?)\"".r.findAllMatchIn(manifest.dropWhile(_ != '['))
      .map(_.group(1).replace("\\\\", "\\")).toSeq
    spark.read.parquet(files: _*)
  }
}
