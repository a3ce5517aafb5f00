package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The log's MAINTENANCE verbs as SQL `CALL` procedures — Spark 4's
  * DSv2 stored-procedure surface on [[SnapshotCatalog]], the Iceberg
  * `CALL cat.system.…` convention:
  *
  * {{{
  *   CALL snap.system.restore(table => 'ns.t', version => 3)
  *   CALL snap.system.optimize('ns.t', 500000)
  *   CALL snap.system.optimize('ns.t', 500000, zorder_by => 'x,y')
  *   CALL snap.system.rebucket('ns.t', 'k', 16)
  *   CALL snap.system.compact_deletes('ns.t')
  *   CALL snap.system.expire_versions('ns.t', 10)
  *   CALL snap.system.vacuum('ns.t')                -- 1h age floor
  *   CALL snap.system.vacuum('ns.t', 0)             -- tests only
  * }}}
  *
  * Each routes to the log's own verb ([[SnapshotLog.restore]] /
  * [[SnapshotLog.optimize]] / [[SnapshotLog.compactDeletes]] /
  * [[SnapshotLog.expireVersions]] / [[SnapshotLog.vacuum]]) — nothing
  * the verbs own (OCC, stats carry-forward, dv discipline, the age
  * floor) is bypassed, the same routing rule as the catalog's DML.
  * The `table` argument is `ns.t` under the calling catalog's root,
  * or an absolute path (the TVF convention for path-addressed
  * tables). Every procedure RETURNS its outcome as rows (Spark
  * surfaces the last scan's output as the CALL result), so a caller
  * sees the committed version / counts instead of a silent OK.
  *
  * Procedures are declared NON-deterministic: each invocation commits
  * or deletes state, and the result depends on the table's live
  * history, never on the arguments alone. */
private[sources] object SnapshotProcedures {

  def names: Seq[String] =
    Seq("add_constraint", "compact_deletes", "drop_constraint",
      "expire_versions", "optimize", "rebucket", "restore",
      "show_constraints", "vacuum")

  def load(cat: SnapshotCatalog, name: String): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "restore"          => Some(restore(cat))
      case "optimize"         => Some(optimize(cat))
      case "rebucket"         => Some(rebucket(cat))
      case "compact_deletes"  => Some(compactDeletes(cat))
      case "expire_versions"  => Some(expireVersions(cat))
      case "vacuum"           => Some(vacuum(cat))
      case "add_constraint"   => Some(addConstraint(cat))
      case "drop_constraint"  => Some(dropConstraint(cat))
      case "show_constraints" => Some(showConstraints(cat))
      case _                  => None
    }

  // ---- the inventory -----------------------------------------------------

  private def restore(cat: SnapshotCatalog): UnboundProcedure =
    proc(cat, "restore",
      "restore the table to an older version's content (metadata-only " +
        "forward commit; SnapshotLog.restore)",
      Seq(in("table", StringType, "ns.t under this catalog's root, or " +
          "an absolute path"),
        in("version", LongType, "committed version to restore to")),
      StructType(Seq(
        StructField("restored_from", LongType, nullable = false),
        StructField("version", LongType, nullable = false))),
      (args, _) => {
        val dir = cat.resolveTableArg(str(args, 0))
        val target = args.getLong(1)
        val v = SnapshotLog.restore(dir, target)
        Seq(new GenericInternalRow(Array[Any](target, v)))
      })

  private def optimize(cat: SnapshotCatalog): UnboundProcedure =
    proc(cat, "optimize",
      "rewrite the table into right-sized files, optionally clustered " +
        "or z-ordered (SnapshotLog.optimize)",
      Seq(in("table", StringType, "ns.t or absolute path"),
        in("target_records_per_file", LongType, "rows per output file"),
        inDefault("zorder_by", StringType, "NULL",
          "comma-separated columns for the n-D Morton layout (2-4)"),
        inDefault("cluster_by", StringType, "NULL",
          "comma-separated sort columns (exclusive with zorder_by)"),
        inDefault("zorder_quantile", BooleanType, "false",
          "bucket z-order cells by rank instead of value (skew repair)"),
        inDefault("zorder_within_buckets", BooleanType, "false",
          "compose z-order with a rebucket layout: z-curve INSIDE " +
            "each bucket so the SPJ layout survives")),
      StructType(Seq(StructField("version", LongType, nullable = false))),
      (args, spark) => {
        val dir = cat.resolveTableArg(str(args, 0))
        val v = SnapshotLog.optimize(spark, dir,
          targetRecordsPerFile = args.getLong(1),
          clusterBy = cols(args, 3),
          zOrderBy = cols(args, 2),
          zOrderQuantile = !args.isNullAt(4) && args.getBoolean(4),
          zOrderWithinBuckets = !args.isNullAt(5) && args.getBoolean(5))
        Seq(new GenericInternalRow(Array[Any](v)))
      })

  private def rebucket(cat: SnapshotCatalog): UnboundProcedure =
    proc(cat, "rebucket",
      "rewrite the table into the bucket(n, col) layout for storage-" +
        "partitioned joins (SnapshotLog.rebucket; scans report " +
        "KeyGroupedPartitioning under " +
        "spark.sql.sources.v2.bucketing.enabled)",
      Seq(in("table", StringType, "ns.t or absolute path"),
        in("col", StringType,
          "the bucket (join-key) column, or a comma-separated " +
            "composite-key list"),
        in("num_buckets", IntegerType, "bucket count (2..65536)"),
        inDefault("sort_within", StringType, "NULL",
          "comma-separated intra-bucket sort columns (tight per-file " +
            "stats → range pruning composes with the join layout)")),
      StructType(Seq(StructField("version", LongType, nullable = false))),
      (args, spark) => {
        val dir = cat.resolveTableArg(str(args, 0))
        val v = SnapshotLog.rebucketBy(spark, dir,
          str(args, 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq,
          args.getInt(2), sortWithin = cols(args, 3))
        Seq(new GenericInternalRow(Array[Any](v)))
      })

  private def compactDeletes(cat: SnapshotCatalog): UnboundProcedure =
    proc(cat, "compact_deletes",
      "materialize merge-on-read deletion vectors into clean files " +
        "(SnapshotLog.compactDeletes)",
      Seq(in("table", StringType, "ns.t or absolute path")),
      StructType(Seq(StructField("version", LongType, nullable = false))),
      (args, spark) => {
        val dir = cat.resolveTableArg(str(args, 0))
        val v = SnapshotLog.compactDeletes(spark, dir)
        Seq(new GenericInternalRow(Array[Any](v)))
      })

  private def expireVersions(cat: SnapshotCatalog): UnboundProcedure =
    proc(cat, "expire_versions",
      "drop manifests older than the newest keep_last versions " +
        "(SnapshotLog.expireVersions; data files wait for vacuum)",
      Seq(in("table", StringType, "ns.t or absolute path"),
        in("keep_last", IntegerType, "surviving version count (>= 1)")),
      StructType(Seq(
        StructField("expired_count", IntegerType, nullable = false))),
      (args, _) => {
        val dir = cat.resolveTableArg(str(args, 0))
        val expired = SnapshotLog.expireVersions(dir, args.getInt(1))
        Seq(new GenericInternalRow(Array[Any](expired.size)))
      })

  private def vacuum(cat: SnapshotCatalog): UnboundProcedure =
    proc(cat, "vacuum",
      "delete data files no surviving manifest references " +
        "(SnapshotLog.vacuum; min_age_ms is the safety floor against " +
        "in-flight commits)",
      Seq(in("table", StringType, "ns.t or absolute path"),
        inDefault("min_age_ms", LongType, "3600000",
          "only files older than this are deleted")),
      StructType(Seq(
        StructField("deleted_count", IntegerType, nullable = false))),
      (args, _) => {
        val dir = cat.resolveTableArg(str(args, 0))
        val deleted = SnapshotLog.vacuum(dir,
          if (args.isNullAt(1)) 3600000L else args.getLong(1))
        Seq(new GenericInternalRow(Array[Any](deleted.size)))
      })

  private def addConstraint(cat: SnapshotCatalog): UnboundProcedure =
    proc(cat, "add_constraint",
      "add a named CHECK constraint enforced on every future write; " +
        "existing data is validated first (SnapshotLog.addConstraint)",
      Seq(in("table", StringType, "ns.t or absolute path"),
        in("name", StringType, "constraint name (letters/digits/_)"),
        in("expr", StringType,
          "SQL predicate over the table's columns; NULL passes " +
            "(CHECK semantics) — spell NOT NULL as `c IS NOT NULL`")),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("expr", StringType, nullable = false))),
      (args, spark) => {
        val dir = cat.resolveTableArg(str(args, 0))
        SnapshotLog.addConstraint(spark, dir, str(args, 1), str(args, 2))
        Seq(new GenericInternalRow(Array[Any](
          UTF8String.fromString(str(args, 1)),
          UTF8String.fromString(str(args, 2)))))
      })

  private def dropConstraint(cat: SnapshotCatalog): UnboundProcedure =
    proc(cat, "drop_constraint",
      "remove a CHECK constraint; future writes stop checking it " +
        "(SnapshotLog.dropConstraint — loud on a missing name)",
      Seq(in("table", StringType, "ns.t or absolute path"),
        in("name", StringType, "constraint name")),
      StructType(Seq(StructField("dropped", StringType, nullable = false))),
      (args, _) => {
        val dir = cat.resolveTableArg(str(args, 0))
        SnapshotLog.dropConstraint(dir, str(args, 1))
        Seq(new GenericInternalRow(Array[Any](
          UTF8String.fromString(str(args, 1)))))
      })

  private def showConstraints(cat: SnapshotCatalog): UnboundProcedure =
    proc(cat, "show_constraints",
      "list the table's CHECK constraints, name-sorted",
      Seq(in("table", StringType, "ns.t or absolute path")),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("expr", StringType, nullable = false))),
      (args, _) => {
        val dir = cat.resolveTableArg(str(args, 0))
        SnapshotLog.constraints(dir).map { case (n, e) =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(n), UTF8String.fromString(e)))
            : InternalRow
        }
      })

  // ---- plumbing ----------------------------------------------------------

  private def in(name: String, dt: DataType, comment: String)
      : ProcedureParameter =
    ProcedureParameter.in(name, dt).comment(comment).build()

  private def inDefault(name: String, dt: DataType, defaultSql: String,
      comment: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(defaultSql)
      .comment(comment).build()

  private def str(args: InternalRow, i: Int): String = {
    require(!args.isNullAt(i), s"argument ${i + 1} must not be NULL")
    args.getUTF8String(i).toString
  }

  /** Comma-separated column list argument → Seq (NULL/empty → none). */
  private def cols(args: InternalRow, i: Int): Seq[String] =
    if (args.isNullAt(i)) Nil
    else args.getUTF8String(i).toString.split(',').map(_.trim)
      .filter(_.nonEmpty).toSeq

  /** One-liner procedure scaffold: unbound → bound → a single
    * [[LocalScan]] result (driver-sized outcome rows — version numbers
    * and counts; shipping them through input partitions would
    * manufacture distribution, the [[SnapshotHistoryTable]] argument). */
  private def proc(cat: SnapshotCatalog, procName: String, desc: String,
      params: Seq[ProcedureParameter], outSchema: StructType,
      run: (InternalRow, SparkSession) => Seq[InternalRow])
      : UnboundProcedure = new UnboundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = procName
        override def description(): String = desc
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val out = run(input, SparkSession.active).toArray
          java.util.Collections.singletonList(new Scan with LocalScan {
            override def readSchema(): StructType = outSchema
            override def description(): String = s"snap.system.$procName"
            override def rows(): Array[InternalRow] = out
          }: Scan).iterator()
        }
      }
  }
}
