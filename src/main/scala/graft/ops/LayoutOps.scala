package graft.ops

import org.apache.spark.sql.functions._

import Tables._

/** Data-layout operators — the write-side half of scan pruning.
  *
  * Parquet row-group/file skipping prunes on per-file min/max column
  * stats, so WHAT a scan can skip is decided when the data is WRITTEN:
  * a layout range-clustered on one column serves only that column's
  * predicates, while a Z-ORDER (Morton) clustering interleaves the bits
  * of two columns so every file covers a small RECTANGLE of the
  * (x, y) domain — min/max stats on BOTH raw columns stay tight and
  * either dimension's predicates prune, at the price of slightly looser
  * single-column runs. This is the standing technique behind
  * Delta/Iceberg `ZORDER BY` and the reason it exists; ZOrderSpec
  * measures the actual file-skip asymmetry on written layouts.
  *
  * The key itself is pure integer bit-arithmetic — built-ins only, no
  * custom expression, stays inside whole-stage codegen — generated as
  * a 2·bits-term sum by [[zOrderSparkSql]] / [[zOrderDuckSql]] (same
  * arithmetic, each engine's shift syntax).
  */
object LayoutOps {

  /** Morton interleave as a Spark SQL expression: bit i of x lands at
    * position 2i, bit i of y at 2i+1. */
  def zOrderSparkSql(x: String, y: String, bits: Int): String =
    zOrderSparkSqlN(Seq(x, y), bits)

  /** The N-DIMENSIONAL Morton interleave (2-D is the n=2 special case,
    * bit-identical to [[zOrderSparkSql]]): bit i of dimension d lands
    * at position n·i + d, so every file of a z-sorted layout covers a
    * small HYPER-RECTANGLE of the n-D domain and each raw dimension's
    * min/max stats stay tight. n·bits must fit a BIGINT (n ≤ 4 at the
    * 8-bit/256-cell grid the optimize verb uses — and the USEFUL
    * ceiling is about there anyway: each added dimension halves the
    * per-dimension resolution a fixed file count can hold, so 2–4
    * correlated-ask dimensions is the regime where z-ordering beats
    * single-column clustering; beyond that the curve degrades toward
    * hashing and per-dimension stats stop pruning). Same arithmetic
    * shape as the 2-D form: pure integer bit-ops, built-ins only,
    * whole-stage-codegen friendly. */
  def zOrderSparkSqlN(cols: Seq[String], bits: Int): String = {
    require(cols.size >= 2, s"Morton interleave wants >= 2 dimensions")
    require(cols.size * bits <= 62,
      s"${cols.size} dims x $bits bits overflows the BIGINT z-key")
    val n = cols.size
    val terms = (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, d) =>
        s"shiftleft((shiftright($c, $i) & 1), ${n * i + d})" }
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  /** The identical arithmetic in DuckDB's operator syntax. */
  def zOrderDuckSql(x: String, y: String, bits: Int): String = {
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  /** The two clustering dimensions, 8 bits each: part bucket and
    * ship-day-of-year bucket — genuinely independent attributes a
    * lineitem-shaped fact table gets filtered by (part lookups, date
    * ranges). Hash-free so the demonstration matches what ZORDER does
    * on real columns. */
  private def withXY(df: org.apache.spark.sql.DataFrame) = df.select(
    col("l_orderkey"), col("l_linenumber"),
    pmod(col("l_partkey"), lit(256L)).as("x"),
    pmod((dayofyear(col("l_shipdate")) - 1).cast("long"), lit(256L)).as("y"))

  /** The 16-bit Morton key for every lineitem row. In-row integer
    * arithmetic over the scan — no join, no shuffle; at 100 TB this is
    * the (free) compute half of a ZORDER rewrite, and the expensive
    * half is the range-repartition WRITE that ZOrderSpec performs and
    * measures on real files. */
  val layoutZorderKey: Q = (s, dir) =>
    withXY(t(s, dir, "lineitem"))
      .withColumn("z", expr(zOrderSparkSql("x", "y", 8)))

  val queries: Seq[(String, Q)] = Seq(
    "layout_zorder_key" -> layoutZorderKey)

  val oracles: Seq[(String, String)] = Seq(
    "layout_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber, x, y, ${zOrderDuckSql("x", "y", 8)} AS z
          FROM (SELECT l_orderkey, l_linenumber,
                  CAST(l_partkey % 256 AS BIGINT) AS x,
                  CAST((EXTRACT(doy FROM l_shipdate) - 1) % 256 AS BIGINT) AS y
                FROM lineitem)""")
}
