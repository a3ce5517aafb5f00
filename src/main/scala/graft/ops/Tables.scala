package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the operator catalog.
  *
  * Numeric-parity policy (so Spark results hash-match the DuckDB oracle):
  *  - money sums are computed in integer cents (`round(x*100) :: long`)
  *    — exact in both engines regardless of aggregation order;
  *  - ratios/averages are a single IEEE division of exactly-computed
  *    operands — bit-identical across engines;
  *  - never output raw timestamps — always `date_format` strings;
  *  - accumulated float scores (cosine) are rounded to 6 decimals.
  */
object Tables {
  type Q = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Dollars-with-2-decimals double → exact integer cents. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** 2-decimal rate (discount/tax) → exact integer percent. */
  def pct(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact revenue term in cents×10⁻⁴: cents(price) * (100 - pct(disc)). */
  def revenueC4(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - pct(discount))

  /** Dot-product SQL fragment: the native codegen expression
    * ([[graft.functions.VecDot]]) when the session registered it, else
    * the built-in higher-order-function fold. Both are sequential
    * index-order summation — identical results, different speed. */
  def dotSql(s: SparkSession, a: String, b: String): String =
    if (s.catalog.functionExists("vec_dot")) s"vec_dot($a, $b)"
    else s"aggregate(zip_with($a, $b, (x, y) -> x*y), 0D, (acc, x) -> acc + x)"
}
