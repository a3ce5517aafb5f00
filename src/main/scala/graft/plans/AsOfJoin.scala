package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** As-of join as a first-class Catalyst operator: logical node →
  * planner strategy → physical merge-join exec, registered through
  * SparkSessionExtensions (the (c) tier of the custom-operator
  * preference order — used because Spark has no AS OF join and the
  * composed forms either explode (range join) or need a full window
  * materialization).
  *
  * Semantics: for every left row, the single right row with the same
  * key and the greatest time <= the left row's time (or nulls if none)
  * — backward as-of. Optional TIEBREAK columns refine "time" to the
  * lexicographic tuple (time, tie1, tie2, …) compared ascending with
  * nulls first: a right row is eligible iff its tuple is <= the left
  * row's, and the greatest eligible tuple wins. This reproduces the
  * window idiom's `ORDER BY time, tiebreak` total order EXACTLY, which
  * is what lets [[AsOfWindowRewrite]] stay semantics-preserving when
  * the user pinned cross-marker ties with extra order columns.
  *
  * Scale shape: both sides hash-cluster on the key and sort within
  * partitions by (key, time, ties…); the exec then streams BOTH sides
  * once per partition — O(n+m) work, O(1) state (one buffered right
  * row), no pair explosion, no window buffer. Exactly the plan you
  * want at 100 TB: one shuffle per side, then a linear merge.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    leftTies: Seq[Expression] = Nil,
    rightTies: Seq[Expression] = Nil)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, lties, rties) =>
      AsOfJoinExec(lk, rk, lt, rt, lties, rties, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    leftTies: Seq[Expression],
    rightTies: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  require(leftTies.length == rightTies.length,
    "as-of tiebreak columns must pair up left/right")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Hash-cluster both sides on the key: EnsureRequirements inserts
    * compatible exchanges (or none, if the data is already bucketed). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Sort within partitions by (key, time, ties…): groups become
    * contiguous runs in the SAME total order the merge compares in —
    * required on the LEFT too, or an already-consumed right row could
    * sit "after" a later tied left row. Ascending nulls-first, matching
    * the merge's comparator and the window idiom's default ordering. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (Seq(leftKey, leftTime) ++ leftTies).map(SortOrder(_, Ascending)),
    (Seq(rightKey, rightTime) ++ rightTies).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (Seq(leftKey, leftTime) ++ leftTies).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val lTiesB = leftTies.map(BindReferences.bindReference(_, left.output))
    val rTiesB = rightTies.map(BindReferences.bindReference(_, right.output))
    val tieOrderings = leftTies.map(e => TypeUtils.getInterpretedOrdering(e.dataType))
    val rightWidth = right.output.size
    val outputAttrs = output

    // ascending-nulls-first scalar compare — the comparator twin of the
    // SortOrder both children are required to satisfy
    def cmpNullsFirst(a: Any, b: Any, ord: Ordering[Any]): Int =
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else ord.compare(a, b)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered
      // the as-of state: last right row whose (key, time, ties) was
      // consumed, valid only while its key equals the current left key
      var lastRight: InternalRow = null
      var lastRightKey: Any = null

      lIter.map { lRow =>
        val lKey = lKeyB.eval(lRow)
        val lTime = lTimeB.eval(lRow)
        if (lKey == null || lTime == null) {
          project(joined(lRow, nullRight))
        } else {
          val lTimeL = lTime.asInstanceOf[Long]
          // consume right rows whose (time, ties…) tuple is lex-<= this
          // left row's — both sides arrive sorted in that same order
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rKeyB.eval(rRow)
            val rTime = rTimeB.eval(rRow)
            if (rKey == null || rTime == null) {
              rBuf.next() // unmatchable, skip
            } else {
              val c = keyOrdering.compare(rKey.asInstanceOf[AnyRef], lKey.asInstanceOf[AnyRef])
              var rel = if (c != 0) c
                else java.lang.Long.compare(rTime.asInstanceOf[Long], lTimeL)
              var k = 0
              while (rel == 0 && k < tieOrderings.length) {
                rel = cmpNullsFirst(rTiesB(k).eval(rRow), lTiesB(k).eval(lRow), tieOrderings(k))
                k += 1
              }
              if (c < 0 || (c == 0 && rel <= 0)) {
                lastRight = rRow.copy()
                lastRightKey = rKey
                rBuf.next()
              } else {
                advancing = false
              }
            }
          }
          val matches = lastRight != null &&
            keyOrdering.compare(lastRightKey.asInstanceOf[AnyRef], lKey.asInstanceOf[AnyRef]) == 0
          project(joined(lRow, if (matches) lastRight else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: backward as-of join on a shared key column and long
  * (microsecond) time columns, with optional tiebreak columns refining
  * the time order lexicographically (ascending, nulls first). Right-side
  * columns must not collide with left-side names — rename before
  * joining. */
object AsOf {
  def join(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      leftTieCols: Seq[String] = Nil,
      rightTieCols: Seq[String] = Nil): DataFrame = {
    // the documented contract, enforced: with a shared name the output
    // would carry ambiguous attributes, and [[joinWithTolerance]]'s
    // right-side identification BY NAME would null out left columns —
    // fail here, at every entry point, instead of misbehaving there
    val shared = leftDf.columns.toSet.intersect(rightDf.columns.toSet)
    require(shared.isEmpty,
      s"as-of join requires disjoint column names between the two sides; " +
        s"shared: ${shared.toSeq.sorted.mkString(", ")} — rename the " +
        "right side's columns before joining")
    val spark: SparkSession = leftDf.sparkSession
    // fail loudly and early when the planner strategy is absent — the
    // alternative is an opaque assertion deep in query planning. The
    // catalog's SQL-expressible queries all degrade without the
    // extension (dotSql falls back to the HOF fold, simhash to the
    // dataflow form, the window as-of idiom just stays a window); this
    // operator IS the extension, so it states its requirement.
    if (!Bridge.hasStrategy(spark, AsOfJoinStrategy.getClass))
      throw new IllegalStateException(
        "AsOf.join requires the AsOfJoin planner strategy; start the session with " +
          "spark.sql.extensions=graft.functions.GraftExtensions")
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    Bridge.ofRows(spark, AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, leftKeyCol), attr(rPlan, rightKeyCol),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol),
      leftTieCols.map(attr(lPlan, _)), rightTieCols.map(attr(rPlan, _))))
  }

  /** FORWARD as-of — pandas `merge_asof(direction='forward')`: for
    * every left row, the single right row with the same key and the
    * SMALLEST time >= the left row's (the "next event" join —
    * conversion latency, next maintenance window). Pure composition
    * over the same backward exec: negate both time columns and
    * backward's greatest(−rt) <= (−lt) is exactly smallest rt >= lt;
    * the output projection negates back. Times must be > Long.MinValue
    * (negation overflow — true of any epoch-micros column). Tiebreak
    * columns are deliberately not offered: negation would invert their
    * order, so forward picks by TIME alone — callers that read only
    * the matched time (or values keyed on it) are deterministic under
    * time ties, and that is the contract the gate entry uses. */
  def joinForward(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTimeCol: String,
      rightTimeCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    val l2 = leftDf.withColumn(leftTimeCol, -col(leftTimeCol))
    val r2 = rightDf.withColumn(rightTimeCol, -col(rightTimeCol))
    join(l2, r2, leftKeyCol, rightKeyCol, leftTimeCol, rightTimeCol)
      .withColumn(leftTimeCol, -col(leftTimeCol))
      .withColumn(rightTimeCol,
        when(col(rightTimeCol).isNotNull, -col(rightTimeCol)))
  }

  /** Backward as-of with a STALENESS BOUND — pandas `merge_asof`'s
    * `tolerance` (kdb's window-join edge): a match only counts when
    * `leftTime − rightTime <= toleranceMicros`. Tolerance needs no
    * exec change, because the exec already picks the GREATEST right
    * time ≤ the left time: if that match is too stale, every other
    * eligible row is staler still, so "no match within tolerance" is
    * exactly "null out the one match when it misses the bound" — a
    * pure Project over the same one-shuffle-per-side linear merge.
    * Right-side columns (everything not from `leftDf`) null out
    * together, preserving the unmatched-row shape of the plain join. */
  def joinWithTolerance(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      toleranceMicros: Long,
      leftTieCols: Seq[String] = Nil,
      rightTieCols: Seq[String] = Nil): DataFrame = {
    require(toleranceMicros >= 0, "toleranceMicros must be non-negative")
    import org.apache.spark.sql.functions.{col, lit, when}
    val joined = join(leftDf, rightDf, leftKeyCol, rightKeyCol,
      leftTimeCol, rightTimeCol, leftTieCols, rightTieCols)
    val stale = col(rightTimeCol).isNull ||
      (col(leftTimeCol) - col(rightTimeCol)) > lit(toleranceMicros)
    val rightCols = rightDf.columns.toSet
    // ONE Project, so every stale test reads the ORIGINAL right time —
    // a column-at-a-time fold would have later columns re-evaluate
    // staleness against an already-nulled time column
    joined.select(joined.columns.map { c =>
      if (rightCols.contains(c)) when(stale, lit(null)).otherwise(col(c)).as(c)
      else col(c)
    }.toSeq: _*)
  }
}
