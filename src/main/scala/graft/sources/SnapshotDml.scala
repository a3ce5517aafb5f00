package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.Bridge

/** Marker the DML rewrite recognizes on catalog-loaded snapshot
  * tables: the table's directory plus whether this instance was
  * loaded at the LATEST version (DML must never target a time-travel
  * pin — the verbs commit on top of latest, and a pinned instance
  * accepting writes would silently retarget). */
private[graft] trait SnapshotSqlTable {
  def snapshotTableDir: String
  def snapshotWritable: Boolean
}

/** SQL DML on snapshot tables — the write-side twin of the catalog's
  * read surface, reached through `spark.sql.extensions =
  * graft.functions.GraftExtensions` (a post-hoc resolution rule; the
  * catalog alone keeps its read+DDL surface, and without the
  * extension DML fails with Spark's own unsupported-operation
  * analysis errors):
  *
  * {{{
  *   INSERT INTO snap.ns.t SELECT ...              -- commitAppend (no rule needed)
  *   INSERT OVERWRITE snap.ns.t SELECT ...         -- commit (full replace)
  *   DELETE FROM snap.ns.t WHERE k IN (1, 2)       -- deleteWhereInMOR
  *   UPDATE snap.ns.t SET v = v + 1 WHERE k = 7    -- updateWhereInMOR
  *   MERGE INTO snap.ns.t t USING src s ON t.k = s.k
  *     WHEN MATCHED THEN UPDATE SET k = s.k, v = s.v
  *     WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
  *                                                 -- mergeIntoMOR (upsert)
  *   MERGE INTO snap.ns.t t USING src s ON t.k = s.k
  *     WHEN MATCHED THEN DELETE                    -- mergeIntoMOR (delete feed)
  * }}}
  *
  * Each verb ROUTES TO THE LOG'S OWN SCALA VERB — nothing the verbs
  * own (put-if-absent OCC, manifest stats, schema enforcement, the
  * MOR cost-model require()s) is bypassed or re-implemented, so a SQL
  * statement and its Scala twin produce byte-identical table states
  * (SnapshotSqlDmlSpec pins this hash-for-hash, dv-bearing starting
  * versions and column-mapped tables included). The MOR verbs are the
  * deliberate routing target: SQL DML is the high-churn surface, and
  * O(churn) masks + post-image appends are the only cost model that
  * holds there at scale — a user who wants the COW rewrite calls
  * `deleteWhereIn`/`updateWhereIn` from Scala explicitly.
  *
  * PARTIAL SURFACE WITH HONEST ERRORS, by design: the verbs are
  * point-DML (key-membership predicates, whole-row post-images), so
  * shapes they cannot express refuse LOUDLY at analysis, naming the
  * Scala alternative — never a silent semantic downgrade:
  *
  *  - DELETE/UPDATE take ARBITRARY deterministic predicates (since
  *    round 17's fifth push): `col = lit` / `col IN (lits)` shapes
  *    keep the dedicated membership path (bloom-backed pruning),
  *    everything else routes to `deleteWhereMOR`/`updateWhereMOR` —
  *    the same O(matching rows) masks, file-pruned through the
  *    stats+bloom translator on the resolved condition. The two
  *    honest exclusions, refused at analysis: SUBQUERIES (no meaning
  *    against the verb's own later scan — materialize the key set)
  *    and NON-DETERMINISTIC predicates (the masked set must be the
  *    one every re-evaluation sees).
  *  - UPDATE assignment values may reference the row's own columns
  *    (`SET v = v + 1`) but not subqueries.
  *  - MERGE translates exactly two shapes: the full upsert (matched
  *    UPDATE + not-matched INSERT assigning every target column the
  *    same source expression — `mergeIntoMOR`'s post-image feed
  *    semantics, where an insert on an existing key upserts and a
  *    matched update's post-image replaces the whole row) and the
  *    delete feed (a sole matched DELETE; absent keys no-op, the
  *    verb's contract). Conditional actions, partial assignments,
  *    NOT MATCHED BY SOURCE, and schema evolution refuse naming
  *    `SnapshotLog.mergeIntoMOR`. The verb's one-row-per-key feed
  *    require() doubles as SQL MERGE's cardinality check.
  */
object SnapshotSqlDml extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case d @ DeleteFromTable(target, cond) if d.resolved =>
      snapshotDir(target) match {
        case None => d
        // DELETE without a predicate (the parser spells it WHERE true)
        // is TRUNCATE: one metadata-only zero-file commit — per-key
        // masking of every row would manufacture a table-sized sidecar
        // for a shape the log answers in one manifest write
        case Some(dir) if cond == Literal.TrueLiteral =>
          SnapshotTruncateSqlCommand(dir)
        case Some(dir) =>
          whereIn(cond) match {
            // key-membership keeps its dedicated path (bloom-backed
            // membership pruning + the point verb's provenance)
            case Some((column, values)) =>
              SnapshotDeleteSqlCommand(dir, column, values)
            case None =>
              guardGeneralPredicate("DELETE FROM", dir, cond)
              SnapshotDeleteWhereSqlCommand(dir,
                Bridge.column(unresolve(cond)))
          }
      }

    case u @ UpdateTable(target, assignments, condOpt) if u.resolved =>
      snapshotDir(target) match {
        case None => u
        case Some(dir) =>
          val cond = condOpt.getOrElse(sys.error(
            s"UPDATE $dir without WHERE is a whole-table rewrite, not " +
              "point DML — use SnapshotLog.updateWhereIn[MOR] with the " +
              "full key set, or read-transform-commit from Scala"))
          val sets = assignments.flatMap {
            case Assignment(k: AttributeReference, v) =>
              v match {
                // identity assignments (alignment fills unassigned
                // columns with themselves) are not updates
                case a: AttributeReference if a.exprId == k.exprId => None
                case _ =>
                  require(!v.exists(_.isInstanceOf[PlanExpression[_]]),
                    s"UPDATE $dir: SET ${k.name} = <subquery> — " +
                      "assignment subqueries don't translate; compute " +
                      "the value and use SnapshotLog.updateWhereIn[MOR]")
                  Some(k.name -> unresolve(v))
              }
            case Assignment(other, _) => sys.error(
              s"UPDATE $dir: assignment target ${other.sql} is not a " +
                "top-level column — the log's updates are " +
                "top-level-only, like its schema evolution")
          }
          require(sets.nonEmpty,
            s"UPDATE $dir: every assignment is an identity (SET c = c) " +
              "— nothing to update")
          whereIn(cond) match {
            case Some((column, values)) =>
              SnapshotUpdateSqlCommand(dir, column, values, sets)
            case None =>
              guardGeneralPredicate("UPDATE", dir, cond)
              SnapshotUpdateWhereSqlCommand(dir,
                Bridge.column(unresolve(cond)), sets)
          }
      }

    case m @ MergeIntoTable(target, source, mergeCond, matched, notMatched,
        notMatchedBySource, withSchemaEvolution) if m.resolved =>
      snapshotDir(target) match {
        case None => m
        case Some(dir) =>
          translateMerge(dir, target, source, mergeCond, matched,
            notMatched, notMatchedBySource, withSchemaEvolution)
      }
  }

  // ---- shared pieces -----------------------------------------------------

  private def snapshotDir(target: LogicalPlan): Option[String] =
    EliminateSubqueryAliases(target) match {
      case r: DataSourceV2Relation => r.table match {
        case t: SnapshotSqlTable =>
          require(t.snapshotWritable,
            s"DML on ${t.snapshotTableDir}: this relation is pinned to a " +
              "historical version (time travel) — DML targets the " +
              "latest version only")
          Some(t.snapshotTableDir)
        case _ => None
      }
      case _ => None
    }

  /** `col = lit` / `col IN (lits)` / OR-chains of those on ONE column
    * → the (column, values) membership the point-DML verbs speak.
    * Type coercion wraps operands in casts (`CAST(k AS BIGINT) IN
    * (CAST(3 AS BIGINT), …)`): an IDENTITY cast on the column strips
    * (a type-CHANGING cast would change membership semantics and
    * refuses), and any FOLDABLE comparand evaluates to its constant.
    * NULL list members are dropped (a NULL never equals anything —
    * `deleteWhereIn`'s own rule, and SQL's); a lone `col = NULL`
    * refuses rather than translating to an empty no-op. */
  private def whereIn(cond: Expression): Option[(String, Seq[Any])] = {
    def attr(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case c: Cast if c.dataType == c.child.dataType => attr(c.child)
      case _ => None
    }
    def const(e: Expression): Option[Any] =
      if (e.foldable && !e.exists(_.isInstanceOf[PlanExpression[_]]))
        Option(e.eval()).map(CatalystTypeConverters.convertToScala(_, e.dataType))
      else None
    cond match {
      case EqualTo(l, r) =>
        attr(l).flatMap(a => const(r).map(v => (a.name, Seq(v))))
          .orElse(attr(r).flatMap(a => const(l).map(v => (a.name, Seq(v)))))
      case In(v, elems) if elems.nonEmpty && elems.forall(_.foldable) =>
        attr(v).flatMap { a =>
          val vs = elems.flatMap(const)
          if (vs.isEmpty) None else Some((a.name, vs))
        }
      case InSet(v, hset) =>
        attr(v).flatMap { a =>
          val vs = hset.toSeq.filter(_ != null).map(
            CatalystTypeConverters.convertToScala(_, v.dataType))
          if (vs.isEmpty) None else Some((a.name, vs))
        }
      case Or(l, r) =>
        for {
          (cl, vl) <- whereIn(l)
          (cr, vr) <- whereIn(r) if cl == cr
        } yield (cl, vl ++ vr)
      case _ => None
    }
  }

  /** The two shapes the GENERAL-predicate MOR verbs cannot honor,
    * refused at ANALYSIS with the statement still on screen: a
    * SUBQUERY has no meaning against the verb's own later scan
    * (materialize the key set), and a NON-DETERMINISTIC predicate
    * would mask different rows than any re-evaluation sees. Everything
    * else routes to `deleteWhereMOR`/`updateWhereMOR` — since round
    * 17's fifth push the SQL DML predicate surface is total up to
    * these two honest exclusions. */
  private def guardGeneralPredicate(verb: String, dir: String,
      cond: Expression): Unit = {
    require(!cond.exists(_.isInstanceOf[PlanExpression[_]]),
      s"$verb $dir: predicate `${cond.sql}` contains a subquery — " +
        "materialize the key set and use " +
        "SnapshotLog.deleteWhereIn[MOR]/updateWhereIn[MOR], or " +
        "read-transform-commit")
    require(cond.deterministic,
      s"$verb $dir: predicate `${cond.sql}` is non-deterministic — " +
        "the masked row set must be the one every re-evaluation sees; " +
        "compute the key set and use the WhereIn[MOR] form")
  }

  /** Resolved target-column references → by-name unresolved ones, so
    * the expression re-resolves against the verb's own read of the
    * table (the original AttributeReference exprIds belong to THIS
    * query's relation instance and would never bind there). */
  private def unresolve(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  // ---- MERGE -------------------------------------------------------------

  private def translateMerge(dir: String, target: LogicalPlan,
      source: LogicalPlan, mergeCond: Expression,
      matched: Seq[MergeAction], notMatched: Seq[MergeAction],
      notMatchedBySource: Seq[MergeAction],
      withSchemaEvolution: Boolean): LogicalPlan = {
    def refuse(why: String): Nothing = sys.error(
      s"MERGE INTO $dir: $why — the log's SQL MERGE translates exactly " +
        "two shapes: the full upsert (WHEN MATCHED THEN UPDATE SET " +
        "<every column = source expr> WHEN NOT MATCHED THEN INSERT " +
        "<same exprs>) and the delete feed (a sole WHEN MATCHED THEN " +
        "DELETE); anything else is SnapshotLog.mergeIntoMOR's Scala " +
        "feed surface")
    if (withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION is unsupported")
    if (notMatchedBySource.nonEmpty) refuse(
      "WHEN NOT MATCHED BY SOURCE is unsupported (the feed never sees " +
        "unmatched target rows)")
    val targetRel = EliminateSubqueryAliases(target)
    val tableCols: Seq[Attribute] = targetRel.output
    val srcOut = source.outputSet
    // the ON clause must be a single target-key = source-expr equality:
    // that key is the verb's merge key, and the source side becomes the
    // feed's key column
    val (keyAttr, srcKeyExpr) = mergeCond match {
      case EqualTo(a: AttributeReference, e)
          if targetRel.outputSet.contains(a) && e.references.subsetOf(srcOut) =>
        (a, e)
      case EqualTo(e, a: AttributeReference)
          if targetRel.outputSet.contains(a) && e.references.subsetOf(srcOut) =>
        (a, e)
      case other => refuse(s"ON condition `${other.sql}` is not a single " +
        "target-column = source-expression equality")
    }
    (matched, notMatched) match {
      // ---- delete feed: sole matched DELETE, nothing else ----
      case (Seq(DeleteAction(None)), Seq()) =>
        val feedExprs: Seq[NamedExpression] = tableCols.map { c =>
          if (c.exprId == keyAttr.exprId) Alias(srcKeyExpr, c.name)()
          else Alias(Literal.create(null, c.dataType), c.name)()
        } :+ Alias(Literal.create("delete", org.apache.spark.sql.types.StringType), "op")()
        SnapshotMergeSqlCommand(dir, Project(feedExprs, source), keyAttr.name)
      case (Seq(DeleteAction(Some(c))), Seq()) =>
        refuse(s"conditional WHEN MATCHED AND ${c.sql} THEN DELETE is " +
          "unsupported (fold the condition into the source)")
      // ---- upsert: matched UPDATE + not-matched INSERT, full rows ----
      case (Seq(UpdateAction(None, uAssigns, _)), Seq(InsertAction(None, iAssigns))) =>
        def toMap(as: Seq[Assignment], what: String): Map[ExprId, Expression] =
          as.map {
            case Assignment(k: AttributeReference, v) => k.exprId -> v
            case Assignment(other, _) => refuse(
              s"$what assigns non-top-level target ${other.sql}")
          }.toMap
        val uMap = toMap(uAssigns, "UPDATE")
        val iMap = toMap(iAssigns, "INSERT")
        val feedExprs: Seq[NamedExpression] = tableCols.map { c =>
          val u = uMap.getOrElse(c.exprId, refuse(
            s"UPDATE leaves column ${c.name} unassigned — post-images " +
              "replace the whole row, so every column needs a source " +
              "expression"))
          val i = iMap.getOrElse(c.exprId, refuse(
            s"INSERT leaves column ${c.name} unassigned"))
          if (!u.semanticEquals(i)) refuse(
            s"column ${c.name} gets `${u.sql}` when matched but " +
              s"`${i.sql}` when not — the feed carries ONE post-image " +
              "per key, so both actions must assign the same expression")
          if (!u.references.subsetOf(srcOut)) refuse(
            s"column ${c.name}'s assignment `${u.sql}` references the " +
              "target row — post-images are built from the source alone")
          if (u.exists(_.isInstanceOf[PlanExpression[_]])) refuse(
            s"column ${c.name}'s assignment carries a subquery")
          Alias(u, c.name)()
        } :+ Alias(Literal.create("update", org.apache.spark.sql.types.StringType), "op")()
        val keyExpr = feedExprs(tableCols.indexWhere(_.exprId == keyAttr.exprId))
          .asInstanceOf[Alias].child
        if (!keyExpr.semanticEquals(srcKeyExpr)) refuse(
          s"the ON key `${srcKeyExpr.sql}` and the ${keyAttr.name} " +
            s"assignment `${keyExpr.sql}` differ — the feed's key column " +
            "must be the join key, or matched rows would mask under one " +
            "key and re-insert under another")
        SnapshotMergeSqlCommand(dir, Project(feedExprs, source), keyAttr.name)
      case (ms, ns) =>
        refuse(s"action shape (${ms.map(_.getClass.getSimpleName).mkString("+")}" +
          s" / ${ns.map(_.getClass.getSimpleName).mkString("+")}) is unsupported")
    }
  }
}

/** `DELETE FROM snap.ns.t` (no WHERE) → [[SnapshotLog.truncate]]:
  * one metadata-only zero-file commit. */
case class SnapshotTruncateSqlCommand(dir: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotLog.truncate(dir): Unit
    Seq.empty
  }
}

/** `DELETE FROM snap.ns.t WHERE k IN (…)` → the MOR point delete.
  * Executes eagerly (a Command); the verb owns OCC, the mask sidecars,
  * and the manifest. */
case class SnapshotDeleteSqlCommand(dir: String, column: String,
    values: Seq[Any]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotLog.deleteWhereInMOR(spark, dir, column, values): Unit
    Seq.empty
  }
}

/** `DELETE FROM snap.ns.t WHERE <arbitrary predicate>` → the
  * general-predicate MOR delete. The condition re-resolves by name
  * against the verb's own read ([[SnapshotSqlDml.unresolve]]) and
  * rides as a [[org.apache.spark.sql.Column]] — deliberately OPAQUE
  * to TreeNode traversal: a bare `Expression` constructor arg would
  * reach CheckAnalysis, which rejects the (by-design unresolved)
  * by-name references before the command could run. The verb prunes
  * files through the same stats+bloom translator the catalog pushes
  * scan filters through, then masks O(matching rows). */
case class SnapshotDeleteWhereSqlCommand(dir: String,
    cond: org.apache.spark.sql.Column) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotLog.deleteWhereMOR(spark, dir, cond): Unit
    Seq.empty
  }
}

/** `UPDATE snap.ns.t SET … WHERE <arbitrary predicate>` → the
  * general-predicate MOR update: mask + post-image append in one
  * commit, assignments re-resolving against the matched rows'
  * pre-images exactly like the membership form (the condition rides
  * opaque for the same CheckAnalysis reason as the delete's). */
case class SnapshotUpdateWhereSqlCommand(dir: String,
    cond: org.apache.spark.sql.Column, sets: Seq[(String, Expression)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotLog.updateWhereMOR(spark, dir, cond,
      sets.map { case (n, e) => n -> Bridge.column(e) }.toMap): Unit
    Seq.empty
  }
}

/** `UPDATE snap.ns.t SET … WHERE k IN (…)` → the MOR point update.
  * Assignment expressions arrive with by-name unresolved column refs
  * and re-resolve against the verb's own masked read of the matched
  * rows — `SET v = v + 1` sees the pre-image, exactly the Scala
  * `updateWhereInMOR(set = Map("v" -> col("v") + 1))`. */
case class SnapshotUpdateSqlCommand(dir: String, column: String,
    values: Seq[Any], sets: Seq[(String, Expression)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotLog.updateWhereInMOR(spark, dir, column, values,
      sets.map { case (n, e) => n -> Bridge.column(e) }.toMap): Unit
    Seq.empty
  }
}

/** `MERGE INTO snap.ns.t USING …` → the MOR merge. `feed` is the
  * source plan projected to the table's columns + the op label
  * (built at analysis from the statement's own resolved assignment
  * expressions — no re-resolution ambiguity); the verb's feed
  * require()s (one row per key, exact column types) are SQL MERGE's
  * cardinality and type checks. */
case class SnapshotMergeSqlCommand(dir: String, feed: LogicalPlan,
    key: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotLog.mergeIntoMOR(spark, dir, Bridge.ofRows(spark, feed), key): Unit
    Seq.empty
  }
}
