package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, IntegerLiteral}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftplan.PlanBridge

/** Total-output-order audit for the driver catalog.
  *
  * The driver's correctness hash is ORDER-SENSITIVE, so "ends in a global
  * Sort" (the shape contract in SparkEntryContractSpec) is necessary but
  * not sufficient: if two DISTINCT output rows tie on the sort keys, Spark
  * and DuckDB may deliver them in either order and the hash flips on
  * scheduler whim — the r10 `q_bm25_topk` red cell (no sort at all) and
  * the r11 `q_ds65_min_avg` near-miss (sorted on (s_name, p_name), which
  * collide across partkeys) are both this bug. This audit checks the
  * DATA-level property directly: within every sort-key tie group that can
  * reach the output, all rows must be identical (then any delivery order
  * hashes the same, LIMIT boundaries included).
  *
  * Mechanics: peel the analyzed plan's order-preserving wrappers down to
  * the global Sort, tracking (a) the visible row identity — the entry's
  * output expressions substituted through intervening Projects, so columns
  * a top projection DROPS don't count as distinguishing — and (b) the
  * effective row cut from LIMIT/OFFSET literals (tie groups wholly beyond
  * the cut can't reach the output; a Filter between the cut and the Sort
  * voids the cut, conservatively auditing the whole relation). Then one
  * aggregate over the sorted child: group by the sort keys, count distinct
  * visible rows, flag groups with more than one.
  *
  * Used two ways: OrderAuditSpec runs it over the full catalog at sf0.001
  * on every test run, and the `main` audits any SF dir (the round protocol
  * runs it at sf0.01, the driver's gate scale, where tie collisions the
  * toy scale lacks actually appear — ds65's did). */
object OrderAudit {

  sealed trait Verdict { def ok: Boolean }
  /** Every tie group that can reach the output is row-identical. */
  case object TotalOrder extends Verdict { val ok = true }
  /** Provably ≤ 1 row: order is vacuous. */
  case object MaxOneRow extends Verdict { val ok = true }
  /** LIMIT 0: no rows. */
  case object LimitZero extends Verdict { val ok = true }
  case class Ambiguous(tieGroups: Long, sampleKey: String) extends Verdict { val ok = false }
  case class NoGlobalSort(top: String) extends Verdict { val ok = false }
  case class Unauditable(reason: String) extends Verdict { val ok = false }

  /** Provably ≤ 1 output row: a grouping-free Aggregate, or joins /
    * order-preserving wrappers over such. NOT `LIMIT 1` over an unsorted
    * multi-row input — that's one row of nondeterministic CONTENT. */
  def maxOneRow(plan: LogicalPlan): Boolean = plan match {
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case j: Join => maxOneRow(j.left) && maxOneRow(j.right)
    case p: Project => maxOneRow(p.child)
    case f: Filter => maxOneRow(f.child)
    case s: SubqueryAlias => maxOneRow(s.child)
    case w: WithCTE => maxOneRow(w.plan)
    case _ => false
  }

  /** Static shape check (the cheap contract): does the plan end in a
    * global Sort under order-preserving wrappers, a ≤1-row aggregate, or
    * LIMIT 0? The data-level audit below subsumes this but costs an
    * execution; the shape check runs on the analyzed plan alone. */
  def deterministicOrderShape(plan: LogicalPlan): Boolean = plan match {
    case s: Sort if s.global => true
    case _ if maxOneRow(plan) => true
    case GlobalLimit(IntegerLiteral(0), _) => true
    case p: Project => deterministicOrderShape(p.child)
    case f: Filter => deterministicOrderShape(f.child)
    case l: GlobalLimit => deterministicOrderShape(l.child)
    case l: LocalLimit => deterministicOrderShape(l.child)
    case o: Offset => deterministicOrderShape(o.child)
    case s: SubqueryAlias => deterministicOrderShape(s.child)
    case w: WithCTE => deterministicOrderShape(w.plan)
    case _ => false
  }

  def audit(spark: SparkSession, df: DataFrame): Verdict = {
    val analyzed = df.queryExecution.analyzed
    if (maxOneRow(analyzed)) return MaxOneRow

    // Peel wrappers down to the global Sort, folding Projects into the
    // visible row identity and LIMIT/OFFSET literals into the row cut.
    var visible: Seq[Expression] = analyzed.output
    // Effective row cut: min over GlobalLimit literals (a .limit(n) plans
    // as GlobalLimit(n, LocalLimit(n, _)) — summing both double-counts;
    // LocalLimit is ignored as the conservative side), plus any Offset
    // below it (offset rows still influence WHICH rows survive the cut).
    var cut: Option[Long] = None
    var cutKnown = true   // false once a non-literal limit/offset appears
    var filterBelowCut = false
    // CTE defs peeled on the way down: the Sort subtree's CTERelationRefs
    // resolve against these, so the audit plan must be re-wrapped in them
    // (peeling WithCTE away left dangling refs — "key not found: <defId>")
    var cteDefs: Seq[CTERelationDef] = Nil

    def substitute(projectList: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]): Unit = {
      val byId = projectList.map {
        case a: Alias => a.exprId -> a.child
        case ne => ne.exprId -> (ne: Expression)
      }.toMap
      visible = visible.map(_.transformUp {
        case a: Attribute if byId.contains(a.exprId) => byId(a.exprId)
      })
    }

    @annotation.tailrec
    def peel(p: LogicalPlan): Option[Sort] = p match {
      case s: Sort if s.global => Some(s)
      case GlobalLimit(IntegerLiteral(0), _) => None // caller maps to LimitZero
      case l: GlobalLimit =>
        l.limitExpr match {
          case IntegerLiteral(n) => cut = Some(cut.fold(n.toLong)(math.min(_, n.toLong)))
          case _ => cutKnown = false
        }
        peel(l.child)
      case l: LocalLimit => peel(l.child) // per-partition; GlobalLimit governs
      case o: Offset =>
        o.offsetExpr match {
          case IntegerLiteral(n) => cut = cut.map(_ + n)
          case _ => if (cut.isDefined) cutKnown = false
        }
        peel(o.child)
      case pr: Project => substitute(pr.projectList); peel(pr.child)
      case f: Filter => if (cut.isDefined) filterBelowCut = true; peel(f.child)
      case s: SubqueryAlias => peel(s.child)
      case w: WithCTE => cteDefs = cteDefs ++ w.cteDefs; peel(w.plan)
      case _ => None
    }

    analyzed match {
      case GlobalLimit(IntegerLiteral(0), _) => return LimitZero
      case _ =>
    }
    peel(analyzed) match {
      case None => NoGlobalSort(analyzed.nodeName)
      case Some(s) =>
        try {
          val keyAliases = s.order.zipWithIndex.map { case (o, i) =>
            Alias(o.child, s"__k$i")()
          }
          val valAliases = visible.zipWithIndex.map { case (e, i) =>
            Alias(e, s"__v$i")()
          }
          val audited: LogicalPlan = {
            val p = Project(keyAliases ++ valAliases, s)
            if (cteDefs.isEmpty) p else WithCTE(p, cteDefs)
          }
          val projected = PlanBridge.ofRows(spark, audited)
          // LIMIT/OFFSET prefix + 1: a tie group straddling the boundary
          // swaps WHICH row is cut, so the first out-of-cut row must join
          // the audit. A Filter between cut and Sort re-indexes the
          // boundary data-dependently — void the cut, audit everything.
          val scoped = cut match {
            case Some(n) if cutKnown && !filterBelowCut && n + 1 <= Int.MaxValue =>
              projected.limit((n + 1).toInt)
            case _ => projected
          }
          val keyCols = s.order.indices.map(i => col(s"__k$i"))
          val valStruct = struct(visible.indices.map(i => col(s"__v$i")): _*)
          val offending = scoped
            .groupBy(keyCols: _*)
            .agg(countDistinct(valStruct).as("__nd"))
            .filter(col("__nd") > 1)
          val sample = offending.limit(1).collect()
          if (sample.isEmpty) TotalOrder
          else {
            val n = offending.count()
            val key = sample.head.toSeq.dropRight(1).mkString(", ")
            Ambiguous(n, key)
          }
        } catch {
          case e: Exception => Unauditable(s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
    }
  }

  /** Audit the full driver catalog against one SF dir; returns offenders. */
  def auditCatalog(spark: SparkSession, sfDir: String,
      log: String => Unit = _ => ()): Seq[(String, Verdict)] = {
    graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val v =
        try audit(spark, fn(spark, sfDir))
        catch { case e: Exception =>
          Unauditable(s"entry failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      log(f"$name%-28s $v")
      if (v.ok) None else Some(name -> v)
    }
  }

  /** Round-protocol main: `runMain graft.plans.OrderAudit <sfDir>` — run
    * at sf0.01 (the driver gate scale) before round close; exits 1 and
    * names the entries whose output order the scheduler could scramble. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bad = auditCatalog(spark, sfDir, println)
    if (bad.nonEmpty) {
      System.err.println(s"AMBIGUOUS OUTPUT ORDER (${bad.size}): " +
        bad.map(_._1).mkString(", "))
      sys.exit(1)
    }
    println(s"order audit clean: every entry totally ordered at $sfDir")
  }
}
