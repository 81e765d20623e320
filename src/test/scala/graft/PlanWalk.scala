package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}

/** Executed-plan walker shared by the plan-shape suites (BucketingSpec,
  * PlanBudgetSpec). AQE query stages are LEAF nodes whose real subtree
  * hangs off `.plan`, so a plain `collect` never sees inside them — walk
  * through explicitly and assert on the plan that actually RAN. */
object PlanWalk {

  /** Final adaptive plan (AQE re-plans at runtime; assert on what ran).
    * Call AFTER an action on `df` or the adaptive plan is not final. */
  def finalPlan(df: DataFrame): SparkPlan = {
    val exec = df.queryExecution.executedPlan
    exec.collectFirst { case a: AdaptiveSparkPlanExec => a }
      .map(_.executedPlan).getOrElse(exec)
  }

  def allNodes(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(allNodes)) ++ (p match {
      case q: QueryStageExec => allNodes(q.plan)
      case r: ReusedExchangeExec => allNodes(r.child)
      case _ => Nil
    })

  /** Structural fingerprint of an executed plan. `reused*` are counted
    * separately: a ReusedExchange costs nothing at runtime, so budgets
    * pin the DISTINCT exchanges. */
  case class Shape(
      shuffles: Int, broadcasts: Int, joins: Int, smj: Int,
      cartesian: Int, bnlj: Int, scans: Int,
      rawShuffles: Int = 0, rawBroadcasts: Int = 0) {
    override def toString: String =
      s"Shape(shuffles=$shuffles, broadcasts=$broadcasts, joins=$joins, " +
        s"smj=$smj, cartesian=$cartesian, bnlj=$bnlj, scans=$scans, " +
        s"rawShuffles=$rawShuffles, rawBroadcasts=$rawBroadcasts)"
  }

  /** Executes `df` (collect) and fingerprints the final adaptive plan. */
  def shapeOf(df: DataFrame): Shape = {
    df.collect()
    val reused = new scala.collection.mutable.HashSet[Int]
    def walk(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(walk)) ++ (p match {
        case q: QueryStageExec => walk(q.plan)
        case r: ReusedExchangeExec => reused += r.child.id; Nil
        case _ => Nil
      })
    val nodes = walk(finalPlan(df))
    // Exchanges dedupe by CANONICALIZED subtree, not node identity: AQE
    // exchange reuse is best-effort — two identical exchanges whose
    // stages materialize concurrently can both survive as distinct
    // nodes instead of one + ReusedExchange, purely a scheduler race
    // (q94 under a loaded suite measured 5 raw shuffle nodes, 2
    // distinct computations). A REAL shape regression (an added rejoin,
    // a lost broadcast) has a different canonical subtree and still
    // counts; identical-subtree duplicates are the same computation.
    // ... but the RAW node counts are reported alongside (r14 advice):
    // canonical dedup would also mask a LOST-PERSIST regression where
    // the identical exchange genuinely executes twice (same canonical
    // form, double the runtime). PlanBudgetSpec asserts
    // raw <= distinct + slack so duplicated computation stays visible.
    def distinctExchanges(pred: SparkPlan => Boolean): Int =
      nodes.filter(pred).map(_.canonicalized).distinct.size
    Shape(
      shuffles = distinctExchanges(_.isInstanceOf[ShuffleExchangeLike]),
      broadcasts = distinctExchanges(_.isInstanceOf[BroadcastExchangeLike]),
      rawShuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike]),
      rawBroadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeLike]),
      joins = nodes.count(_.isInstanceOf[BaseJoinExec]),
      smj = nodes.count(_.isInstanceOf[SortMergeJoinExec]),
      cartesian = nodes.count(_.isInstanceOf[CartesianProductExec]),
      bnlj = nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      // InMemoryTableScan counts as a source: with spark.graft.persist
      // active a cached corpus hides its file scan behind the cache, and
      // an injected rejoin shows up as an extra source either way
      scans = nodes.count(n =>
        n.isInstanceOf[FileSourceScanExec] || n.isInstanceOf[InMemoryTableScanExec]))
  }
}
