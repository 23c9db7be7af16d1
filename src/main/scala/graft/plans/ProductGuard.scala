package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Session-installable scale guard: refuses, at ANALYSIS time, any plan
  * containing a condition-less join — the accidental Cartesian product
  * that turns into a cluster-wide incident at 100 TB (a fact-table
  * product is O(n²) rows before the first filter runs).
  *
  * This is the runtime companion of the test-time plan audit
  * (ScaleSpec's global "no Cartesian product" sweep over the whole
  * registry): the audit catches products in REGISTERED queries before
  * they ship; the guard catches them in ad-hoc user queries on a live
  * session, where no test ran.
  *
  * Opt-in by session conf `spark.graft.guard.products=true` (default
  * off — analysis behavior is unchanged unless a deployment asks for
  * the guard). Deliberate, audited products (broadcast_to's dimension
  * crossJoin, sim1's broadcast query set) run with the guard disabled
  * around them — the same discipline the registry's BNLJ allowlist
  * enforces in tests. Non-equi joins WITH a condition (range/theta)
  * pass the guard: they may still plan as BNLJ, which is the audit's
  * job to bound; the guard targets the silent missing-join-key class
  * of accident specifically.
  *
  * Wired via `SparkSessionExtensions.injectCheckRule` in
  * [[graft.functions.GraftExtensions]], so any session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` carries it.
  */
object ProductGuard {
  val ConfKey = "spark.graft.guard.products"

  def check(spark: SparkSession)(plan: LogicalPlan): Unit =
    if (spark.conf.getOption(ConfKey).contains("true")) {
      plan.foreach {
        case j: Join if j.condition.isEmpty =>
          throw new IllegalStateException(
            s"[graft] product join refused ($ConfKey=true): a " +
              s"${j.joinType.sql} join with no condition multiplies its " +
              "inputs. Add the join keys, or disable the guard around a " +
              "deliberate, size-audited product.")
        case _ => ()
      }
    }
}
