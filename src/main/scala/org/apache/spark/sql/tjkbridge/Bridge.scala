package org.apache.spark.sql.tjkbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into `private[sql]` surface needed to run a custom
  * LogicalPlan as a DataFrame and to inject a planner strategy at runtime.
  * Lives under `org.apache.spark.sql` for access; contains NO logic beyond
  * delegation — everything interesting stays in `graft.tjk.plans`.
  *
  * (`spark.sql.extensions` + [[graft.tjk.plans.TjkExtensions]] is the
  * config-time equivalent for production clusters; the runtime injection
  * path exists so library calls work on any already-built session, e.g. the
  * driver-owned Verify/Bench sessions this repo must not modify.)
  */
object Bridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Idempotently add a strategy to the session's extra planner strategies.
    * The check-and-set is synchronized on the (session-shared) experimental
    * methods object: two threads racing the first call would otherwise drop
    * or double-insert the strategy.
    */
  def injectStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.experimental.synchronized {
      if (!cs.experimental.extraStrategies.contains(strategy)) {
        cs.experimental.extraStrategies =
          strategy +: cs.experimental.extraStrategies
      }
    }
  }
}
