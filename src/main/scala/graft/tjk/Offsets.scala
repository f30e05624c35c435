package graft.tjk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O4 lag/lead + O6 forward-fill (SURVEY.md §2.1).
  *
  * Order within entity is the stable total order (turn_idx, ts) mandated by
  * BASELINE.json:15. `lead` looks into the future by construction — it exists
  * for label/target building and is flagged leaky-by-design via the
  * `__leaky_` column-name prefix so pipeline assembly can refuse to mix it
  * into feature sets.
  */
object Offsets {

  def lags(
      df: DataFrame,
      entity: String,
      order: Seq[String],
      specs: Seq[(String, Int)]): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(order.map(col): _*)
    specs.foldLeft(df) { case (d, (c, n)) =>
      d.withColumn(s"lag_${c}_$n", lag(col(c), n).over(w))
    }
  }

  def leads(
      df: DataFrame,
      entity: String,
      order: Seq[String],
      specs: Seq[(String, Int)]): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(order.map(col): _*)
    specs.foldLeft(df) { case (d, (c, n)) =>
      d.withColumn(s"__leaky_lead_${c}_$n", lead(col(c), n).over(w))
    }
  }

  /** Forward-fill: carry the last non-null value forward (never backward —
    * backward fill would leak future values into the past).
    */
  def ffill(
      df: DataFrame,
      entity: String,
      order: Seq[String],
      cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0L)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(s"ffill_$c", last(col(c), ignoreNulls = true).over(w))
    }
  }
}
