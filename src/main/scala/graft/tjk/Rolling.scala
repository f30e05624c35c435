package graft.tjk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** O2/O3 — rolling-window aggregates (SURVEY.md §2.1).
  *
  * Time frames are expressed as Catalyst range frames over `unix_micros(ts)`
  * (µs precision — SURVEY.md §7.3 item 4): `[ts − W, ts]`, or `[ts − W, ts)`
  * when `strict`. The frame upper bound never exceeds the current row's order
  * value, which is the structural zero-leakage guarantee (BASELINE.json:6);
  * leakage is never enforced by post-hoc filters (SURVEY.md §2.3).
  *
  * All specs share one `partitionBy(entity).orderBy(unix_micros(ts))` family
  * so Catalyst collapses them into a single shuffle+sort (§4.1 exchange
  * reuse): at 100 TB this means ONE exchange for the whole feature set, not
  * one per feature.
  *
  * Output types are unified (SURVEY.md §1.2): count/nunique → long,
  * sum/mean/min/max → double — so "allclose vs reference" is well-defined and
  * the skew-chunked path (Skew.scala) produces byte-identical schemas.
  */
object Rolling {

  /** Trailing time-window aggregates; adds one column per spec. */
  def rollingAgg(
      df: DataFrame,
      entity: String,
      tsCol: String,
      specs: Seq[RollingSpec]): DataFrame = {
    val base = Window.partitionBy(col(entity)).orderBy(tsMicros(col(tsCol)))
    specs.foldLeft(df) { (d, s) =>
      val upper = if (s.strict) -1L else 0L
      val frame = base.rangeBetween(-s.windowMicros, upper)
      d.withColumn(s.outName, aggColumn(s.agg, s.col, frame))
    }
  }

  /** Trailing row-frame aggregates over the stable total order
    * (ts, tieCol) within entity (BASELINE.json:15 stable turn ordering).
    */
  def rowsAgg(
      df: DataFrame,
      entity: String,
      tsCol: String,
      tieCol: String,
      specs: Seq[RowsSpec]): DataFrame = {
    val base =
      Window.partitionBy(col(entity)).orderBy(col(tsCol), col(tieCol))
    specs.foldLeft(df) { (d, s) =>
      val frame = base.rowsBetween(-s.rowsBack.toLong, 0L)
      d.withColumn(s.outName, aggColumn(s.agg, s.col, frame))
    }
  }

  /** Approximate windowed nunique — the bounded-memory FAST path for O3:
    * HyperLogLog++ over the same trailing range frame, O(1) sketch state per
    * frame evaluation vs collect_set's O(frame·distinct) heap. Use for
    * monitoring/coarse features where ±rsd is acceptable; the exact
    * bounded-memory path at skew scale is [[Skew.chunkedRollingAgg]] with
    * [[Agg.NUnique]] (incremental multiset, O(distinct-in-frame) total).
    */
  def approxRollingNunique(
      df: DataFrame,
      entity: String,
      tsCol: String,
      valueCol: String,
      window: java.time.Duration,
      rsd: Double = 0.05,
      strict: Boolean = false): DataFrame = {
    val micros = window.toMillis * 1000L
    val frame = Window.partitionBy(col(entity)).orderBy(tsMicros(col(tsCol)))
      .rangeBetween(-micros, if (strict) -1L else 0L)
    df.withColumn(
      s"approx_nunique_${valueCol}_${window.toSeconds}s" +
        (if (strict) "_strict" else ""),
      approx_count_distinct(col(valueCol), rsd).over(frame))
  }

  private[tjk] def aggColumn(agg: Agg, c: String, frame: WindowSpec): Column =
    agg match {
      case Agg.Count   => count(col(c)).over(frame)
      case Agg.Sum     => sum(col(c).cast("double")).over(frame)
      case Agg.Mean    => avg(col(c).cast("double")).over(frame)
      case Agg.Min     => min(col(c).cast("double")).over(frame)
      case Agg.Max     => max(col(c).cast("double")).over(frame)
      // Exact windowed nunique: size(collect_set) — verified on this Spark
      // (SURVEY.md §2.9). Memory is O(frame·distinct) per partition; the
      // approximate fast path is approx_count_distinct over the same frame.
      case Agg.NUnique => size(collect_set(col(c)).over(frame)).cast("long")
    }
}
