package graft.tjk

import java.sql.Timestamp
import java.time.Duration
import org.apache.spark.sql.types._

/** Input row shape mandated by BASELINE.json:15 (SURVEY.md §1.1).
  * The reference checkout is empty (SURVEY.md §0.1), so no reference
  * file:line citations are possible; semantics are pinned by the in-repo
  * oracle (src/test/scala/graft/NaiveOracle.scala) per SURVEY.md §0.3.
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

object Turn {
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))
}

/** Rolling aggregate kinds (BASELINE.json:6: count/sum/mean/min/max/nunique). */
sealed trait Agg { def name: String }
object Agg {
  case object Count extends Agg { val name = "count" }
  case object Sum extends Agg { val name = "sum" }
  case object Mean extends Agg { val name = "mean" }
  case object Min extends Agg { val name = "min" }
  case object Max extends Agg { val name = "max" }
  case object NUnique extends Agg { val name = "nunique" }
  val all: Seq[Agg] = Seq(Count, Sum, Mean, Min, Max, NUnique)
  def byName(n: String): Agg = all.find(_.name == n).getOrElse(
    throw new IllegalArgumentException(s"unknown agg: $n"))
}

/** Skew policy for [[Rolling.rollingAgg]] (SURVEY.md §4.2: AQE splits
  * skewed JOINS only — a Window node still processes each hot entity on ONE
  * task, so the engine must route hot entities itself).
  */
sealed trait SkewPolicy
object SkewPolicy {
  /** DEFAULT: detect hot entities (per-entity row count over the session
    * threshold `spark.graft.rolling.hotThreshold`, sampled on large inputs)
    * and route them through the exact chunked path; everything else keeps
    * the single-Window-node plan. Costs one cheap detection job at plan
    * construction; results are identical either way (chunking is
    * result-invariant, property-pinned in SkewSuite).
    */
  case object Auto extends SkewPolicy
  /** Auto with an explicit per-entity row threshold (rows > threshold ⇒ hot). */
  final case class Guarded(hotThreshold: Long) extends SkewPolicy
  /** Single Window node, no detection job — for inputs KNOWN to carry no hot
    * entity (tiny dimensions, pre-bucketed slices) or for benchmarking the
    * raw window path. A whale entity on this path owns one task end-to-end.
    */
  case object WindowOnly extends SkewPolicy
  /** Route from CALLER-SUPPLIED per-entity counts — the O10 lineage/manifest
    * aggregation shape (SURVEY.md §4.2 "reuse, don't re-scan"): `counts`
    * must carry the entity column plus `countCol` (e.g.
    * `df.groupBy(entity).count()` — hand over a MATERIALIZED frame: the
    * threshold filter evaluates the counts plan, so a lazy unpersisted
    * groupBy would re-scan the input, which is the cost this policy exists
    * to avoid; the session cache covers repeated calls either way). No
    * detection scan runs at all; entities with count ≥ the session
    * `spark.graft.rolling.hotThreshold` route to the chunked path. Exact
    * counts, exact threshold — no sampling cutoff. Inside
    * [[Resume.runBucketed]] jobs this preserves the strict one-input-scan
    * budget that Auto's detection job would break.
    */
  final case class Precomputed(
      counts: org.apache.spark.sql.DataFrame,
      countCol: String = "count") extends SkewPolicy
}

/** One time-window rolling feature: agg(col) over the trailing window
  * [ts − window, ts] (strict ⇒ [ts − window, ts), zero-leakage either way —
  * the frame upper bound never exceeds the current row's ts).
  */
case class RollingSpec(
    col: String,
    agg: Agg,
    window: Duration,
    strict: Boolean = false) {
  def windowMicros: Long = window.toMillis * 1000L
  def outName: String =
    s"${agg.name}_${col}_${window.toSeconds}s" + (if (strict) "_strict" else "")
}

/** One row-frame rolling feature: agg(col) over the trailing n rows
  * (current row included), ordered by (ts, tieCol) within the entity.
  */
case class RowsSpec(col: String, agg: Agg, rowsBack: Int) {
  def outName: String = s"${agg.name}_${col}_r${rowsBack}"
}
