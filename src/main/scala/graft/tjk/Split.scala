package graft.tjk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test splitting for feature pipelines — the reference family's
  * out-of-time split plus an entity-level holdout, both deterministic and
  * leakage-aware (SURVEY.md §0.3 places the reference's time-based split in
  * the pipeline half we reimplement; model training itself stays out of
  * scope).
  *
  *  - [[timeSplit]]: out-of-time (OOT) split at a boundary timestamp —
  *    train strictly before, test at/after. The split axis IS event time,
  *    so combined with the engine's strict-past frames nothing in train
  *    features can derive from test-period rows.
  *  - [[entityHoldout]]: whole-entity split by an md5-derived hash bucket:
  *    a conversation lands WHOLLY in one side, so no entity's history
  *    straddles the boundary (the subtle leak a row-level random split
  *    causes when per-entity window features are in play). md5, not
  *    xxhash64, so external engines replicate the assignment bit-for-bit;
  *    fraction granularity is 1/256 (two hex chars).
  */
object Split {

  def timeSplit(df: DataFrame, tsCol: String, boundary: String): DataFrame =
    df.withColumn("split",
      when(col(tsCol) < lit(boundary).cast("timestamp_ntz"), "train")
        .otherwise("test"))

  /** Deterministic per-entity bucket in [0, 256): the last two hex chars of
    * md5(entity), the same formula the DuckDB oracle evaluates.
    */
  def entityBucket(entity: Column): Column =
    conv(substring(md5(entity), 31, 2), 16, 10).cast("int")

  def entityHoldout(df: DataFrame, entity: String, testFraction: Double): DataFrame = {
    require(testFraction >= 0 && testFraction <= 1, s"bad fraction $testFraction")
    val cut = math.round(testFraction * 256).toInt
    df.withColumn("split",
      when(entityBucket(col(entity)) < cut, "test").otherwise("train"))
  }
}
