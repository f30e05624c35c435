package graft.tjk

import java.time.Duration
import org.apache.spark.sql.DataFrame

/** O5 — feature backfill: materialize the feature matrix at EVERY historical
  * `(conv_id, ts)` of the transcript table (the spine is the table itself, so
  * no join is needed — BASELINE.json:2 "windowed feature backfill"). External
  * event tables are attached point-in-time via AsOf. All window features
  * share one `partitionBy(conv_id)` family, so the whole backfill costs one
  * exchange plus per-frame sorts (SURVEY.md §4.1 exchange reuse).
  */
case class FeatureSpec(
    rolling: Seq[RollingSpec] = Nil,
    rows: Seq[RowsSpec] = Nil,
    lags: Seq[(String, Int)] = Nil,
    ffillCols: Seq[String] = Nil,
    sessionGap: Option[Duration] = None)

object Pipeline {

  /** `skewPolicy` threads to every rolling call: pass
    * [[SkewPolicy.Precomputed]] when the pipeline already materialized
    * per-entity counts (the O10 manifest aggregation) so a multi-window
    * backfill never runs a detection scan; under the default Auto, the
    * session detection cache (Rolling.detectHotKeysCached) already
    * collapses repeated calls over the same input to ONE detection job.
    */
  def backfill(
      turns: DataFrame,
      spec: FeatureSpec,
      entity: String = "conv_id",
      tsCol: String = "ts",
      tieCol: String = "turn_idx",
      skewPolicy: SkewPolicy = SkewPolicy.Auto): DataFrame = {
    var df = turns
    if (spec.rolling.nonEmpty)
      df = Rolling.rollingAgg(df, entity, tsCol, spec.rolling, skewPolicy)
    if (spec.rows.nonEmpty) df = Rolling.rowsAgg(df, entity, tsCol, tieCol, spec.rows)
    if (spec.lags.nonEmpty) df = Offsets.lags(df, entity, Seq(tieCol, tsCol), spec.lags)
    if (spec.ffillCols.nonEmpty) df = Offsets.ffill(df, entity, Seq(tsCol, tieCol), spec.ffillCols)
    spec.sessionGap.foreach { g => df = Sessionize.sessionize(df, entity, tsCol, tieCol, g) }
    df
  }
}
