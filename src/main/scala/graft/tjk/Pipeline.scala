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

  /** `skewPolicy` threads to every rolling call. Under the default Auto:
    * if [[Lineage.entityManifest]] ran over this input in this session, its
    * published counts answer the hot-key query with ZERO detection scans
    * (the registry in Rolling); otherwise one detection job runs, and the
    * session detection cache collapses repeated calls over the same input
    * to that ONE job. [[SkewPolicy.Precomputed]] stays for callers holding
    * an explicit counts frame (e.g. read back from manifest files in a NEW
    * session, where the registry is empty).
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
