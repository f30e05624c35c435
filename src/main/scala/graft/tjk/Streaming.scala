package graft.tjk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (Structured Streaming) mode — SURVEY.md §2.8 / §7.6 stretch.
  *
  * The batch engine's session form (b) was chosen precisely so the SAME
  * expression (`session_window(ts, gap)`) drives both modes: one code path,
  * batch/stream parity by construction (pinned in StreamingSuite). Watermark
  * bounds state: sessions older than the watermark are finalized and their
  * state dropped — the streaming analogue of the batch job's bucket commit.
  *
  * Scale shape: state is keyed by (conv_id, session), partitioned by the
  * shuffle on conv_id; late rows beyond the watermark are dropped rather than
  * corrupting closed sessions (the streaming equivalent of zero leakage into
  * already-emitted feature rows).
  */
object Streaming {

  /** Streaming session aggregates over an (append) stream of turns.
    * `df` must be a streaming DataFrame with the transcript schema.
    */
  def sessionAggStream(
      df: DataFrame,
      entity: String,
      tsCol: String,
      gapExpr: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(col(entity), session_window(col(tsCol), gapExpr))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_turns"))
      .withColumnRenamed("session_window", "session_bounds")

  /** Streaming exact dedup within the watermark horizon — the incremental
    * counterpart of TextOps.exactDedup for continuously-arriving documents.
    */
  def dedupStream(df: DataFrame, tsCol: String, watermark: String, keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)
}
