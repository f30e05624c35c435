package graft.tjk

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  case class RollingEvent(conv_id: String, turn_idx: Int,
      ts: java.sql.Timestamp, value: Double)
  case class RollingFeature(conv_id: String, turn_idx: Int,
      ts: java.sql.Timestamp, count_w: Long, sum_w: Double)
  case class RollState(events: Seq[(Long, Double)])

  /** Incremental trailing-window features (count/sum over `[ts − W, ts]`)
    * via `flatMapGroupsWithState` — the custom-state streaming path for the
    * rolling semantics session_window cannot express (SURVEY.md §2.8).
    *
    * Per entity, state is exactly the window's live event set
    * `(ts_micros, value)`; each micro-batch's rows are processed in
    * event-time order in equal-ts groups (same frame convention as the
    * batch engine: all equal-ts rows see each other — O2's RANGE frame),
    * older events are evicted as the frame slides, and each input row emits
    * one feature row identical to [[Rolling.rollingAgg]]'s for in-order
    * arrival. State is bounded by the window width; entities silent past
    * watermark + window time out and their state is dropped (the streaming
    * analogue of O8's chunk hand-off: nothing outside `[max_ts − W, max_ts]`
    * is ever needed again).
    */
  def rollingStream(
      df: DataFrame, // streaming, transcript schema + value
      windowMicros: Long,
      watermark: String): Dataset[RollingFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("conv_id", "turn_idx", "ts", "value").as[RollingEvent]
      .withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[RollingEvent], state: GroupState[RollState]) => {
          // java.sql.Timestamp → epoch micros (getTime carries millis;
          // getNanos the full sub-second part)
          def micros(ts: java.sql.Timestamp): Long =
            ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
          if (rows.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var window = state.getOption.map(_.events.toVector)
              .getOrElse(Vector.empty[(Long, Double)])
            val batch = rows.toVector.sortBy(e => (micros(e.ts), e.turn_idx))
            val out = Vector.newBuilder[RollingFeature]
            var i = 0
            while (i < batch.size) {
              val t = micros(batch(i).ts)
              // equal-ts group: all rows at t enter the frame together
              var j = i
              while (j < batch.size && micros(batch(j).ts) == t) j += 1
              window = window.dropWhile(_._1 < t - windowMicros) ++
                batch.slice(i, j).map(e => (micros(e.ts), e.value))
              val cnt = window.size.toLong
              val sum = window.iterator.map(_._2).sum
              (i until j).foreach { r =>
                out += RollingFeature(key, batch(r).turn_idx, batch(r).ts, cnt, sum)
              }
              i = j
            }
            state.update(RollState(window))
            val maxTsMs = batch.last.ts.getTime
            state.setTimeoutTimestamp(maxTsMs + windowMicros / 1000L + 1L)
            out.result().iterator
          }
        })
  }
}
