package graft

import graft.tjk.Turn

/** The executable pinning oracle (SURVEY.md §0.3, §5 layer 2): deliberately
  * naive, single-threaded, obviously-correct implementations of the operator
  * semantics. "Matches the reference (allclose)" is operationalized as
  * "matches this oracle" — the only falsifiable reading available given the
  * empty reference checkout (SURVEY.md §0.1).
  */
object NaiveOracle {

  def micros(t: java.sql.Timestamp): Long = t.getTime * 1000L

  case class RollRes(
      count: Long, sum: Option[Double], mean: Option[Double],
      min: Option[Double], max: Option[Double], nunique: Long)

  /** Rolling trailing time window per conversation. `num` feeds
    * count/sum/mean/min/max (None = SQL null, ignored); `distinctF` feeds
    * nunique. Frame: ts' ∈ [ts − W, ts], strict ⇒ [ts − W, ts).
    */
  def rolling(
      turns: Seq[Turn],
      num: Turn => Option[Double],
      distinctF: Turn => Option[Any],
      wMicros: Long,
      strict: Boolean): Map[(String, Int), RollRes] =
    turns.groupBy(_.conv_id).flatMap { case (cid, conv) =>
      conv.map { t =>
        val t0 = micros(t.ts)
        val frame = conv.filter { u =>
          val um = micros(u.ts)
          um >= t0 - wMicros && (if (strict) um < t0 else um <= t0)
        }
        val nums = frame.flatMap(num(_))
        val dist = frame.flatMap(distinctF(_)).distinct
        (cid, t.turn_idx) -> RollRes(
          count = nums.size.toLong,
          sum = if (nums.isEmpty) None else Some(nums.sum),
          mean = if (nums.isEmpty) None else Some(nums.sum / nums.size),
          min = nums.minOption,
          max = nums.maxOption,
          nunique = dist.size.toLong)
      }
    }

  /** Backward as-of: greatest event ts ≤ asof (strict: <), ties by greatest
    * tie value; tolerance nulls matches older than asof − tol.
    */
  def asof(
      spine: Seq[(String, Long)], // (entity, asofMicros)
      events: Seq[(String, Long, Long, Double)], // (entity, tsMicros, tie, payload)
      strict: Boolean,
      tolMicros: Option[Long]): Seq[Option[Double]] =
    spine.map { case (e, asofTs) =>
      val cands = events.filter { case (ee, ts, _, _) =>
        ee == e && (if (strict) ts < asofTs else ts <= asofTs)
      }
      if (cands.isEmpty) None
      else {
        val best = cands.maxBy { case (_, ts, tie, _) => (ts, tie) }
        tolMicros match {
          case Some(tol) if asofTs - best._2 > tol => None
          case _ => Some(best._4)
        }
      }
    }

  /** Session sequence per turn: new session when gap > threshold, order by
    * (ts, turn_idx); seq starts at 1.
    */
  def sessionSeq(turns: Seq[Turn], gapMicros: Long): Map[(String, Int), Long] =
    turns.groupBy(_.conv_id).flatMap { case (cid, conv) =>
      val sorted = conv.sortBy(t => (micros(t.ts), t.turn_idx))
      var seq = 0L
      var prev = Long.MinValue
      sorted.map { t =>
        val tm = micros(t.ts)
        if (prev == Long.MinValue || tm - prev > gapMicros) seq += 1
        prev = tm
        (cid, t.turn_idx) -> seq
      }
    }

  def allclose(a: Option[Double], b: Option[Double],
      atol: Double = 1e-9, rtol: Double = 1e-6): Boolean = (a, b) match {
    case (None, None) => true
    case (Some(x), Some(y)) => math.abs(x - y) <= atol + rtol * math.abs(y)
    case _ => false
  }
}
