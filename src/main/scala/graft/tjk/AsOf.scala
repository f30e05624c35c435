package graft.tjk

import java.time.Duration
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** O1 — point-in-time / as-of join, backward direction (SURVEY.md §2.1).
  *
  * For each spine row `(entity, asof_ts)`, attach the payload of the single
  * event row with the same entity and the greatest `event_ts ≤ asof_ts`
  * (`strict` ⇒ `event_ts < asof_ts`); ties on `event_ts` broken by greatest
  * `tieCol` (stable ordering, BASELINE.json:15). Optional `tolerance`: a
  * match older than `asof_ts − tolerance` is nulled out. Spark 4.1.2 has no
  * native ASOF JOIN (probed — SURVEY.md §2.9), hence this operator.
  *
  * Two physical paths with identical results:
  *
  *  - [[asofJoin]] (primary, Catalyst-expressible): union-tag both sides,
  *    one window pass `last(payload, ignoreNulls)` over
  *    `(ts, tag, tie)` — a single shuffle + sort, fully codegen-planned,
  *    AQE-skew-aware. Scale shape: ONE exchange regardless of payload width.
  *  - [[asofJoinMerge]] (mandated fallback, BASELINE.json:6): repartition by
  *    entity + sortWithinPartitions, then a streaming two-pointer merge in
  *    `mapPartitions` over the co-sorted layout — O(1) memory per partition,
  *    for cases where window-frame semantics can't express the PIT variant.
  *
  * Zero-leakage is structural: an event can only be seen by spine rows that
  * sort after it (ties ordered by the tag so `strict`/non-strict is exact).
  */
object AsOf {

  /** Primary Catalyst path. `payload` = event columns to attach; they must
    * not collide with spine column names.
    */
  def asofJoin(
      spine: DataFrame,
      events: DataFrame,
      entity: String,
      spineTs: String,
      eventTs: String,
      payload: Seq[String],
      tieCol: Option[String] = None,
      tolerance: Option[Duration] = None,
      strict: Boolean = false,
      matchedTsCol: Option[String] = None): DataFrame = {
    requireMatchedTsColFree(matchedTsCol, spine, payload)
    val (sp, ev, spTag) = tagged(spine, events, entity, spineTs, eventTs, payload, tieCol, strict)
    val unioned = sp.unionByName(ev)
    val w = Window.partitionBy(col("__e"))
      .orderBy(col("__tm").asc, col("__tag").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0L)
    val matched = unioned
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__tag") === spTag)
    val withTol = applyTolerance(matched, tolerance)
    finish(withTol, payload, matchedTsCol)
  }

  /** Fallback: sort-merge over co-sorted partitions, streaming two-pointer in
    * mapPartitions (no window state; no whole-partition buffering).
    */
  def asofJoinMerge(
      spine: DataFrame,
      events: DataFrame,
      entity: String,
      spineTs: String,
      eventTs: String,
      payload: Seq[String],
      tieCol: Option[String] = None,
      tolerance: Option[Duration] = None,
      strict: Boolean = false,
      numPartitions: Option[Int] = None): DataFrame = {
    val (sp, ev, spTag) = tagged(spine, events, entity, spineTs, eventTs, payload, tieCol, strict)
    val unioned = sp.unionByName(ev)
    val parts = numPartitions.getOrElse(unioned.sparkSession.sessionState.conf.numShufflePartitions)
    // Co-partition by entity, co-sort on (entity, ts, tag, tie) — the layout
    // mandated by BASELINE.json:6 for the merge fallback.
    val sorted = unioned
      .repartition(parts, col("__e"))
      .sortWithinPartitions(col("__e"), col("__tm"), col("__tag"), col("__tie"))

    val spineSchema = spine.schema
    val paySchema = ev.schema("__pay").dataType.asInstanceOf[StructType]
    val outSchema = StructType(
      spineSchema.fields ++
        payload.map(p => paySchema(p).copy(nullable = true)))
    val tolMicros = tolerance.map(d => d.toMillis * 1000L)

    val sortedSchema = sorted.schema
    val eIdx = sortedSchema.fieldIndex("__e")
    val tmIdx = sortedSchema.fieldIndex("__tm")
    val tagIdx = sortedSchema.fieldIndex("__tag")
    val payIdx = sortedSchema.fieldIndex("__pay")
    val rowIdx = sortedSchema.fieldIndex("__row")
    val nPay = payload.size
    val spTagV = spTag

    sorted.mapPartitions { it =>
      var curEntity: Any = new Object // sentinel unequal to anything
      var lastPay: Row = null
      it.flatMap { r =>
        val e = r.get(eIdx)
        if (!java.util.Objects.equals(e, curEntity)) { curEntity = e; lastPay = null }
        if (r.getInt(tagIdx) != spTagV) {
          lastPay = r.getStruct(payIdx) // event: advance the merge pointer
          Iterator.empty
        } else {
          val spineRow = r.getStruct(rowIdx)
          val ok = lastPay != null && (tolMicros match {
            case Some(tol) =>
              !r.isNullAt(tmIdx) && (r.getLong(tmIdx) - lastPay.getLong(0)) <= tol
            case None => true
          })
          val payVals: Seq[Any] =
            if (ok) (1 to nPay).map(lastPay.get)
            else Seq.fill[Any](nPay)(null)
          Iterator(Row.fromSeq(spineRow.toSeq ++ payVals))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Native Catalyst path (SURVEY.md §4.3 extension 2): plans through the
    * custom [[graft.tjk.plans.AsOfJoinPlan]] logical node →
    * [[graft.tjk.plans.AsOfJoinExec]] streaming sort-merge operator.
    * Same semantics and signature as [[asofJoin]]; one exchange per side,
    * O(1) merge state. The strategy is injected into the session
    * idempotently, so this works on any session (incl. the driver-owned
    * Verify/Bench sessions); production can instead set
    * `spark.sql.extensions=graft.tjk.plans.TjkExtensions`.
    */
  def asofJoinNative(
      spine: DataFrame,
      events: DataFrame,
      entity: String,
      spineTs: String,
      eventTs: String,
      payload: Seq[String],
      tieCol: Option[String] = None,
      tolerance: Option[Duration] = None,
      strict: Boolean = false,
      matchedTsCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.tjkbridge.Bridge
    val collisions = payload.toSet.intersect(spine.columns.toSet)
    require(collisions.isEmpty, s"payload collides with spine columns: $collisions")
    requireMatchedTsColFree(matchedTsCol, spine, payload)
    // Reserved internal attribute names: a spine __ltm would be silently
    // replaced by withColumn below; a payload __re/__rtm/__rtie would shadow
    // the right side's join attributes.
    require(!spine.columns.contains("__ltm"),
      "spine column name __ltm is reserved by asofJoinNative")
    val reservedPay = payload.toSet.intersect(Set("__re", "__rtm", "__rtie"))
    require(reservedPay.isEmpty,
      s"payload column names reserved by asofJoinNative: $reservedPay")
    val spark = spine.sparkSession
    Bridge.injectStrategy(spark, plans.AsOfJoinStrategy)

    val lp = spine.withColumn("__ltm", tsMicros(col(spineTs)))
    // Alias every right column (fresh exprIds) so the binary node cannot
    // carry conflicting attribute ids even for self-as-of.
    val rp = events
      .where(col(entity).isNotNull && col(eventTs).isNotNull)
      .select(
        col(entity).as("__re") +:
          tsMicros(col(eventTs)).as("__rtm") +:
          tieCol.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("__rtie") +:
          payload.map(p => col(p).as(p)): _*)

    val lPlan = Bridge.analyzedPlan(lp)
    val rPlan = Bridge.analyzedPlan(rp)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"attribute $name missing from ${plan.output.map(_.name)}"))
    val payAttrs = payload.map(attr(rPlan, _)) ++
      (if (matchedTsCol.isDefined) Seq(attr(rPlan, "__rtm")) else Nil)

    val node = plans.AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, entity), attr(rPlan, "__re"),
      attr(lPlan, "__ltm"), attr(rPlan, "__rtm"),
      attr(rPlan, "__rtie"), payAttrs,
      strict, tolerance.map(d => d.toMillis * 1000L))

    val out = Bridge.ofRows(spark, node)
    val finalCols = spine.columns.toSeq.map(col) ++ payload.map(col) ++
      matchedTsCol.map(n => timestamp_micros(col("__rtm")).as(n)).toSeq
    out.select(finalCols: _*)
  }

  /** Build the tagged, union-compatible sides. Tag ordering encodes the
    * strictness: non-strict ⇒ events sort before spine at equal ts (an event
    * at exactly asof_ts IS visible); strict ⇒ spine first (it is NOT).
    * Returns (taggedSpine, taggedEvents, spineTag).
    */
  private def tagged(
      spine: DataFrame,
      events: DataFrame,
      entity: String,
      spineTs: String,
      eventTs: String,
      payload: Seq[String],
      tieCol: Option[String],
      strict: Boolean): (DataFrame, DataFrame, Int) = {
    val collisions = payload.toSet.intersect(spine.columns.toSet)
    require(collisions.isEmpty, s"payload collides with spine columns: $collisions")
    // __mts is the payload struct's matched-ts slot: a payload column of
    // that name would create a duplicate struct field and surface later as
    // an opaque AMBIGUOUS_REFERENCE_TO_FIELDS from finish()'s getField —
    // while the index-based merge path would silently ACCEPT it, letting
    // the two "identical results" paths diverge. Reject at the boundary,
    // like asofJoinNative does for its reserved names.
    require(!payload.contains("__mts"),
      "payload column name __mts is reserved by asofJoin")
    val evTag = if (strict) 1 else 0
    val spTag = 1 - evTag

    val payStruct = struct(
      tsMicros(col(eventTs)).as("__mts") +: payload.map(col): _*)
    val ev = events
      .where(col(entity).isNotNull && col(eventTs).isNotNull)
      .select(
        col(entity).as("__e"),
        tsMicros(col(eventTs)).as("__tm"),
        lit(evTag).as("__tag"),
        tieCol.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("__tie"),
        payStruct.as("__pay"),
        lit(null).cast(StructType(spine.schema.fields)).as("__row"))

    val sp = spine.select(
      col(entity).as("__e"),
      tsMicros(col(spineTs)).as("__tm"),
      lit(spTag).as("__tag"),
      lit(Long.MinValue).as("__tie"),
      lit(null).cast(ev.schema("__pay").dataType).as("__pay"),
      struct(spine.columns.map(col): _*).as("__row"))
    (sp, ev, spTag)
  }

  /** matchedTsCol must not shadow an existing output column — unguarded it
    * would produce a DataFrame with two same-named columns that fails with
    * AMBIGUOUS_REFERENCE only at the first downstream use, far from here.
    */
  private def requireMatchedTsColFree(
      matchedTsCol: Option[String],
      spine: DataFrame,
      payload: Seq[String]): Unit =
    matchedTsCol.foreach { n =>
      require(!spine.columns.contains(n) && !payload.contains(n),
        s"matchedTsCol '$n' collides with a spine or payload column")
    }

  private def applyTolerance(matched: DataFrame, tolerance: Option[Duration]): DataFrame =
    tolerance match {
      case Some(d) =>
        val tolMicros = d.toMillis * 1000L
        matched.withColumn("__match",
          when(col("__tm") - col("__match.__mts") <= tolMicros, col("__match")))
      case None => matched
    }

  private def finish(
      matched: DataFrame,
      payload: Seq[String],
      matchedTsCol: Option[String]): DataFrame = {
    val payCols = payload.map(p => col("__match").getField(p).as(p))
    val mtsCol = matchedTsCol.map(n =>
      timestamp_micros(col("__match.__mts")).as(n)).toSeq
    matched.select(col("__row.*") +: (payCols ++ mtsCol): _*)
  }
}
