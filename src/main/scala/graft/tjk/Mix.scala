package graft.tjk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing: rebalance a multi-source corpus to target token SHARES by
  * deterministic per-group downsampling — the data-mixing step of a training
  * pipeline ("40% English, 20% Spanish, …" over a crawl whose natural mix is
  * different).
  *
  * Semantics (all-integer, so external engines replicate bit-for-bit):
  * given per-group weights `w_g` (target share = w_g / ΣW) and observed
  * per-group token totals `tokens_g`, the largest achievable mixed corpus
  * subject to sampling rate ≤ 1 per group is
  * `K = min_g floor(tokens_g · ΣW / w_g)`; each group then targets
  * `floor(K · w_g / ΣW)` tokens, realized by keeping documents whose
  * md5-derived entity bucket ([[Split.entityBucket]], 256 buckets) falls
  * below `cut_g = min(256, floor(target_g · 256 / tokens_g))`. The binding
  * (scarcest-relative-to-share) group gets cut 256 — kept whole. Bucket
  * sampling keeps the decision per-document deterministic and join-free:
  * re-running on a grown corpus keeps previously-kept documents kept
  * (buckets are content-stable), the property incremental ingestion needs.
  *
  * Scale shape: ONE corpus scan — the narrow `(doc_id, lang, n_tokens)`
  * projection is persisted and feeds (a) the tiny per-group token
  * aggregation the cuts derive from and (b) the kept-side filter; the
  * per-group cut table (≤ groups rows) joins back via broadcast. No
  * driver-side loop over data rows — only the ≤-groups-row report is
  * localized by callers.
  */
object Mix {

  /** Default mixing weights over the engine's language-ID groups. */
  val DefaultWeights: Map[String, Long] =
    Map("en" -> 4L, "es" -> 2L, "de" -> 2L, "fr" -> 1L, "unknown" -> 1L)

  /** Per-group mixing report over a docs frame that ALREADY carries
    * `(doc_id, lang_pred, n_tokens)` (e.g. the narrow projection of
    * [[TextOps.textStats]]): one row per group with the bucket cut and the
    * achieved counts. Groups absent from `weights` (or with weight ≤ 0) are
    * dropped from the mix entirely.
    *
    * Callers own the scan discipline: pass a persisted projection (both the
    * aggregation and the filter consume it) and localize the tiny result.
    */
  def mixReport(scored: DataFrame, weights: Map[String, Long]): DataFrame = {
    val wSum = weights.values.filter(_ > 0).sum
    require(wSum > 0, "corpus mix needs at least one positive weight")
    val spark = scored.sparkSession
    import spark.implicits._
    val w = weights.toSeq.filter(_._2 > 0).toDF("lang_pred", "w")
    val grp = scored.groupBy("lang_pred").agg(
      sum(col("n_tokens")).as("total_tokens"),
      count(lit(1)).as("n_docs_total"))
    // tiny × tiny from here down: groups × weights, then the scalar K
    val gw = grp.join(broadcast(w), "lang_pred")
    val k = gw.agg(min(expr(s"total_tokens * $wSum div w")).as("k"))
    val cuts = gw.crossJoin(broadcast(k))
      .withColumn("cut",
        least(lit(256),
          expr(s"(k * w div $wSum) * 256 div total_tokens")).cast("int"))
      .select("lang_pred", "cut", "total_tokens", "n_docs_total")
    val keptAgg = scored
      .join(broadcast(cuts.select("lang_pred", "cut")), "lang_pred")
      .where(Split.entityBucket(col("doc_id").cast("string")) < col("cut"))
      .groupBy("lang_pred").agg(
        count(lit(1)).as("n_docs_kept"),
        sum(col("n_tokens")).as("kept_tokens"))
    cuts.join(keptAgg, Seq("lang_pred"), "left")
      .select(col("lang_pred"), col("cut"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        col("total_tokens"), col("n_docs_total"))
  }
}
