package graft

import java.time.Duration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tjk._

/** M7 scale/scaling bench (SURVEY.md §6, BASELINE.json:2).
  *
  * The north rule's two-cluster-size criterion (N vs 4N executors,
  * efficiency ≥ 0.8) cannot use a real cluster in this sandbox: we run the
  * SAME job on the SAME pre-generated input at two parallelism levels
  * (local[8] vs local[32]) and report throughput at both plus
  * efficiency = (T_8 / T_32) / 4.
  *
  * Usage: ScaleBench <cpus> [nConvs] [medianLen]
  *  - generates deterministic transcripts (seed 42) to /tmp/tjk_bench once,
  *  - times the flagship backfill (rolling {1h,24h} × {count,sum,nunique} +
  *    lag{1,3} + as-of join to a per-conv side table + sessionize(30m) →
  *    session aggregate) cold and warm,
  *  - prints one JSON line per run.
  */
object ScaleBench {

  /** 1-arg overload follows the SAME TJK_ASOF-derived default as the bench
    * harness (union unless TJK_ASOF=native), so the API default and the
    * benched config cannot silently diverge.
    */
  def flagship(turns: DataFrame): DataFrame =
    flagship(turns, native = sys.env.get("TJK_ASOF").contains("native"))

  def flagship(turns: DataFrame, native: Boolean): DataFrame = {
    val withValue = turns.withColumn("value", length(col("text")).cast("double"))
    val spec = FeatureSpec(
      rolling = Seq(
        RollingSpec("value", Agg.Count, Duration.ofHours(1)),
        RollingSpec("value", Agg.Sum, Duration.ofHours(1)),
        RollingSpec("value", Agg.Count, Duration.ofHours(24)),
        RollingSpec("value", Agg.Sum, Duration.ofHours(24)),
        RollingSpec("tool", Agg.NUnique, Duration.ofHours(1)),
        RollingSpec("tool", Agg.NUnique, Duration.ofHours(24))),
      lags = Seq(("value", 1), ("value", 3)),
      sessionGap = Some(Duration.ofMinutes(30)))
    val features = Pipeline.backfill(withValue, spec)
      // Prune BEFORE the as-of: its union-tag packs every spine column into a
      // struct, which would otherwise drag the fat `text` column through all
      // window sorts + the as-of shuffle (Catalyst can't prune through the
      // struct). Width discipline at the operator boundary is the single
      // biggest shuffle-bytes lever at 100 TB.
      .select("conv_id", "ts", "session_id", "count_value_3600s",
        "sum_value_3600s", "count_value_86400s", "sum_value_86400s",
        "nunique_tool_3600s", "nunique_tool_86400s", "lag_value_1", "lag_value_3")
    // As-of attach: last 'code'-tool turn per conversation before each turn.
    val side = withValue.where(col("tool") === "code")
      .select(col("conv_id"), col("ts").as("side_ts"),
        col("turn_idx").cast("long").as("side_tie"), col("value").as("side_value"))
    // Two as-of paths, A/B-benchable (TJK_ASOF=union|native|both):
    //  - native (AsOfJoinExec): the features side is ALREADY hash-partitioned
    //    by conv_id from the window exchange and the operator preserves it,
    //    so only the (much smaller) side table shuffles, and the final
    //    session groupBy reuses the same partitioning — ONE full-width
    //    exchange for the whole job (pinned by PlanShapeSuite). On a real
    //    cluster exchanges are network; this is the 100 TB cost structure.
    //  - union (window-tag): re-shuffles the unioned 100M+ rows and loses
    //    the partitioning through its struct packing (3 full-width
    //    exchanges), but every operator is codegen'd; in local mode, where
    //    an exchange is a memory/disk copy, this can win on CPU.
    val joined =
      if (native)
        AsOf.asofJoinNative(features, side, "conv_id", "ts", "side_ts",
          payload = Seq("side_value"), tieCol = Some("side_tie"))
      else
        AsOf.asofJoin(features, side, "conv_id", "ts", "side_ts",
          payload = Seq("side_value"), tieCol = Some("side_tie"))
    // Terminal aggregation so .count() executes every operator (§3.3).
    joined.groupBy("conv_id", "session_id").agg(
      count(lit(1)).as("n_turns"),
      sum(col("sum_value_3600s")).as("s1"),
      max(col("count_value_86400s")).as("c24"),
      max(col("nunique_tool_3600s")).as("nu1"),
      avg(col("lag_value_1")).as("l1"),
      avg(col("side_value")).as("sv"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val nConvs = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val medianLen = args.lift(2).map(_.toInt).getOrElse(20)
    val dataDir = s"/tmp/tjk_bench/turns_${nConvs}_$medianLen"

    // Tunables for the scaling experiments (defaults = the reported config).
    val parts = sys.env.get("TJK_SHUFFLE_PARTS").map(_.toInt).getOrElse(2 * cpus)
    val coalesce = sys.env.getOrElse("TJK_AQE_COALESCE", "true")
    val aqe = sys.env.getOrElse("TJK_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("tjk-scalebench")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("TJK_LOCAL_DIR", "/tmp/tjk_spark_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(dataDir, "_SUCCESS").exists()) {
      System.err.println(s"[scalebench] generating $dataDir ...")
      Gen.transcripts(spark, nConvs, seed = 42L, medianLen = medianLen)
        .write.mode("overwrite").parquet(dataDir)
    }
    val turns = spark.read.parquet(dataDir)
    val total = turns.count()

    def run(label: String, native: Boolean): Double = {
      val t0 = System.nanoTime()
      val n = flagship(turns, native).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scalebench] $label: $n sessions in $sec%.1f s")
      sec
    }
    val variants = sys.env.getOrElse("TJK_ASOF", "union") match {
      case "both" => Seq("union" -> false, "native" -> true)
      case "native" => Seq("native" -> true)
      case _ => Seq("union" -> false)
    }
    val warms = sys.env.get("TJK_WARMS").map(_.toInt).getOrElse(5)
    val colds = variants.map { case (name, nat) => name -> run(s"cold-$name", nat) }.toMap
    // Interleave the variants' warm runs so both see the same interference
    // window, and take min-of-N per variant: this sandbox shows 2-3x
    // run-to-run swings from external (hypervisor-level) noise — the minimum
    // is the only statistic that reflects the job rather than the neighbors.
    val times = (1 to warms).flatMap { i =>
      variants.map { case (name, nat) => name -> run(s"warm$i-$name", nat) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    variants.foreach { case (name, _) =>
      println(
        s"""{"bench":"flagship_backfill","variant":"$name","cpus":$cpus,""" +
        s""""turns":$total,"cold_sec":${colds(name)},"warm_sec":${times(name)},""" +
        s""""cold_turns_per_sec":${(total / colds(name)).toLong},""" +
        s""""warm_turns_per_sec":${(total / times(name)).toLong}}""")
    }
    spark.stop()
  }
}
