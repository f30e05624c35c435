package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like every other entry point (package.scala's tsMicros
      // contract): launched via bare `java` on a non-UTC host, the NTZ→TZ
      // cast would otherwise shift by the local offset and the benched
      // workload would differ from the verified one
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup BEFORE any query is timed: the first action in a
    // fresh local[N] session pays one-time costs that belong to the session,
    // not to whichever query happens to run first — Janino/codegen-compiler
    // init and JIT, parquet reader + shuffle machinery init, first-stage
    // scheduling. Unwarmed, those ~5-10 s land on a single arbitrary map
    // entry (measured: the same query times 0.4 s warm vs 9-21 s when it
    // draws the first slot), making per-query numbers incomparable across
    // runs. The warmup is synthetic (spark.range — no testdata is touched,
    // no query results are precomputed or cached) and its cost is excluded
    // from the per-query attribution by design, exactly like a JIT warmup
    // iteration in any JVM benchmark harness.
    locally {
      import org.apache.spark.sql.functions._
      val w = spark.range(0, 100000, 1, 8)
        .select(col("id"), (col("id") % 97).as("k"),
          concat_ws("-", col("id").cast("string"), lit("w")).as("s"),
          array(col("id"), col("id") + 1).as("arr"))
      w.groupBy("k").agg(count(lit(1)).as("n"), sum(col("id")).as("t"),
          collect_set(col("id") % 13).as("cs"))
        .join(w.groupBy("k").agg(max(col("s")).as("m")), "k")
        .where(size(col("cs")) >= 0).count()
      w.select(sum(col("id")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("id")).rangeBetween(-10, 0)))
        .write.format("noop").mode("overwrite").save()
      // parquet reader/datasource first-use init belongs to the warmup too
      // (one tiny dimension file; nothing a query computes is precached).
      // Through the SAME TableIO seam as the queries — a direct
      // `$sfDir/region.parquet` read would hardcode the file-form layout
      // and crash the warmup on a directory-form table root (ADVICE r4).
      graft.tjk.Tables.read(spark, sfDir, "region").limit(1).collect()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A broken query must not look like a fast query: it reports -1.0 in
      // the machine-readable JSON (and prints loudly on stderr) instead of
      // its small elapsed time; any failure also poisons the headline total
      // with the large-positive sentinel + failed flag (below).
      //
      // noop sink, NOT .count(): count() references no columns, so Catalyst
      // prunes every Window/projection whose output nothing consumes — the
      // pure-projection queries (rolling/lag/sessionize) would be timed as
      // a bare parquet-scan count instead of the operator under test
      // (SURVEY.md §3.3's requirement; empirically the q01 count() plan has
      // 0 of its 7 Window nodes). The noop datasource fully materializes
      // every output column and discards it — the standard Spark bench sink.
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
        } catch {
          case e: Throwable =>
            System.err.println(
              s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // UNTIMED between-query cache clear: operators persist private
      // intermediates (shingle fan-outs, signatures, split frames) that
      // would otherwise (a) accumulate across the 50-query sweep and
      // (b) contaminate timing — a later query sharing a cached subplan
      // (q19's shingles after q18) would be timed WITH a neighbor's cache.
      // Each query is timed cold-cache, matching how it runs alone.
      spark.sharedState.cacheManager.clearCache()
      name -> (if (ok) elapsed else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A run with ANY failed query must not produce a smaller (faster-looking)
    // total than a healthy run — and a numeric consumer doing min-of-N over
    // `value` must never rank a failed run as the best time, so the sentinel
    // is large-POSITIVE (not -1.0, which would win every min), paired with an
    // explicit `failed` flag. -1.0 stays only in the per-query map, where it
    // marks the individual failure.
    val anyFailed = results.values.exists(_ < 0)
    val total = if (anyFailed) 1.0e12 else results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$anyFailed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
