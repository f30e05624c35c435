package graft

import org.apache.spark.sql.SparkSession

/** Dev-only per-query job/stage profiler (guide §1.4/§1.5): runs selected
  * declared queries through the SAME noop-sink methodology as Bench, but with
  * a listener attributing wall time to individual Spark jobs — the evidence
  * needed to decide WHERE a query's seconds go (scan, probe jobs, collects,
  * shuffles). Bench.scala itself is frozen; this main is additive.
  * Usage: runMain graft.BenchExtra [q19_minhash_lsh ...]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val wanted = args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same synthetic warmup as Bench so first-query numbers are comparable
    locally {
      import org.apache.spark.sql.functions._
      val w = spark.range(0, 100000, 1, 8)
        .select(col("id"), (col("id") % 97).as("k"))
      w.groupBy("k").agg(count(lit(1))).count()
      graft.tjk.Tables.read(spark, sfDir, "region").limit(1).collect()
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, js.time)
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobs.getOrDefault(je.jobId, je.time)
        System.err.println(f"[prof]   job ${je.jobId}%4d ${(je.time - t0) / 1e3}%7.2f s")
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for { a <- si.completionTime; b <- si.submissionTime }
          yield a - b).getOrElse(-1L)
        if (dur > 150) {
          val m = si.taskMetrics
          System.err.println(f"[prof]     stage ${si.stageId}%4d ${dur / 1e3}%6.2f s " +
            f"tasks=${si.numTasks}%3d " +
            f"in=${m.inputMetrics.recordsRead}%d/${m.inputMetrics.bytesRead / 1024}%dK " +
            f"sr=${m.shuffleReadMetrics.recordsRead}%d " +
            f"sw=${m.shuffleWriteMetrics.recordsWritten}%d/${m.shuffleWriteMetrics.bytesWritten / 1024}%dK " +
            f"cpu=${m.executorCpuTime / 1e9}%.1f ${si.name.take(60)}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.isEmpty || wanted.contains(name)) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          System.err.println(f"[prof] $name TOTAL ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        } catch {
          case e: Throwable =>
            System.err.println(s"[prof] $name FAILED: ${e.getMessage}")
        }
        spark.sharedState.cacheManager.clearCache()
        Thread.sleep(200)
      }
    }
    spark.stop()
  }
}
