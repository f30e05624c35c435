package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump `.explain("formatted")` for selected (or all) declared
  * queries into a directory — the evidence files the optimization rounds
  * commit under plans/rNN/. Usage:
  *   runMain graft.ExplainDump <outDir> <suffix> [q01_rolling_time ...]
  * Bench/Verify are untouched; this main shares their session settings so
  * the dumped plans are the plans the bench actually runs.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val suffix = if (args.length > 1) args(1) else "before"
    val wanted = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.isEmpty || wanted.contains(name)) {
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val f = new java.io.File(outDir, s"${name}_$suffix.txt")
          val w = new java.io.PrintWriter(f, "UTF-8")
          try w.write(txt) finally w.close()
          System.err.println(s"[explain] wrote ${f.getPath}")
        } catch {
          case e: Throwable =>
            System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
