package graft

import org.apache.spark.sql.SparkSession


/** Dev-only: dump a SUBSET of SparkEntry.queries (plus their oracle SQL) so
  * single queries can be cross-checked against DuckDB while iterating,
  * without paying for the full Verify sweep. Same output contract as Verify.
  *
  * Usage: DevCheck <sfDir> <outDir> <queryName>...
  */
object DevCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      System.err.println(f"[devcheck] $name dumped in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    OracleDump.writeOracleJson(s"$outDir/oracle_sql.json",
      SparkEntry.oracleSql.filter(kv => names.contains(kv._1)))
    spark.stop()
  }
}
