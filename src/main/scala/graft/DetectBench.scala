package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: cost of the r3 skew-guard detection job in isolation, on the
  * big synthetic input — quantifies what SkewPolicy.Auto adds to a flagship
  * run (the chunked routing itself never fires there: the generator's hot
  * conversations are ~10³ turns, far under the 5·10⁵ default threshold).
  *
  * Usage: DetectBench <cpus> [nConvs] [medianLen]
  */
object DetectBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val nConvs = args.lift(1).map(_.toLong).getOrElse(16000000L)
    val medianLen = args.lift(2).map(_.toInt).getOrElse(20)
    val dataDir = s"/tmp/tjk_bench/turns_${nConvs}_$medianLen"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("TJK_SHUFFLE_PARTS", (2 * cpus).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val turns = spark.read.parquet(dataDir)
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val hot = graft.tjk.Rolling.detectHotKeys(turns, "conv_id",
        graft.tjk.Rolling.HotThresholdDefault)
      System.err.println(f"[detect] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, ${hot.size} hot keys")
    }
    spark.stop()
  }
}
