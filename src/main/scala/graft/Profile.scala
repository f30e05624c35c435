package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiler: time individual query stages at a given SF dir. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    import graft.tjk._
    import org.apache.spark.sql.functions._
    val docs = Tables.read(spark, sfDir, "documents")
    val embs = Tables.read(spark, sfDir, "embeddings")

    time("docs count")(docs.count())
    time("shingles")(TextOps.shingles(docs).count())
    val sig = TextOps.minhashSignatures(docs).cache()
    time("minhash signatures")(sig.count())
    val bands = TextOps.minhashBandRows(sig)
    time("bands")(bands.count())
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.h") === col("y.h") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    time("cand")(cand.count())
    time("q19 full")(TextVecQueries.minhashLsh(spark, sfDir).count())
    time("q19 again (warm)")(TextVecQueries.minhashLsh(spark, sfDir).count())
    time("q22 collect side")(embs.count())
    locally {
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
          System.err.println(f"[profile]   q22 stage ${si.stageId}%3d ${dur / 1e3}%6.2f s  ${si.name.take(70)}")
        }
      }
      spark.sparkContext.addSparkListener(l)
      time("q22 full")(TextVecQueries.dedupEmbed(spark, sfDir).count())
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(l)
    }
    time("q22 again (warm)")(TextVecQueries.dedupEmbed(spark, sfDir).count())
    time("q20 simhash sig")(TextOps.simhash(docs).count())
    time("q20 full")(TextVecQueries.simhashPairs(spark, sfDir).count())
    time("q18 full")(TextVecQueries.ngramJaccard(spark, sfDir).count())
    // per-job breakdown of the warm q18 run
    locally {
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(js.jobId, (js.time, String.valueOf(js.properties.getProperty("spark.job.description"))))
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, d) = jobs.getOrDefault(je.jobId, (je.time, "?"))
          System.err.println(f"[profile]   q18 job ${je.jobId}%3d ${(je.time - t0) / 1e3}%6.2f s  ${d.take(60)}")
        }
      }
      spark.sparkContext.addSparkListener(l)
      time("q18 again (warm)")(TextVecQueries.ngramJaccard(spark, sfDir).count())
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(l)
    }
    time("q33 full")(CoreQueries.lineageResume(spark, sfDir).count())
    time("q33 again (warm)")(CoreQueries.lineageResume(spark, sfDir).count())
    time("q21 full")(TextVecQueries.annCosine(spark, sfDir).count())
    time("q21 again (warm)")(TextVecQueries.annCosine(spark, sfDir).count())
    time("q23 full")(TextVecQueries.annIvf(spark, sfDir).count())
    time("q23 again (warm)")(TextVecQueries.annIvf(spark, sfDir).count())
    spark.stop()
  }
}
