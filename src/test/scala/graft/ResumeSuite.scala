package graft

import java.nio.file.Files
import java.time.Duration
import org.apache.spark.sql.functions._
import graft.tjk._

/** SURVEY.md §5 layer 6 — kill-and-restart: completed buckets are skipped
  * untouched; the resumed output is identical to a clean full run.
  */
class ResumeSuite extends SparkTestBase {

  private val H1 = Duration.ofHours(1)

  private def job(df: org.apache.spark.sql.DataFrame) =
    Rolling.rollingAgg(df, "conv_id", "ts",
        Seq(RollingSpec("value", Agg.Sum, H1), RollingSpec("tool", Agg.NUnique, H1)))
      .select(col("conv_id"), col("turn_idx"),
        round(col("sum_value_3600s"), 9).as("sum_1h"), col("nunique_tool_3600s"))

  test("restart skips verified buckets and reproduces identical output") {
    val input = turnsDf(Gen.turnsSeq(42L, 20, 30))
    val outDir = Files.createTempDirectory("tjk_resume").toString
    val buckets = 4

    val first = Resume.runBucketed(spark, input, "conv_id", outDir, buckets)(job)
    assert(first.forall(!_.skipped))
    val cleanFp = Lineage.tableFingerprint(
      spark.read.parquet((0 until buckets).map(b => s"$outDir/bucket=$b"): _*))

    // Simulate a crash that lost bucket 1 (data + manifest).
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec); f.delete()
    }
    deleteRec(new java.io.File(s"$outDir/bucket=1"))
    new java.io.File(s"$outDir/manifest_1.json").delete()
    val mtimes = (0 until buckets).filter(_ != 1)
      .map(b => b -> new java.io.File(s"$outDir/bucket=$b").lastModified()).toMap

    val second = Resume.runBucketed(spark, input, "conv_id", outDir, buckets)(job)
    assert(second.count(_.skipped) == buckets - 1)
    assert(!second.find(_.bucket == 1).get.skipped)
    mtimes.foreach { case (b, m) =>
      assert(new java.io.File(s"$outDir/bucket=$b").lastModified() == m,
        s"bucket $b was touched on resume")
    }
    // Recomputed bucket carries the same manifest metrics as the first run.
    assert(second.map(r => (r.bucket, r.rowCount, r.contentHash)).toSet ==
      first.map(r => (r.bucket, r.rowCount, r.contentHash)).toSet)
    val resumedFp = Lineage.tableFingerprint(
      spark.read.parquet((0 until buckets).map(b => s"$outDir/bucket=$b"): _*))
    assert(resumedFp == cleanFp)
    deleteRec(new java.io.File(outDir))
  }

  test("lineage fingerprint is partition-layout independent") {
    val df = turnsDf(Gen.turnsSeq(42L, 10, 30))
    val a = Lineage.tableFingerprint(df.repartition(1))
    val b = Lineage.tableFingerprint(df.repartition(9))
    assert(a == b)
    val m = Lineage.manifest(df.repartition(5), "stage1")
    val folded = m.agg(sum(col("row_count")), bit_xor(col("content_hash"))).collect()(0)
    assert((folded.getLong(0), folded.getLong(1)) == a)
  }
}
