package graft.tjk

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O10 — per-partition lineage manifests + row-count/hash metrics
  * (BASELINE.json:6). `content_hash` is the XOR of `xxhash64` over a
  * canonical column projection, so it is:
  *   - order-independent within a partition (XOR commutes), and
  *   - partition-layout-independent when folded across partitions —
  *     XOR(all partition hashes) == XOR over all rows, no matter how the
  *     rows were distributed. That makes the table-level hash comparable
  *     across runs with different parallelism, which is what resume
  *     verification needs. (XOR, not SUM: Spark 4 runs ANSI mode by default
  *     and a long-sum would overflow-throw.)
  */
object Lineage {

  /** Per-partition manifest for a stage: (stage, partition_id, row_count,
    * content_hash). One extra narrow aggregation over the stage output; at
    * scale this is a map-side-combinable agg, not a second full shuffle.
    */
  def manifest(df: DataFrame, stage: String, hashCols: Seq[String] = Nil): DataFrame = {
    val cols = if (hashCols.nonEmpty) hashCols else df.columns.toSeq
    df
      .withColumn("__h", xxhash64(cols.map(col): _*))
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(
        count(lit(1)).as("row_count"),
        bit_xor(col("__h")).as("content_hash"))
      .select(lit(stage).as("stage"), col("partition_id"),
        col("row_count"), col("content_hash"))
  }

  /** Table-level (partition-layout-independent) fingerprint. */
  def tableFingerprint(df: DataFrame, hashCols: Seq[String] = Nil): (Long, Long) = {
    val cols = if (hashCols.nonEmpty) hashCols else df.columns.toSeq
    val r = df
      .agg(
        count(lit(1)).as("row_count"),
        bit_xor(xxhash64(cols.map(col): _*)).as("content_hash"))
      .collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}

/** O11 — bucket-granular checkpoint/resume (BASELINE.json:6 "resumable from
  * snapshot/checkpoint boundaries"). The job's output is written per bucket
  * (`bucket = pmod(xxhash64(entity), B)`), each bucket commit is an atomic
  * directory rename plus a manifest row (row_count + content_hash). A restart
  * skips buckets whose manifest verifies. On Iceberg this maps 1:1 to one
  * snapshot commit per bucket (behind the TableIO seam); on Parquet the
  * atomic rename provides the same all-or-nothing visibility.
  */
object Resume {

  case class BucketResult(bucket: Int, skipped: Boolean, rowCount: Long, contentHash: Long)

  def runBucketed(
      spark: SparkSession,
      input: DataFrame,
      entity: String,
      outDir: String,
      buckets: Int,
      bucketCol: Option[org.apache.spark.sql.Column] = None)(
      job: DataFrame => DataFrame): Seq[BucketResult] = {
    val root = new java.io.File(outDir)
    root.mkdirs()
    // Default bucket function: xxhash64(entity) mod buckets. Callers may
    // substitute any deterministic int expression over the input row (e.g.
    // an md5-derived bucket that an external engine can replicate).
    val bucketOf = bucketCol.getOrElse(
      pmod(xxhash64(col(entity)), lit(buckets.toLong)))
    (0 until buckets).map { b =>
      val bucketDir = new java.io.File(root, s"bucket=$b")
      val manifestFile = new java.io.File(root, s"manifest_$b.json")
      if (bucketDir.exists() && manifestFile.exists()) {
        val m = ujsonParse(java.nio.file.Files.readString(manifestFile.toPath))
        BucketResult(b, skipped = true, m._1, m._2)
      } else {
        // Recompute from scratch for this bucket only.
        if (bucketDir.exists()) deleteRec(bucketDir)
        if (manifestFile.exists()) manifestFile.delete()
        val slice = input.where(bucketOf.cast("long") === b.toLong)
        val out = job(slice)
        val tmp = new java.io.File(root, s"_tmp_bucket_$b")
        if (tmp.exists()) deleteRec(tmp)
        out.write.mode("overwrite").parquet(tmp.getPath)
        val written = spark.read.parquet(tmp.getPath)
        val (cnt, hash) = Lineage.tableFingerprint(written)
        // Commit order: data rename first, manifest last — a crash between
        // the two re-runs the bucket (idempotent), never trusts bad data.
        require(tmp.renameTo(bucketDir), s"atomic rename failed for bucket $b")
        java.nio.file.Files.writeString(manifestFile.toPath,
          s"""{"bucket":$b,"row_count":$cnt,"content_hash":$hash}""")
        BucketResult(b, skipped = false, cnt, hash)
      }
    }
  }

  private def ujsonParse(s: String): (Long, Long) = {
    def field(k: String): Long = {
      val m = java.util.regex.Pattern.compile("\"" + k + "\":(-?\\d+)").matcher(s)
      require(m.find(), s"manifest missing $k")
      m.group(1).toLong
    }
    (field("row_count"), field("content_hash"))
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }
}
