package graft.tjk

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage seam (SURVEY.md §2.2): Parquet in-sandbox; production swaps in an
  * Iceberg-backed implementation by config (the Iceberg runtime jar is not
  * available offline — SURVEY.md §0.5). Everything above this seam is
  * format-agnostic DataFrame code, so the swap is config-only.
  */
trait TableIO {
  def read(spark: SparkSession, name: String): DataFrame
  def write(df: DataFrame, name: String): Unit
  def exists(spark: SparkSession, name: String): Boolean
}

/** Parquet directory layout: `$root/<name>.parquet` (driver testdata shape)
  * falling back to `$root/<name>` for engine-written tables.
  */
final class ParquetIO(root: String) extends TableIO {
  private def path(name: String): String = {
    val p1 = new java.io.File(s"$root/$name.parquet")
    if (p1.exists()) p1.getPath else s"$root/$name"
  }
  override def read(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(path(name))
  override def write(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").parquet(s"$root/$name")
  override def exists(spark: SparkSession, name: String): Boolean =
    new java.io.File(path(name)).exists()
}

object TableIO {
  /** In production this would consult config and return an Iceberg-backed
    * TableIO (`spark.read.format("iceberg")` / `writeTo(...).append()`).
    */
  def forRoot(root: String): TableIO = new ParquetIO(root)
}
