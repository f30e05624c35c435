package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

package object tjk {
  /** Event time → epoch micros. Driver parquet carries TIMESTAMP_NTZ;
    * `unix_micros` wants TIMESTAMP. The session time zone is pinned to UTC
    * (build.sbt / Verify / Bench), so the NTZ→TZ cast is a pure
    * reinterpretation — no wall-clock shift — and the same expression works
    * for both timestamp flavors.
    */
  def tsMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** md5-derived deterministic bucket in [0, n) — the repo's ONE convention
    * for subset predicates and resume buckets that an external engine must
    * replicate (DuckDB has md5 but not xxhash64). The Spark expression and
    * the SQL twin are generated from the same formula so the two sides of
    * an oracle can never drift character-by-character.
    */
  def md5Bucket(c: Column, n: Int): Column =
    pmod(ascii(substring(md5(c), 32, 1)), lit(n))

  /** DuckDB twin of [[md5Bucket]] (ascii of the last hex char is
    * non-negative, so `%` and pmod agree).
    */
  def md5BucketSql(colName: String, n: Int): String =
    s"ascii(substring(md5($colName), 32, 1)) % $n"

  /** Recursive delete with a null-safe listFiles (an unreadable/raced dir
    * returns null, which must not NPE a cleanup path). One shared helper —
    * three near-identical private copies had drifted on exactly that guard.
    */
  def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
    f.delete()
  }
}
