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
}
