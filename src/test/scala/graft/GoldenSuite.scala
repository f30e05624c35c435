package graft

import java.nio.file.{Files, Paths}
import java.time.Duration
import org.apache.spark.sql.functions._
import graft.tjk._

/** SURVEY.md §5 layer 3 — golden snapshot: full feature set at seed=42,
  * checked into src/test/resources/golden/. Byte-stable because the input is
  * seeded, TZ is UTC, order is the total (conv_id, turn_idx), and doubles are
  * rounded before formatting. Regenerate ONLY via -Dgolden.regen=true.
  */
class GoldenSuite extends SparkTestBase {

  private val goldenPath = Paths.get("src/test/resources/golden/flagship.csv")

  private def computeLines(): Seq[String] = {
    val turns = Gen.turnsSeq(42L, 30, 50)
    val spec = FeatureSpec(
      rolling = Seq(
        RollingSpec("value", Agg.Count, Duration.ofHours(1)),
        RollingSpec("value", Agg.Sum, Duration.ofHours(24)),
        RollingSpec("tool", Agg.NUnique, Duration.ofHours(1)),
        RollingSpec("value", Agg.Max, Duration.ofHours(1), strict = true)),
      lags = Seq(("value", 1), ("value", 3)),
      ffillCols = Seq("tool"),
      sessionGap = Some(Duration.ofMinutes(30)))
    Pipeline.backfill(turnsDf(turns), spec)
      .select(col("conv_id"), col("turn_idx"),
        col("count_value_3600s"),
        round(col("sum_value_86400s"), 6).as("s24"),
        col("nunique_tool_3600s"),
        round(col("max_value_3600s_strict"), 6).as("mx1s"),
        round(col("lag_value_1"), 6).as("l1"),
        round(col("lag_value_3"), 6).as("l3"),
        col("ffill_tool"), col("session_seq"))
      .orderBy("conv_id", "turn_idx")
      .collect()
      .map { r =>
        (0 until r.length).map(i => if (r.isNullAt(i)) "" else r.get(i).toString)
          .mkString(",")
      }
      .toSeq
  }

  test("flagship feature matrix matches the golden snapshot (seed=42)") {
    val lines = computeLines()
    val regen = sys.props.get("golden.regen").contains("true") ||
      sys.env.get("GOLDEN_REGEN").contains("true") // tests run in a forked JVM
    if (regen) {
      Files.createDirectories(goldenPath.getParent)
      Files.write(goldenPath, String.join("\n", lines: _*).getBytes("UTF-8"))
      info(s"regenerated golden snapshot: ${lines.size} rows")
    } else {
      assert(Files.exists(goldenPath),
        "golden snapshot missing — run sbt test -Dgolden.regen=true once")
      val want = new String(Files.readAllBytes(goldenPath), "UTF-8").split("\n").toSeq
      assert(lines.size == want.size, s"row count ${lines.size} vs golden ${want.size}")
      lines.zip(want).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"golden mismatch at line $i")
      }
    }
  }
}
