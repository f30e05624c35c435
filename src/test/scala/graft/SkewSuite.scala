package graft

import java.time.Duration
import org.apache.spark.sql.functions._
import graft.tjk._

class SkewSuite extends SparkTestBase {

  private val H1 = Duration.ofHours(1)

  private lazy val skewed = Gen.transcripts(spark, nConvs = 40, seed = 42L,
      medianLen = 10, hotFactor = 60)
    .withColumn("value", length(col("text")).cast("double"))
    .cache()

  test("rolling results are partition-invariant (repartition 1 vs 7)") {
    val specs = Seq(RollingSpec("value", Agg.Sum, H1), RollingSpec("tool", Agg.NUnique, H1))
    def fp(parts: Int) = Lineage.tableFingerprint(
      Rolling.rollingAgg(skewed.repartition(parts), "conv_id", "ts", specs)
        .select(col("conv_id"), col("turn_idx"),
          round(col("sum_value_3600s"), 9).as("s"), col("nunique_tool_3600s")))
    assert(fp(1) == fp(7))
  }

  test("chunked (skew-split) rolling == window rolling on hot-key data") {
    val specs = Seq(
      RollingSpec("value", Agg.Count, H1),
      RollingSpec("value", Agg.Sum, H1),
      RollingSpec("value", Agg.Mean, H1),
      RollingSpec("value", Agg.Min, H1),
      RollingSpec("value", Agg.Max, H1),
      RollingSpec("tool", Agg.NUnique, H1),
      RollingSpec("value", Agg.Sum, H1, strict = true))
    val cols = Seq("count_value_3600s", "sum_value_3600s", "mean_value_3600s",
      "min_value_3600s", "max_value_3600s", "nunique_tool_3600s",
      "sum_value_3600s_strict")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select((Seq("conv_id", "turn_idx") ++ cols).map(col): _*).collect()
        .map { r => (r.getString(0), r.getInt(1)) ->
          cols.indices.map(i => if (r.isNullAt(i + 2)) null else r.get(i + 2)) }
        .toMap
    val win = collect(Rolling.rollingAgg(skewed, "conv_id", "ts", specs))
    val chk = collect(Skew.chunkedRollingAgg(skewed, "conv_id", "ts", specs,
      chunkSpanMicros = 2 * H1.toMillis * 1000L))
    assert(win.keySet == chk.keySet)
    win.foreach { case (k, wv) =>
      val cv = chk(k)
      wv.zip(cv).zip(cols).foreach { case ((a, b), cname) =>
        (a, b) match {
          case (null, null) =>
          case (x: Long, y: Long) => assert(x == y, s"$cname at $k")
          case (x: Double, y: Double) =>
            assert(NaiveOracle.allclose(Some(x), Some(y)), s"$cname at $k: $x vs $y")
          case _ => fail(s"$cname at $k: $a vs $b")
        }
      }
    }
  }

  test("approx windowed nunique tracks the exact path within HLL tolerance") {
    val exact = Rolling.rollingAgg(skewed, "conv_id", "ts",
        Seq(RollingSpec("tool", Agg.NUnique, H1)))
      .select("conv_id", "turn_idx", "nunique_tool_3600s").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val approx = Rolling.approxRollingNunique(skewed, "conv_id", "ts", "tool", H1)
      .select("conv_id", "turn_idx", "approx_nunique_tool_3600s").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(1L, math.ceil(0.15 * e).toLong),
        s"approx nunique off at $k: approx=$a exact=$e")
    }
  }

  test("saltedAgg == plain groupBy aggregate") {
    val plain = skewed.groupBy("conv_id").agg(
        count(col("value")).as("count_value"),
        sum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        countDistinct(col("value")).as("nunique_value"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    val salted = Skew.saltedAgg(skewed, "conv_id", "value",
        Seq(Agg.Count, Agg.Sum, Agg.Min, Agg.Max, Agg.NUnique), salt = 8, saltBy = "turn_idx")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, (c1, s1, mn1, mx1, n1)) =>
      val (c2, s2, mn2, mx2, n2) = salted(k)
      assert(c1 == c2 && mn1 == mn2 && mx1 == mx2 && n1 == n2, s"at $k")
      assert(NaiveOracle.allclose(Some(s1), Some(s2)), s"sum at $k")
    }
  }

  test("generator produces the intended hot tail (skew exists to be handled)") {
    val counts = skewed.groupBy("conv_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hot = counts("c00000000")
    val medianish = counts.values.toSeq.sorted.apply(counts.size / 2)
    assert(hot >= 20 * medianish, s"hot=$hot median=$medianish")
  }
}
