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

  test("auto skew guard: guarded rollingAgg == WindowOnly on hot-key data") {
    val specs = Seq(
      RollingSpec("value", Agg.Sum, H1),
      RollingSpec("value", Agg.Mean, H1),
      RollingSpec("tool", Agg.NUnique, H1),
      RollingSpec("value", Agg.Sum, H1, strict = true))
    // Threshold low enough that the generator's hot conversation(s) route
    // through the chunked path while the tail stays on the Window node —
    // the exact union shape a whale triggers in production.
    val hot = Rolling.detectHotKeys(skewed, "conv_id", 100L)
    assert(hot.nonEmpty, "guard found no hot keys on deliberately skewed data")
    def fp(df: org.apache.spark.sql.DataFrame) = Lineage.tableFingerprint(
      df.select(col("conv_id"), col("turn_idx"),
        round(col("sum_value_3600s"), 9).as("s"),
        round(col("mean_value_3600s"), 9).as("m"),
        col("nunique_tool_3600s"),
        round(col("sum_value_3600s_strict"), 9).as("ss")))
    val guarded = fp(Rolling.rollingAgg(skewed, "conv_id", "ts", specs,
      SkewPolicy.Guarded(100L)))
    val plain = fp(Rolling.rollingAgg(skewed, "conv_id", "ts", specs,
      SkewPolicy.WindowOnly))
    assert(guarded == plain)
  }

  test("broadcast hot routing (>HotBroadcastMin keys) == WindowOnly, no isin literal") {
    val spark2 = spark
    import spark2.implicits._
    // 120 hot entities (12 rows each, threshold 10) — past HotBroadcastMin,
    // so routing must take the broadcast-flag path instead of baking a
    // 120-element isin literal into the plan; plus a cold tail and a
    // null-entity row (the routing-semantics edge the isin path pins).
    val rows =
      (for { e <- 0 until 120; i <- 0 until 12 }
        yield (s"h$e", new java.sql.Timestamp(i * 60000L), (e + i).toDouble)) ++
      (for { e <- 0 until 30; i <- 0 until 3 }
        yield (s"c$e", new java.sql.Timestamp(i * 60000L), i.toDouble)) :+
      ((null.asInstanceOf[String], new java.sql.Timestamp(0L), 1.0))
    val df = rows.toDF("conv_id", "ts", "value")
    val specs = Seq(
      RollingSpec("value", Agg.Sum, H1),
      RollingSpec("value", Agg.NUnique, H1))
    assert(Rolling.detectHotKeys(df, "conv_id", 10L).size > Rolling.HotBroadcastMin)
    val guarded = Rolling.rollingAgg(df, "conv_id", "ts", specs,
      SkewPolicy.Guarded(10L))
    val plan = guarded.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"hot routing did not broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("h99"),
      "hot-key literals leaked into the plan — isin path used past the cap")
    def fp(d: org.apache.spark.sql.DataFrame) = Lineage.tableFingerprint(
      d.select(col("conv_id"), col("ts"),
        round(col("sum_value_3600s"), 9).as("s"),
        col("nunique_value_3600s")))
    assert(fp(guarded) ==
      fp(Rolling.rollingAgg(df, "conv_id", "ts", specs, SkewPolicy.WindowOnly)))
  }

  test("guard routing keeps NULL-entity rows (cold branch), loses nothing") {
    // isin(null) is NULL, not false: without the coalesce in the router,
    // null-entity rows would vanish from BOTH branches. They must appear in
    // the output exactly once, with window values computed over the
    // null-entity group (Window.partitionBy groups nulls together).
    val spark2 = spark
    import spark2.implicits._
    val rows =
      (0 until 40).map(i => (if (i < 30) "hot" else null, i,
        new java.sql.Timestamp(1700000000000L + i * 1000L), i.toDouble))
    val df = rows.toDF("conv_id", "turn_idx", "ts", "value")
    val out = Rolling.rollingAgg(df, "conv_id", "ts",
        Seq(RollingSpec("value", Agg.Count, Duration.ofHours(1))),
        SkewPolicy.Guarded(10L))
    assert(out.count() == 40L)
    val nulls = out.where(col("conv_id").isNull)
      .orderBy("turn_idx").collect()
    assert(nulls.length == 10)
    // 10 null rows, 1s apart, 1h frame: trailing counts 1..10
    assert(nulls.map(_.getLong(4)).toSeq == (1L to 10L))
  }

  test("SAMPLED detection finds the whale (the >64MB production branch)") {
    // The sampled branch normally needs a 64 MB input; lower the size floor
    // so the suite drives the same code path: 100k-row whale + 5k-row tail,
    // threshold 10000 (threshold·frac = 100 ≥ 30 ⇒ sampling sound).
    val whale = spark.range(100000L).select(
        lit("w").as("conv_id"), col("id").cast("int").as("turn_idx"))
      .unionByName(spark.range(5000L).select(
        concat(lit("c"), (col("id") % 500).cast("string")).as("conv_id"),
        col("id").cast("int").as("turn_idx")))
    spark.conf.set("spark.graft.rolling.detect.sampleMinBytes", "1000")
    try {
      val hot = Rolling.detectHotKeys(whale, "conv_id", 10000L)
      assert(hot == Seq("w"), s"sampled detection returned $hot")
    } finally spark.conf.unset("spark.graft.rolling.detect.sampleMinBytes")
  }

  test("default path survives a whale entity (10⁶ rows, 24h frame)") {
    // One conversation, a million turns, every row inside one 24h window
    // span: the Window path would recompute an up-to-10⁶-element frame per
    // row (O(10¹²) work — does not finish) and collect_set would allocate a
    // frame-sized array per row on top. The DEFAULT rollingAgg must detect
    // the whale and route it through the chunked incremental path, which is
    // O(rows) amortized. Correctness is spot-checked against directly
    // computed frame values at sampled rows.
    val spark2 = spark
    import spark2.implicits._
    val n = 1000000
    val d24 = Duration.ofHours(24)
    // one turn every 60 ms → 10⁶ rows span ~16.7 h < 24 h
    val whale = spark.range(n.toLong).select(
      lit("whale").as("conv_id"),
      col("id").cast("int").as("turn_idx"),
      lit("user").as("role"), lit("x").as("text"),
      (col("id") % 7).cast("string").as("tool"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 60000L).as("ts"),
      (col("id") % 1000).cast("double").as("value"))
    val t0 = System.nanoTime()
    val out = Rolling.rollingAgg(whale, "conv_id", "ts",
        Seq(RollingSpec("value", Agg.Sum, d24),
          RollingSpec("value", Agg.NUnique, d24)),
        SkewPolicy.Guarded(100000L))
      .select("turn_idx", "sum_value_86400s", "nunique_value_86400s")
    val got = out.where(col("turn_idx").isin(0, 999, 123456, 999999))
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 120.0, s"whale took $sec s — guard did not engage")
    // expected values: frame = all rows so far (span < 24h), value = id%1000
    def expect(i: Long) = {
      val k = i + 1
      val full = k / 1000; val rem = k % 1000
      val sum = full * 499500.0 + (rem - 1) * rem / 2.0
      (sum, math.min(k, 1000L))
    }
    Seq(0L, 999L, 123456L, 999999L).foreach { i =>
      val (es, en) = expect(i)
      val (gs, gn) = got(i.toInt)
      assert(gs == es && gn == en, s"row $i: got ($gs,$gn) want ($es,$en)")
    }
  }

  test("chunked sliding sum: no drift after 10⁶ evictions") {
    // Deterministic discriminator for running-sum drift: 10⁵ rows at ~1e6
    // magnitude, then 9×10⁵ rows at ~1e-6 magnitude, one row per second,
    // 99 s frame (always full → ~10⁶ evictions, no empty-window re-zero).
    // Once the big phase has fully left the window, the true frame sum is
    // ~1e-4; a plain add-subtract running sum carries an absolute residue of
    // the big phase's rounding (≫ 1e-4, i.e. the OUTPUT would be 100%
    // wrong), and even pure Kahan's worst case scales with Σ|xᵢ| over
    // history. The periodic live-queue re-accumulation bounds the error by
    // one pass over the CURRENT frame, so tiny-phase frames must come out
    // at ~1e-20 absolute error.
    val n = 1000000
    val big = 100000
    def valOf(i: Long): Double =
      if (i < big) (i % 97 + 1).toDouble * 1e6 else ((i % 89) + 1).toDouble * 1e-6
    val whale = spark.range(n.toLong).select(
      lit("e").as("conv_id"),
      col("id").cast("int").as("turn_idx"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L).as("ts"),
      when(col("id") < big, ((col("id") % 97) + 1).cast("double") * 1e6)
        .otherwise(((col("id") % 89) + 1).cast("double") * 1e-6).as("value"))
    val out = Skew.chunkedRollingAgg(whale, "conv_id", "ts",
        Seq(RollingSpec("value", Agg.Sum, Duration.ofSeconds(99))),
        chunkSpanMicros = 99L * 1000000L)
      .where(col("turn_idx").isin(200000, 500000, 999999))
      .select("turn_idx", "sum_value_99s").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    Seq(200000, 500000, 999999).foreach { i =>
      val exact = (math.max(0, i - 99) to i).map(j => valOf(j.toLong)).sum
      val got = out(i)
      assert(math.abs(got - exact) <= 1e-12 * math.abs(exact) + 1e-15,
        s"row $i drifted: got $got want $exact")
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

  test("detection runs ONE job for a 2-call pipeline (session cache reuse)") {
    // VERDICT r3 item 3 / SURVEY §4.2 "reuse, don't re-scan": two rolling
    // calls over the SAME input + threshold must share one detection scan.
    Rolling.clearDetectionCache(spark)
    val before = Rolling.detectionJobs.get()
    Rolling.rollingAgg(skewed, "conv_id", "ts",
      Seq(RollingSpec("value", Agg.Sum, H1)), SkewPolicy.Guarded(101L)).count()
    Rolling.rollingAgg(skewed, "conv_id", "ts",
      Seq(RollingSpec("value", Agg.Count, H1)), SkewPolicy.Guarded(101L)).count()
    assert(Rolling.detectionJobs.get() - before == 1L,
      s"expected 1 detection job, ran ${Rolling.detectionJobs.get() - before}")
    // Different threshold = different cache key = a fresh (correct) scan.
    Rolling.rollingAgg(skewed, "conv_id", "ts",
      Seq(RollingSpec("value", Agg.Sum, H1)), SkewPolicy.Guarded(102L)).count()
    assert(Rolling.detectionJobs.get() - before == 2L)
  }

  test("Precomputed counts route the whale with ZERO detection scans") {
    val counts = skewed.groupBy("conv_id").count()
    val before = Rolling.detectionJobs.get()
    spark.conf.set(Rolling.HotThresholdKey, "100")
    try {
      val specs = Seq(RollingSpec("value", Agg.Sum, H1))
      val out = Rolling.rollingAgg(skewed, "conv_id", "ts", specs,
        SkewPolicy.Precomputed(counts))
      // the whale actually routed (hot/cold union shape) …
      assert(out.queryExecution.executedPlan.toString.contains("Union"),
        "Precomputed policy did not route any entity")
      // … with identical results …
      def fp(df: org.apache.spark.sql.DataFrame) = Lineage.tableFingerprint(
        df.select(col("conv_id"), col("turn_idx"),
          round(col("sum_value_3600s"), 9).as("s")))
      assert(fp(out) ==
        fp(Rolling.rollingAgg(skewed, "conv_id", "ts", specs, SkewPolicy.WindowOnly)))
      // … and no detection scan of the input ran.
      assert(Rolling.detectionJobs.get() == before)
    } finally spark.conf.unset(Rolling.HotThresholdKey)
  }

  test("entityManifest auto-wires routing: ZERO detection jobs under default Auto") {
    // VERDICT r4 #6: a manifest-bearing pipeline must not re-scan the input
    // to re-derive counts the O10 pass already aggregated. entityManifest
    // publishes its top-K to the session registry; a later backfill over
    // the SAME input under the DEFAULT policy routes from it.
    Rolling.clearDetectionCache(spark)
    val manifest = Lineage.entityManifest(skewed, "conv_id") // the O10 pass
    assert(manifest.columns.toSeq == Seq("conv_id", "row_count"))
    val before = Rolling.detectionJobs.get()
    spark.conf.set(Rolling.HotThresholdKey, "100")
    try {
      val spec = FeatureSpec(rolling = Seq(RollingSpec("value", Agg.Sum, H1)))
      val out = Pipeline.backfill(skewed, spec) // default SkewPolicy.Auto
      assert(out.queryExecution.executedPlan.toString.contains("Union"),
        "registry-fed Auto policy did not route the whale")
      def fp(df: org.apache.spark.sql.DataFrame) = Lineage.tableFingerprint(
        df.select(col("conv_id"), col("turn_idx"),
          round(col("sum_value_3600s"), 9).as("s")))
      assert(fp(out) == fp(Pipeline.backfill(skewed, spec,
        skewPolicy = SkewPolicy.WindowOnly)))
      assert(Rolling.detectionJobs.get() == before,
        "backfill over a manifest-bearing input still ran a detection scan")
    } finally spark.conf.unset(Rolling.HotThresholdKey)
  }

  test("WindowNUnique rejects binary input at analysis (reference-equality hazard)") {
    val df = skewed.withColumn("b", col("tool").cast("binary"))
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      Rolling.rollingAgg(df, "conv_id", "ts",
        Seq(RollingSpec("b", Agg.NUnique, H1)), SkewPolicy.WindowOnly).collect()
    }
    assert(ex.getMessage.contains("tjk_window_nunique") ||
      ex.getMessage.toLowerCase.contains("binary"), ex.getMessage)
  }

  test("WindowNUnique counts -0.0==0.0 and all NaNs as one, like count(DISTINCT)") {
    val spark2 = spark
    import spark2.implicits._
    val ts = (i: Int) => new java.sql.Timestamp(1700000000000L + i * 1000L)
    val df = Seq(
      ("a", 0, ts(0), 0.0), ("a", 1, ts(1), -0.0),
      ("a", 2, ts(2), Double.NaN), ("a", 3, ts(3), Double.NaN))
      .toDF("conv_id", "turn_idx", "ts", "value")
    val out = Rolling.rollingAgg(df, "conv_id", "ts",
        Seq(RollingSpec("value", Agg.NUnique, H1)), SkewPolicy.WindowOnly)
      .orderBy("turn_idx").select("nunique_value_3600s").collect().map(_.getLong(0))
    // frames: [0.0] → 1; [0.0,-0.0] → 1; +NaN → 2; +NaN → 2
    assert(out.toSeq == Seq(1L, 1L, 2L, 2L), out.toSeq.toString)
    // …and the chunked O3 path must agree (same normalization, or a whale
    // routing would silently change NaN semantics)
    val chunked = Skew.chunkedRollingAgg(df, "conv_id", "ts",
        Seq(RollingSpec("value", Agg.NUnique, H1)),
        chunkSpanMicros = H1.toMillis * 1000L)
      .orderBy("turn_idx").select("nunique_value_3600s").collect().map(_.getLong(0))
    assert(chunked.toSeq == Seq(1L, 1L, 2L, 2L), chunked.toSeq.toString)
  }

  test("null-ts rows of a HOT entity route cold and results match WindowOnly") {
    // tsMicros(null) would NPE in the chunked operator's getLong; the
    // router must send null-ts rows down the Window branch, and doing so
    // must be result-invariant (a null-order row's range frame sees only
    // its null-ts peers).
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until 50).map { i =>
      ("hot", i,
        if (i % 10 == 3) null
        else new java.sql.Timestamp(1700000000000L + i * 1000L),
        i.toDouble)
    } ++ Seq(("cold", 0, new java.sql.Timestamp(1700000000000L), 1.0))
    val df = rows.toDF("conv_id", "turn_idx", "ts", "value")
    val specs = Seq(RollingSpec("value", Agg.Sum, H1),
      RollingSpec("value", Agg.Count, H1))
    def fp(p: SkewPolicy) = Lineage.tableFingerprint(
      Rolling.rollingAgg(df, "conv_id", "ts", specs, p)
        .select(col("conv_id"), col("turn_idx"),
          round(col("sum_value_3600s"), 9).as("s"), col("count_value_3600s")))
    assert(fp(SkewPolicy.Guarded(10L)) == fp(SkewPolicy.WindowOnly))
    // and a DIRECT chunked call on null-ts data fails loudly, never NPEs
    val ex = intercept[org.apache.spark.SparkException] {
      Skew.chunkedRollingAgg(df, "conv_id", "ts", specs,
        chunkSpanMicros = H1.toMillis * 1000L).collect()
    }
    assert(ex.getMessage.contains("null ts") ||
      Option(ex.getCause).exists(_.getMessage.contains("null ts")), ex.getMessage)
  }

  test("chunked == window on pre-1970 timestamps (floor-consistent chunking)") {
    // Truncating `div` vs floor-based pmod diverge on negative micros: a
    // row just before a chunk boundary in negative time must still be
    // duplicated forward as context or trailing frames lose rows.
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until 200).map { i =>
      ("e", i, new java.sql.Timestamp(-86400000L * 2 + i * 137000L), (i % 13).toDouble)
    }
    val df = rows.toDF("conv_id", "turn_idx", "ts", "value")
    val specs = Seq(RollingSpec("value", Agg.Sum, Duration.ofMinutes(10)),
      RollingSpec("value", Agg.Count, Duration.ofMinutes(10)))
    def fp(d: org.apache.spark.sql.DataFrame) = Lineage.tableFingerprint(
      d.select(col("conv_id"), col("turn_idx"),
        round(col("sum_value_600s"), 9).as("s"), col("count_value_600s")))
    val win = fp(Rolling.rollingAgg(df, "conv_id", "ts", specs, SkewPolicy.WindowOnly))
    val chk = fp(Skew.chunkedRollingAgg(df, "conv_id", "ts", specs,
      chunkSpanMicros = 3L * 600L * 1000000L)) // span 3× window ⇒ real context bands
    assert(win == chk)
  }

  test("generator produces the intended hot tail (skew exists to be handled)") {
    val counts = skewed.groupBy("conv_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hot = counts("c00000000")
    val medianish = counts.values.toSeq.sorted.apply(counts.size / 2)
    assert(hot >= 20 * medianish, s"hot=$hot median=$medianish")
  }
}
