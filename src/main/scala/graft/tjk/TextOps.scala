package graft.tjk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators for large-scale training-data
  * pipelines, over a `documents(doc_id, text, …)` table. All hot paths are
  * built from codegen'd `functions._` expressions — no Scala UDFs — so they
  * whole-stage-compile and scale linearly with input splits.
  *
  * Dedup family:
  *  - exact: md5 fingerprint groupBy (one shuffle on the hash).
  *  - n-gram Jaccard: exact pairwise Jaccard over word k-shingles, candidate
  *    pairs blocked by shared shingle (a pair with zero shared shingles has
  *    Jaccard 0 and is correctly absent) — shuffle is on the shingle, so a
  *    hot document spreads across partitions.
  *  - MinHash+LSH: 32 md5-based min-hashes → 8 bands × 4 rows; candidates =
  *    pairs sharing a band; similarity estimated as matching-component
  *    fraction. md5 (not xxhash64) so the DuckDB oracle can replicate
  *    bit-for-bit; at production scale swap HASH_FN to xxhash64 for speed —
  *    semantics identical.
  *  - SimHash: 64-bit sign-aggregated xxhash64 over tokens; near-dups =
  *    pairs sharing a 16-bit band with Hamming distance ≤ k.
  */
object TextOps {

  val Shingle = 3
  val MinHashK = 32
  val Bands = 8 // rows per band = MinHashK / Bands = 4

  /** Word tokens (single-space corpus; split is regex-free on both engines). */
  def withTokens(docs: DataFrame): DataFrame =
    docs.withColumn("ws", split(col("text"), " "))

  // ------------------------------------------------------------ text analysis

  private val stop = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est"))

  private def stopCount(lang: String): Column = {
    val set = stop(lang).map(w => s"'$w'").mkString(", ")
    expr(s"size(filter(ws, w -> w IN ($set)))")
  }

  /** Language-ID stopword score SQL (DuckDB) — mirrors [[stopCount]]. */
  def stopCountSql(lang: String): String = {
    val set = stop(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(ws, w -> w IN ($set)))"
  }

  /** Per-document stats: token counts (whitespace + BPE-ish regex), length,
    * punctuation/stopword ratios, heuristic language ID, quality score,
    * md5 content fingerprint.
    */
  def textStats(docs: DataFrame): DataFrame = {
    val scored = withTokens(docs)
      .withColumn("n_tokens", size(col("ws")).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_bpeish",
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).cast("long"))
      .withColumn("punct_ratio",
        round(regexp_count(col("text"), lit("[.!?,;:]")).cast("double") /
          nullif(length(col("text")), lit(0)).cast("double"), 6))
      .withColumn("s_en", stopCount("en"))
      .withColumn("s_es", stopCount("es"))
      .withColumn("s_de", stopCount("de"))
      .withColumn("s_fr", stopCount("fr"))
      .withColumn("stop_ratio",
        round(col("s_en").cast("double") / nullif(col("n_tokens"), lit(0L)).cast("double"), 6))
    scored
      .withColumn("lang_pred",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") &&
          col("s_en") >= col("s_fr") && col("s_en") > 0, "en")
          .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr") &&
            col("s_es") > 0, "es")
          .when(col("s_de") >= col("s_fr") && col("s_de") > 0, "de")
          .when(col("s_fr") > 0, "fr")
          .otherwise("unknown"))
      .withColumn("quality_score",
        round(lit(1.0) / (lit(1.0) + exp(-(lit(0.5) * log1p(col("n_tokens")) -
          lit(5.0) * col("punct_ratio") - lit(2.0) * col("stop_ratio")))), 6))
      .withColumn("fp", md5(col("text")))
      .drop("ws", "s_en", "s_es", "s_de", "s_fr")
  }

  // ------------------------------------------------------------ exact dedup

  /** Canonical-id mapping per exact-content group (md5 of raw bytes). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val fp = docs.select(col(idCol), md5(col("text")).as("fp"))
    val groups = fp.groupBy("fp").agg(
      min(col(idCol)).as("canonical_id"),
      count(lit(1)).as("group_size"))
    fp.join(groups, "fp").select(col(idCol), col("fp"),
      col("canonical_id"), col("group_size"))
  }

  // ------------------------------------------------------------ shingles

  /** Distinct word k-shingles per doc; docs shorter than k words drop out. */
  def shingles(docs: DataFrame, k: Int = Shingle, idCol: String = "doc_id"): DataFrame =
    withTokens(docs)
      .where(size(col("ws")) >= k)
      .select(col(idCol), explode(expr(
        s"array_distinct(transform(sequence(0, size(ws) - $k), i -> concat_ws(' ', slice(ws, i + 1, $k))))"
      )).as("g"))

  /** Exact n-gram Jaccard near-dup pairs (j ≥ threshold). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double, k: Int = Shingle): DataFrame = {
    val sh = shingles(docs, k)
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("id_a"), col("g"))
    val b = sh.select(col("doc_id").as("id_b"), col("g"))
    val inter = a.join(b, Seq("g")).where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(cnt.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------ MinHash + LSH

  private def sigCols: Seq[Column] =
    (0 until MinHashK).map(j => min(md5(concat_ws(":", lit(j), col("g")))).as(s"s$j"))

  /** Per-doc MinHash signature (s0..s31) from word shingles. */
  def minhashSignatures(docs: DataFrame, k: Int = Shingle): DataFrame =
    shingles(docs, k).groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)

  /** LSH candidate pairs with estimated similarity ≥ threshold. */
  def minhashLshPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sig = minhashSignatures(docs).cache()
    val r = MinHashK / Bands
    val bandCol = explode(array((0 until Bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until r).map(i => col(s"s${b * r + i}")): _*)).as("h"))
    }: _*)).as("bh")
    val bands = sig.select(col("doc_id"), bandCol)
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.h") === col("y.h") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val sa = sig.toDF(sig.columns.map(c => if (c == "doc_id") "id_a" else c + "_a"): _*)
    val sb = sig.toDF(sig.columns.map(c => if (c == "doc_id") "id_b" else c + "_b"): _*)
    val matches = (0 until MinHashK)
      .map(j => when(col(s"s${j}_a") === col(s"s${j}_b"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est_sim", round(matches.cast("double") / MinHashK, 6))
      .where(col("est_sim") >= threshold)
      .select("id_a", "id_b", "est_sim")
  }

  // ------------------------------------------------------------ SimHash

  /** 64-bit SimHash over word tokens (xxhash64 — fast path, no SQL oracle;
    * correctness pinned by the planted-duplicate unit test).
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val tok = withTokens(docs).select(col(idCol), explode(col("ws")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { i =>
      sum(when(expr(s"(h >> $i) & 1") === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    val agg = tok.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64)
      .map(i => when(col(s"b$i") > 0L, expr(s"CAST(1 AS BIGINT) << $i")).otherwise(0L))
      .reduce(_ + _) // bits are disjoint powers of two — sum == bitwise-or
    agg.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: share one of four 16-bit bands AND Hamming ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sh = simhash(docs).cache()
    val bands = sh.select(col("doc_id"), col("simhash"), explode(array(
      (0 until 4).map(b => struct(lit(b).as("band"),
        expr(s"(simhash >> ${b * 16}) & 65535").as("h"))): _*)).as("bh"))
      .select(col("doc_id"), col("simhash"), col("bh.band").as("band"), col("bh.h").as("h"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.h") === col("y.h") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
