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
  *    pairs blocked by shared NON-HOT shingle (a pair with zero shared
  *    shingles has Jaccard 0 and is correctly absent; the [[HotShingleDf]]
  *    cap keeps one ubiquitous shingle from creating a quadratic hot block)
  *    — shuffle is on the shingle, so a hot document spreads across
  *    partitions.
  *  - MinHash+LSH: 32 md5-based min-hashes → 8 bands × 4 rows; candidates =
  *    pairs sharing a band; similarity estimated as matching-component
  *    fraction. md5 (not xxhash64) so the DuckDB oracle can replicate
  *    bit-for-bit; at production scale swap HASH_FN to xxhash64 for speed —
  *    semantics identical.
  *  - SimHash: 64-bit sign-aggregated token hash; near-dups = pairs sharing
  *    a 16-bit band with Hamming distance ≤ k. Token hash is pluggable:
  *    xxhash64 (production fast path) or md5-hex (DuckDB-replicable oracle
  *    path — same swap convention as MinHash).
  */
object TextOps {

  val Shingle = 3
  val MinHashK = 32
  val Bands = 8 // rows per band = MinHashK / Bands = 4

  /** Candidate-join guard: shingles appearing in more document sets than this
    * are excluded from candidate GENERATION (never from Jaccard verification).
    * A shingle with document frequency f contributes O(f²) candidate pairs,
    * so one ubiquitous shingle would otherwise create a quadratic hot block.
    */
  val HotShingleDf = 128

  /** Word tokens (single-space corpus; split is regex-free on both engines). */
  def withTokens(docs: DataFrame): DataFrame =
    docs.withColumn("ws", split(col("text"), " "))

  /** Spread a genuinely SMALL input across all cores before a big per-row
    * fan-out (shingle/hash explode multiplies rows 32–64×): a small corpus
    * often arrives as ONE parquet split, which would serialize the whole
    * fan-out stage. Decided from optimizer statistics — NOT
    * `df.rdd.getNumPartitions`, which physically plans the query a second
    * time just to read a partition count. Large inputs (≥ ~32 MB/core, i.e.
    * anything that already splits well) pass through untouched — no shuffle.
    */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    // Threshold = cores × maxPartitionBytes: below it, the file scan yields
    // FEWER splits than cores (Spark packs ≤ maxPartitionBytes per split),
    // so the fan-out stage would underuse the cluster without this
    // repartition; at or above it, the scan already splits ≥ p ways and the
    // input passes through untouched.
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Stats fall back to defaultSizeInBytes (≈Long.MaxValue) for sources
    // with no size estimate — that is "unknown", not "large": treating it as
    // large would silently serialize the very fan-out this method exists to
    // parallelize. Unknown ⇒ assume small (a redundant repartition of a big
    // input costs one shuffle; a serialized 64× fan-out costs the cluster).
    val unknown = size >= BigInt(spark.sessionState.conf.defaultSizeInBytes)
    val small = unknown || size < BigInt(p.toLong) * maxSplit
    if (small) df.repartition(p) else df
  }

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
    // no spread here (unlike the shingle fan-outs): scoring is ~10 codegen'd
    // expressions per doc with no row multiplication — measured, the
    // repartition cost exceeded the parallelism it bought on small corpora,
    // and well-split large inputs never needed it
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

  /** Canonical-id mapping per exact-content group (md5 of raw bytes).
    * The fingerprint subplan feeds BOTH sides of the group join — persist
    * it (id+hash only, tiny vs the corpus) so the full-text scan + md5 runs
    * once, not once per side. Same branch-point discipline as
    * [[ngramJaccardPairs]]; LRU-evictable, releasable via `scope`
    * ([[CacheScope]]) after the result is materialized.
    */
  def exactDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val fp = scope.track(docs.select(col(idCol), md5(col("text")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    dedupByFingerprint(fp, idCol).select(col(idCol), col("fp"),
      col("canonical_id"), col("group_size"))
  }

  /** The grouping core of [[exactDedup]] over a frame that ALREADY carries
    * an `fp` fingerprint column: appends `(canonical_id, group_size)` per
    * group, keeping every input column. Callers that computed (and
    * persisted) a fingerprint projection as part of a wider pass reuse it
    * here instead of paying [[exactDedup]]'s second corpus scan.
    */
  def dedupByFingerprint(fp: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val groups = fp.groupBy("fp").agg(
      min(col(idCol)).as("canonical_id"),
      count(lit(1)).as("group_size"))
    fp.join(groups, "fp")
  }

  // ------------------------------------------------------------ shingles

  /** Distinct word k-shingles per doc; docs shorter than k words drop out. */
  def shingles(docs: DataFrame, k: Int = Shingle, idCol: String = "doc_id"): DataFrame =
    withTokens(spread(docs))
      .where(size(col("ws")) >= k)
      .select(col(idCol), explode(expr(
        s"array_distinct(transform(sequence(0, size(ws) - $k), i -> concat_ws(' ', slice(ws, i + 1, $k))))"
      )).as("g"))

  /** Intra-document k-gram repetition — the duplicate-n-gram quality
    * signal of crawl-filtering pipelines (a document that keeps repeating
    * the same phrases is boilerplate/spam): per doc, total vs distinct
    * word k-grams and `rep_ratio = 1 − distinct/total`. Pure per-row
    * expressions over the token array — NO explode, NO KEY SHUFFLE: the
    * operator scales linearly with the scan. Like the shingle ops it runs
    * through [[spread]]: building ~k× gram strings per row is exactly the
    * big per-row fan-out that serializes on an under-split scan (measured:
    * a 4M-doc corpus read as 4 parquet splits ran the projection 4-way on
    * 8 cores); well-split inputs pass through with no exchange at all.
    * Integer counts first, ONE float division rounded at 6dp (the
    * cross-engine discipline that keeps ratio columns bit-exact).
    */
  def repetitionStats(
      docs: DataFrame, k: Int = Shingle, idCol: String = "doc_id"): DataFrame = {
    // gram identity = the k-token TUPLE, not a concatenated string: tokens
    // come from splitting on ' ' so they cannot contain the separator, and
    // struct equality reads the existing token bytes in place — no per-gram
    // string allocation/copy (measured: the concat form was memory-
    // bandwidth-bound, 2→8 cores bought only 1.5×)
    val fields = (0 until k).map(j => s"'t$j', ws[i + $j]").mkString(", ")
    withTokens(spread(docs))
      .where(col("text").isNotNull && size(col("ws")) >= k)
      .select(col(idCol),
        (size(col("ws")) - (k - 1)).cast("long").as("n_grams"),
        expr(s"size(array_distinct(transform(sequence(0, size(ws) - $k), " +
          s"i -> named_struct($fields))))")
          .cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) -
          col("n_distinct").cast("double") / col("n_grams").cast("double"), 6))
  }

  /** Shingles whose document frequency exceeds the cap — the quadratic
    * hot-block set. Tiny by construction (AQE broadcasts it).
    */
  private def hotShingles(sh: DataFrame, maxShingleDf: Int): DataFrame =
    sh.groupBy("g").agg(count(lit(1)).as("df"))
      .where(col("df") > maxShingleDf).select("g")

  /** (id_a, id_b, inter_rare): candidate pairs sharing ≥1 NON-HOT shingle
    * (`hot` = precomputed [[hotShingles]] set), with the count of shared
    * non-hot shingles — produced directly by the rare-shingle self-join's
    * group-by, so candidate generation and the rare part of the
    * intersection cost ONE aggregation.
    */
  private def rarePairCounts(sh: DataFrame, hot: DataFrame): DataFrame = {
    val rare = sh.join(hot, Seq("g"), "left_anti")
    rare.select(col("doc_id").as("id_a"), col("g"))
      .join(rare.select(col("doc_id").as("id_b"), col("g")), Seq("g"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter_rare"))
  }

  /** Candidate pairs sharing ≥1 non-hot shingle (df ≤ maxShingleDf).
    * Package-visible so the hot-shingle bound is directly testable.
    */
  private[graft] def ngramCandidates(
      sh: DataFrame, maxShingleDf: Int): DataFrame =
    rarePairCounts(sh, hotShingles(sh, maxShingleDf)).select("id_a", "id_b")

  /** Exact n-gram Jaccard near-dup pairs (j ≥ threshold) over candidates
    * sharing at least one non-hot shingle. The [[HotShingleDf]] cap applies
    * to candidate GENERATION only; the emitted Jaccard is exact over the
    * FULL shingle sets, decomposed as |A∩B| = rare-part + hot-part:
    *
    *  - rare-part falls out of the candidate self-join's group-by (free);
    *  - hot-part re-joins candidates against only the (doc, HOT shingle)
    *    rows — a set linear in Σ df(hot), never the C(df,2) pair blow-up,
    *    and empty on any corpus without hot shingles.
    *
    * A pair whose EVERY shared shingle is hot is missed — at threshold 0.8
    * a true pair shares ≥ 80% of its shingle union, so any realistic cap
    * loses nothing (planted-hot-shingle property pinned in TextVecSuite;
    * the DuckDB oracle replicates the same capped-candidates + exact-verify
    * semantics).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double,
      k: Int = Shingle,
      maxShingleDf: Int = HotShingleDf,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // The shingle fan-out feeds several consumers (df-cap, candidate self-
    // join, hot-part verify, per-doc counts); persist it once (spilling to
    // disk at scale) instead of re-running the split+explode scan per
    // consumer — the same branch-point discipline as minhashLshPairs. The
    // blocks stay LRU-evictable (MEMORY_AND_DISK storage is reclaimed under
    // executor memory pressure); a caller wanting eager release passes a
    // [[CacheScope]] and releases after consuming the result.
    val sh = scope.track(shingles(docs, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // hot is tiny by construction but its PLAN is a full-corpus groupBy
    // over the shingle fan-out — unpersisted it would re-run for each of
    // its three consumers (the isEmpty probe, the anti-join, the hot-part
    // join): three full shuffles for a set that fits in memory.
    val hot = scope.track(hotShingles(sh, maxShingleDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // One tiny probe job: on a corpus with NO hot shingle (df ≤ cap
    // everywhere — most corpora most of the time), the anti-join and the
    // whole hot-part machinery are identities over empty sets; skip their
    // ~4 stages instead of letting AQE discover the emptiness shuffle by
    // shuffle. Values are identical by construction either way (hot-part
    // = 0 for every pair when no shingle is hot).
    val anyHot = !hot.isEmpty
    val inter =
      if (!anyHot)
        rarePairCounts(sh, hot.limit(0))
          .withColumnRenamed("inter_rare", "inter")
      else {
        // interRare feeds BOTH the hot-part probe join and the final
        // rare+hot merge; unpersisted, the whole rare self-join pipeline
        // would run twice. Pair-count-sized, LRU-evictable like sh/hot.
        val interRare = scope.track(rarePairCounts(sh, hot)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val hotSh = sh.join(hot, Seq("g"))
        val interHot = interRare.select("id_a", "id_b")
          .join(hotSh.select(col("doc_id").as("id_a"), col("g")), Seq("id_a"))
          .join(hotSh.select(col("doc_id").as("id_b"), col("g")), Seq("id_b", "g"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter_hot"))
        interRare
          .join(interHot, Seq("id_a", "id_b"), "left")
          .withColumn("inter",
            col("inter_rare") + coalesce(col("inter_hot"), lit(0L)))
      }
    // Consumed by BOTH join sides (na and nb): persisted, the count
    // aggregation walks the gram stream ONCE instead of once per side —
    // a full pass over the shingle cache removed (measured: two identical
    // 0.7 s / 4.5 s-CPU stages at bench scale). Doc-count-sized.
    val cnt = scope.track(sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    inter
      .join(cnt.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(cnt.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------ MinHash + LSH

  /** Per-doc MinHash signature as `sig: array<string>[MinHashK]`.
    *
    * Deliberately NARROW plan: one row per (doc, hash-index) through the
    * aggregation instead of MinHashK separate `min(md5(…))` agg columns.
    * The wide form is semantically identical but generates enormous
    * whole-stage-codegen classes (MinHashK string agg buffers) whose janino
    * compile alone cost ~40 s cold — plan width, not data volume, was the
    * bottleneck. Values are unchanged: `md5(j || ':' || g)` per (j, shingle),
    * `min` per (doc, j), assembled in j order.
    */
  def minhashSignatures(docs: DataFrame, k: Int = Shingle): DataFrame =
    // ONE typed aggregate per doc ([[expressions.MinHashSig]]) replaces the
    // explode(MinHashK) + builtin-md5 + two-level groupBy pipeline: element
    // j of `sig` is byte-for-byte min(md5(concat("<j>:", g))) over the
    // doc's grams (value-identity argument — raw-digest unsigned min ≡ hex
    // string min — in the expression's doc), but the grams×MinHashK row
    // explosion, its 80M hash-agg probes (80 s CPU at bench scale, the most
    // CPU-expensive stage of the whole catalog), the per-call
    // MessageDigest.getInstance inside the built-in Md5, and the SECOND
    // exchange that reassembled per-doc arrays from (doc_id, j) mins are
    // all gone: one exchange on doc_id, one k×16-byte buffer per doc
    // through it.
    shingles(docs, k)
      .groupBy("doc_id")
      .agg(expressions.NativeFunctions
        .minhashSigNative(docs.sparkSession, col("g"), MinHashK).as("sig"))

  /** MinHash LSH band rows (doc_id, band, h) from a signature column: band
    * hash = md5 over the band's signature slice, '|'-joined (array form of
    * the original concat_ws over named columns — same bytes). Shared with
    * the Profile stage-timer so the profiled banding can never drift from
    * the production banding.
    */
  private[graft] def minhashBandRows(sig: DataFrame): DataFrame = {
    val r = MinHashK / Bands
    sig.select(col("doc_id"), explode(expr(
        s"transform(sequence(0, ${Bands - 1}), " +
          s"b -> struct(b AS band, md5(array_join(slice(sig, b * $r + 1, $r), '|')) AS h))"
      )).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
  }

  /** LSH candidate pairs with estimated similarity ≥ threshold. */
  def minhashLshPairs(
      docs: DataFrame,
      threshold: Double,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val sig = scope.track(minhashSignatures(docs).cache())
    val bands = minhashBandRows(sig)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.h") === col("y.h") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val sa = sig.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val sb = sig.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
    cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est_sim", round(
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
          .cast("double") / MinHashK, 6))
      .where(col("est_sim") >= threshold)
      .select("id_a", "id_b", "est_sim")
  }

  // ------------------------------------------------------------ SimHash

  /** Token-hash source for SimHash: xxhash64 is the production fast path
    * (one codegen'd 64-bit hash per token); Md5Hex derives the 64 bits from
    * the first 16 hex chars of md5(token) — slower, but exactly replicable
    * by the DuckDB oracle (same convention as MinHash's md5: swap to
    * xxhash64 at production scale, semantics identical).
    */
  sealed trait TokenHash
  object TokenHash {
    case object Xx64 extends TokenHash
    case object Md5Hex extends TokenHash
  }

  /** 64-bit SimHash over word tokens. */
  def simhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      hash: TokenHash = TokenHash.Xx64): DataFrame = {
    // One 64-bit hash per token (the oracle-replicable formula), then ONE
    // typed aggregate per doc ([[expressions.SimHashAgg]]): the former
    // explode(sequence(0,63)) pushed tokens×64 rows through a hash
    // aggregate keyed (doc, i) plus a SECOND exchange to fold the per-bit
    // sums back into the long — the q20 dominant stage. The aggregate keeps
    // 64 primitive counters per doc instead (value-identity argument in its
    // doc; pinned against the literal explode form for both token hashes
    // in TextVecSuite).
    val tokens = withTokens(spread(docs)).select(col(idCol), explode(col("ws")).as("w"))
    val withH = hash match {
      case TokenHash.Xx64 =>
        tokens.withColumn("h", xxhash64(col("w")))
      case TokenHash.Md5Hex =>
        // The 64-bit value spelled by md5's FIRST 16 hex chars (big-endian:
        // digit at 1-based position p carries weight 16^(16−p)), assembled
        // ONCE per token from two 8-hex-char halves — shiftleft wraps to the
        // two's-complement bit pattern with no ANSI overflow; bit i of h is
        // digit 16 − i/4, bit i%4 — exactly (h >> i) & 1, the convention
        // the DuckDB oracle replicates.
        tokens.withColumn("hx", substring(md5(col("w")), 1, 16))
          .withColumn("h", expr(
            "shiftleft(CAST(conv(substring(hx, 1, 8), 16, 10) AS BIGINT), 32)" +
              " | CAST(conv(substring(hx, 9, 8), 16, 10) AS BIGINT)"))
    }
    withH.groupBy(idCol)
      .agg(expressions.NativeFunctions
        .simhashNative(docs.sparkSession, col("h")).as("simhash"))
  }

  /** SimHash near-dup pairs: share one of four 16-bit bands AND Hamming ≤ maxHamming. */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int,
      hash: TokenHash = TokenHash.Xx64,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val sh = scope.track(simhash(docs, hash = hash).cache())
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
