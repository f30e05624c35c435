package graft.tjk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * All arithmetic is done with codegen'd higher-order functions
  * (`zip_with` + `aggregate`) in DOUBLE, summed in index order — which makes
  * the result reproducible across engines (the DuckDB oracle sums the same
  * promoted doubles). No UDFs.
  *
  *  - [[bruteForceTopK]]: exact top-k neighbors — the correctness baseline.
  *    Scale shape: broadcast the (small) query set against the corpus scan;
  *    one pass, no shuffle of the corpus.
  *  - [[ivfTopK]]: IVF-style scale path — corpus assigned to the nearest of
  *    C deterministic centroids (one narrow pass), queries probe only the
  *    nProbe nearest cells. Recall is validated against brute force in
  *    VectorSuite; approximate by design, so no SQL oracle.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double, sequential index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k by cosine for each query vector. Output:
    * (qid, vid, cos, rank); rank deterministic via (rounded cos desc, vid).
    */
  def bruteForceTopK(
      queries: DataFrame, // (qid, qe)
      corpus: DataFrame,  // (vid, ve)
      k: Int): DataFrame = {
    val sims = broadcast(queries).join(corpus, col("vid") =!= col("qid"))
      .withColumn("cos", round(cosine(col("qe"), col("ve")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "vid", "cos", "rank")
  }

  /** All near-duplicate pairs with cosine ≥ threshold (exact, pairwise) —
    * reference expression-tree form. Readable but allocation-bound (~600×
    * slower than [[cosineNearDupPairsFast]] on the pair loop); kept for
    * equivalence testing.
    */
  def cosineNearDupPairs(vecs: DataFrame, threshold: Double): DataFrame = {
    val a = vecs.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = vecs.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("ea"), col("eb")), 6))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Matches Spark's round(x, 6): decimal HALF_UP on the double's value. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def dotPrim(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d
  }
  private def normPrim(a: Array[Float]): Double = math.sqrt(dotPrim(a, a))

  /** Exact pairwise near-dup, fast path: one side broadcast as primitive
    * float arrays, the other streamed partition-by-partition with a tight
    * primitive dot loop — identical values to [[cosineNearDupPairs]] (same
    * sequential double arithmetic, same HALF_UP rounding), no per-pair
    * allocations, no 2M-row join shuffle. At 100 TB the broadcast side is a
    * block: wrap this in a loop over corpus blocks (block-nested cartesian),
    * or prefilter candidates with [[TextOps.minhashLshPairs]]-style LSH.
    */
  def cosineNearDupPairsFast(vecs: DataFrame, threshold: Double): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val ds = vecs.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
    val all = ds.collect().sortBy(_._1)
    val norms = all.map(v => normPrim(v._2))
    val bc = spark.sparkContext.broadcast((all, norms))
    // The corpus often arrives as ONE parquet split at this size — spread the
    // O(n²/2) pair loop across all cores, it is embarrassingly parallel.
    val parts = spark.sparkContext.defaultParallelism
    // round6(x) ≥ t ⟺ x ≥ t − 5e-7 (t a multiple of 1e-6, HALF_UP): gate on
    // the raw value with 1e-6 slack so the (allocating) BigDecimal rounding
    // runs only on near-threshold survivors, not on every pair.
    val rawGate = threshold - 1e-6
    ds.repartition(parts).mapPartitions { it =>
      val (b, bn) = bc.value
      it.flatMap { case (ida, ea) =>
        val na = normPrim(ea)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var j = 0
        while (j < b.length) {
          val (idb, eb) = b(j)
          if (idb > ida) {
            val raw = dotPrim(ea, eb) / (na * bn(j))
            if (raw >= rawGate) {
              val cos = round6(raw)
              if (cos >= threshold) out += ((ida, idb, cos))
            }
          }
          j += 1
        }
        out
      }
    }.toDF("id_a", "id_b", "cos")
  }

  /** Exact top-k, fast path: queries broadcast as primitive arrays, corpus
    * scanned once; each partition keeps only its local top-k per query
    * (ordered by (rounded cos desc, vid asc) — the same total order as the
    * final ranking, so per-partition pruning cannot drop a global winner),
    * then a tiny final window ranks parts×k rows per query. Scale shape:
    * corpus never shuffles; reduce output is O(parts·|Q|·k).
    */
  def bruteForceTopKFast(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qs = queries.select(col("qid").cast("long"), col("qe"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val qNorms = qs.map(q => normPrim(q._2))
    val bc = spark.sparkContext.broadcast((qs, qNorms))
    val partial = corpus.select(col("vid").cast("long"), col("ve"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val (q, qn) = bc.value
        // per-query bounded buffer of the k best (cos desc, vid asc)
        val ord = Ordering.by[(Long, Long, Double), (Double, Long)] {
          case (_, vid, cos) => (-cos, vid)
        }
        val heaps = Array.fill(q.length)(
          scala.collection.mutable.PriorityQueue.empty[(Long, Long, Double)](ord))
        it.foreach { case (vid, ve) =>
          val nv = normPrim(ve)
          var i = 0
          while (i < q.length) {
            val (qid, qe) = q(i)
            if (vid != qid) {
              val cos = round6(dotPrim(qe, ve) / (qn(i) * nv))
              val h = heaps(i)
              if (h.size < k) h.enqueue((qid, vid, cos))
              else if (ord.lt((qid, vid, cos), h.head)) { h.dequeue(); h.enqueue((qid, vid, cos)) }
            }
            i += 1
          }
        }
        heaps.iterator.flatMap(_.iterator)
      }
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    partial.toDF("qid", "vid", "cos")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF: centroids = the nCells lowest vec_ids (deterministic, no RNG —
    * at scale these come from a persisted k-means pass). Every corpus vector
    * is assigned to its single nearest centroid; each query probes the
    * nProbe nearest cells and ranks only those cells' members.
    */
  def ivfTopK(
      vecs: DataFrame, // (vec_id, embedding)
      queryIds: Column, // predicate over vec_id selecting queries
      k: Int,
      nCells: Int,
      nProbe: Int): DataFrame = {
    // Native codegen'd cosine (expressions.CosineSimilarity): the hot loop of
    // the cell assignment runs inside WholeStageCodegen instead of the
    // interpreted zip_with/aggregate path (~2000x per-pair).
    val cosN = (a: Column, b: Column) =>
      expressions.NativeFunctions.cosineNative(vecs.sparkSession, a, b)
    val cents = broadcast(
      vecs.orderBy("vec_id").limit(nCells)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
    def nearestCells(df: DataFrame, idC: String, vecC: String, keep: Int) = {
      val w = Window.partitionBy(idC).orderBy(col("ccos").desc, col("cid"))
      df.join(cents)
        .withColumn("ccos", round(cosN(col(vecC), col("ce")), 6))
        .withColumn("crank", row_number().over(w))
        .where(col("crank") <= keep)
        .drop("ce", "ccos", "crank")
    }
    val assigned = nearestCells(
      vecs.select(col("vec_id").as("vid"), col("embedding").as("ve")), "vid", "ve", 1)
    val probes = nearestCells(
      vecs.where(queryIds).select(col("vec_id").as("qid"), col("embedding").as("qe")),
      "qid", "qe", nProbe)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    probes.join(assigned, "cid")
      .where(col("vid") =!= col("qid"))
      .withColumn("cos", round(cosN(col("qe"), col("ve")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "vid", "cos", "rank")
  }
}
