package graft.tjk

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing: greedily fill fixed token-budget training sequences
  * with documents — the packing step that turns a curated corpus into
  * context-window-sized training rows.
  *
  * Greedy packing is inherently sequential, so the distributed form shards
  * first: documents are assigned a deterministic md5-derived shard (last
  * hex nibble of md5(doc_id) → 16 shards), each shard is walked IN doc_id
  * ORDER with the classic first-fit rule (close the open pack when the next
  * document would overflow the budget; an oversized document gets a pack of
  * its own), and shards pack independently in parallel. Determinism does
  * not depend on physical partitioning: a shard is hash-routed wholly to
  * one task and walked in sorted order, so any shard count / executor
  * layout yields byte-identical assignments. At cluster scale the shard
  * nibble widens (two nibbles → 256 shards, …) — one constant, same plan.
  *
  * Plan shape: scan → narrow project → ONE shuffle (hash by shard, sort
  * within partitions) → streaming per-partition walk with O(1) state. No
  * driver collect, no join; the sort is the only data-sized cost and it is
  * exactly the sort a packed-training-data writer needs anyway.
  */
object Pack {

  case class PackDoc(doc_id: Long, n_tokens: Long, shard: Int)
  case class PackAssign(doc_id: Long, shard: Int, pack_id: Long, n_tokens: Long)

  /** Deterministic shard in [0, 16): last hex nibble of md5(id). */
  def shardCol(id: Column): Column =
    conv(substring(md5(id.cast("string")), 32, 1), 16, 10).cast("int")

  /** Greedy-pack `docs` — expects `(doc_id, n_tokens)` — into sequences of
    * at most `budget` tokens per (shard, pack). Walk rule per shard, in
    * doc_id order: the first document anchors pack 0 unconditionally; each
    * further document joins the open pack unless it would push the
    * accumulated tokens past the budget, in which case it opens the next
    * pack. Output: one row per document with its (shard, pack_id).
    */
  def packGreedy(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val t = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("n_tokens").cast("long").as("n_tokens"),
      shardCol(col("doc_id")).as("shard"))
    t.as(Encoders.product[PackDoc])
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .mapPartitions { it =>
        // a partition holds whole shards (hash routing), possibly several,
        // in (shard, doc_id) order — O(1) state, reset at shard boundaries
        var shard = -1
        var pack = 0L
        var acc = 0L
        it.map { d =>
          if (d.shard != shard) { shard = d.shard; pack = 0L; acc = d.n_tokens }
          else if (acc + d.n_tokens > budget) { pack += 1; acc = d.n_tokens }
          else acc += d.n_tokens
          PackAssign(d.doc_id, d.shard, pack, d.n_tokens)
        }
      }(Encoders.product[PackAssign])
      .toDF()
  }
}
