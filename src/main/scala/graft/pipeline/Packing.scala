package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM training: assign documents to fixed-capacity
  * training sequences by the concat-and-chunk recipe (concatenate the
  * corpus in a deterministic order, slice every `capacity` tokens — the
  * standard pretraining data layout, cf. GPT-3 / T5 packing).
  *
  * Each document occupies the half-open token interval
  * `[cum − tokens, cum)` of its group's stream (`cum` = running token sum
  * in (groupCols, idCol) order) and is assigned to the sequence where it
  * STARTS: `seq_id = floor((cum − tokens) / capacity)`, at offset
  * `(cum − tokens) mod capacity`. A document longer than the remaining
  * room straddles into the next sequence (chunking, not bin-packing) —
  * deterministic and join-light, unlike greedy first-fit heuristics that
  * depend on partition iteration order.
  *
  * The running sum is a TWO-PASS prefix sum (the [[Splits.curriculumShards]]
  * idiom), which is what makes it work on a 100 TB corpus: ids bucket into
  * ≤ `idBuckets` ordered value ranges per group, within-bucket running
  * sums window over ~N/idBuckets rows per task, per-bucket token subtotals
  * aggregate ON THE SAME (group, bucket) exchange (ReuseExchange — the
  * corpus is scanned, tokenized, and shuffled once), a prefix sum over the
  * ≤ idBuckets bucket rows per group yields each bucket's start offset,
  * and a broadcast-small join adds it back. A single-source corpus (one
  * group = most of the data) therefore packs as ⌈N/bucket⌉ parallel tasks
  * instead of the ONE window task a direct `sum over (partition by group
  * order by id)` would pin it to — bit-identical output, since bucket
  * order is monotone in id order. Bucket balance follows id spread: ids
  * clustered into a sliver of their own range degrade toward fewer
  * effective buckets (value-range granularity, the
  * [[Splits.tokenBudgetMixture]] trade).
  *
  * `idCol` must be integer-valued and unique per (group, id) — enforced
  * per row — and id ranges must span < 2^63 (no overflow in max−min).
  * Rows with a NULL id are DROPPED (a null id has no position in the id
  * order; the range join would drop it regardless), and a group whose ids
  * are all null disappears entirely (its min/max range is null). This
  * differs from the pre-two-pass window form, which ordered null ids
  * first — callers needing null-id rows must assign ids upstream.
  */
object Packing {

  /** Per-document packing assignment.
    *
    * Output: groupCols ++ (id, tokens, seq_id, seq_off) where `tokens` is
    * the [[TextAnalysis.bpeTokenEstimate]] of `textCol`, `seq_id` the
    * 0-based training-sequence index within the group, and `seq_off` the
    * token offset of the document's first token inside that sequence. */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      groupCols: Seq[String], capacity: Int, idBuckets: Int = 4096): DataFrame =
    packSequencesByTokens(df,
      TextAnalysis.bpeTokenEstimate(col(textCol)).cast(LongType),
      idCol, groupCols, capacity, idBuckets)

  /** [[packSequences]] with a caller-supplied per-document token count
    * column — the seam for tokenizer-true budgets: pass
    * [[Bpe.tokenCount]] over a trained merges table instead of the char
    * heuristic (counts differ 1.3-2×, and packing density is exactly what
    * a training pipeline budgets). `tokensCol` must be non-negative and
    * integer-valued (the running-sum-max subtotal trick depends on it). */
  def packSequencesByTokens(df: DataFrame, tokensCol: Column, idCol: String,
      groupCols: Seq[String], capacity: Int, idBuckets: Int = 4096): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(idBuckets > 0, "idBuckets must be positive")
    // synthetic constant group for the global (ungrouped) layout, so every
    // code path below has a join key
    val (base0, gNames) =
      if (groupCols.nonEmpty) (df, groupCols)
      else (df.withColumn("__g", lit(0)), Seq("__g"))
    val gcols = gNames.map(col)
    val tokens = tokensCol.cast(LongType)
    val idL = graft.tsdf.Stats.integralOrFail(col(idCol), "packSequences")
    val base = base0.select(
      (gcols :+ col(idCol)) ++ Seq(tokens.alias("tokens"), idL.alias("__id")): _*)
    // pass 0: per-group id range → bounded ordered value-range buckets;
    // span arithmetic in exact integer division (div), no 2^53 hazard
    val ranges = base.groupBy(gcols: _*)
      .agg(min(col("__id")).alias("__lo"),
        (call_function("div", max(col("__id")) - min(col("__id")),
          lit(idBuckets.toLong)) + lit(1L)).alias("__span"))
    // the explicit isnotnull matches the filter the final join would infer
    // on its own branch — without it the two consumers of the corpus
    // exchange differ by that inferred filter and ReuseExchange cannot
    // dedup them. Semantics: a null id has no position in the id order and
    // is dropped (the join would drop it regardless)
    val withBkt = base.join(ranges, gNames)
      .withColumn("__bkt",
        call_function("div", col("__id") - col("__lo"), col("__span")))
      .filter(col("__bkt").isNotNull)
    // within-bucket running sums: ordered windows over ~N/idBuckets rows
    // per task — this (g, bkt) exchange is THE corpus shuffle, and both
    // consumers below hang off it so ReuseExchange scans and tokenizes
    // the corpus once
    val wIn = Window.partitionBy(gcols :+ col("__bkt"): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inRun = withBkt.withColumn("__run", sum(col("tokens")).over(wIn))
    // per-bucket subtotals as max(__run): token estimates are >= 0, so the
    // running sum is non-decreasing and its max IS the bucket total.
    // Deriving it from the window output (rather than sum(tokens), which
    // column pruning would detach into a second scan+tokenize of the
    // corpus) pins the aggregate onto the SAME window/exchange subtree:
    // the grouping is satisfied by the child's (g, bkt) partitioning (no
    // new exchange) and ReuseExchange dedups the corpus shuffle
    val subtot = inRun.groupBy(gcols :+ col("__bkt"): _*)
      .agg(max(col("__run")).alias("__bt"))
    // prefix over the ≤ idBuckets bucket rows per group = each bucket's
    // global start offset; joins back broadcast-small
    val wB = Window.partitionBy(gcols: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bstarts = subtot.select(gcols ++ Seq(col("__bkt"),
      coalesce(sum(col("__bt")).over(wB), lit(0L)).alias("__bstart")): _*)
    val start = col("__bstart") + col("__run") - col("tokens")
    // start and capacity are longs; the double division stays exact while
    // the group's token stream is < 2^53 tokens (far past 100 TB of text)
    inRun.join(bstarts, gNames :+ "__bkt")
      .withColumn("seq_id", floor(start / capacity).cast(LongType))
      .withColumn("seq_off", (start % capacity).cast(LongType))
      .select((groupCols.map(col) :+ col(idCol)) ++
        Seq(col("tokens"), col("seq_id"), col("seq_off")): _*)
  }

  /** Per-sequence fill report: how full each training sequence is. A
    * sequence's occupancy is `min(groupTotal, (seq_id+1)·capacity) −
    * seq_id·capacity` for all but the group's last sequence (always full —
    * chunking leaves no internal gaps); only the final chunk is partial.
    * Derived from the SAME packing pass as [[packSequences]] plus one
    * groupBy on (group, seq_id). */
  def sequenceFill(df: DataFrame, textCol: String, idCol: String,
      groupCols: Seq[String], capacity: Int): DataFrame = {
    val packed = packSequences(df, textCol, idCol, groupCols, capacity)
    val gcols = groupCols.map(col)
    packed
      .groupBy(gcols :+ col("seq_id"): _*)
      .agg(count(lit(1)).alias("n_docs"),
        sum(col("tokens")).alias("doc_tokens"),
        min(col("seq_off")).alias("first_off"))
  }
}
