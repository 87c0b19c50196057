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
  * deterministic, one window pass, and no per-bin state, which is what
  * makes it work on a 100 TB corpus: one exchange on the group key, one
  * ordered window sum, zero joins. Deterministic unlike greedy first-fit
  * heuristics that depend on partition iteration order.
  */
object Packing {

  /** Per-document packing assignment.
    *
    * Output: groupCols ++ (id, tokens, seq_id, seq_off) where `tokens` is
    * the [[TextAnalysis.bpeTokenEstimate]] of `textCol`, `seq_id` the
    * 0-based training-sequence index within the group, and `seq_off` the
    * token offset of the document's first token inside that sequence. */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      groupCols: Seq[String], capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tokens = TextAnalysis.bpeTokenEstimate(col(textCol)).cast(LongType)
    val start = sum(col("tokens")).over(w) - col("tokens")
    // start and capacity are longs; the double division stays exact while
    // the group's token stream is < 2^53 tokens (far past 100 TB of text)
    df.select((groupCols.map(col) :+ col(idCol)) :+ tokens.alias("tokens"): _*)
      .withColumn("seq_id", floor(start / capacity).cast(LongType))
      .withColumn("seq_off", (start % capacity).cast(LongType))
  }

  /** Per-sequence fill report: how full each training sequence is. A
    * sequence's occupancy is `min(groupTotal, (seq_id+1)·capacity) −
    * seq_id·capacity` for all but the group's last sequence (always full —
    * chunking leaves no internal gaps); only the final chunk is partial.
    * Derived from the SAME window pass as [[packSequences]] plus one
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
