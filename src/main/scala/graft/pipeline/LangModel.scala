package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Character n-gram language-model quality scoring (CCNet-style fluency
  * filtering, re-expressed in exact integer arithmetic).
  *
  * A character-trigram model is trained over the normalized corpus text in
  * ONE aggregate pass; documents are then scored by their average trigram
  * probability in fixed-point micro-units. Low-scoring documents are
  * improbable under the corpus' own character statistics — the classic
  * cheap gibberish/boilerplate/encoding-noise gate that runs before any
  * expensive neural quality model.
  *
  * 100 TB design:
  *  - Model state is bounded by the alphabet, not the corpus: normalized
  *    text draws from [a-z0-9 ] plus the boundary marker, so the trigram
  *    table never exceeds |Σ|³ ≈ 5.1e4 rows no matter how much text is
  *    scanned. Training is one map-side-combinable count aggregate; the
  *    resulting model is broadcast-sized by construction (AQE picks the
  *    broadcast join at score time without a hint).
  *  - Scoring explodes each document into trigram rows, joins the tiny
  *    model, and re-groups by document. Partial aggregation collapses the
  *    exploded rows to one row per (partition, doc) before the shuffle, so
  *    shuffle volume is O(#docs), not O(#chars).
  *  - Probabilities are fixed-point: prob_micro = floor(1e6·cnt₃/cnt₂) as
  *    a BIGINT, so per-doc sums are order-independent integer adds and the
  *    only floating op is one final division — bit-identical in any
  *    engine (same trick as [[Retrieval]]'s BM25 micro-unit scores; no
  *    transcendental log-prob, which would not replay across engines).
  *
  * Unsmoothed by design: a trigram absent from the model contributes 0 and
  * is counted in `oov_tri` — for quality gating, unseen character
  * sequences ARE the signal (add-one smoothing would only shift every
  * score by a corpus-independent epsilon).
  *
  * Reference scope note: tempo has no text pipeline; this extends the
  * training-data surface like the rest of this package.
  */
object LangModel {

  /** Boundary marker — outside the normalized alphabet, so padded-edge
    * trigrams can never collide with interior ones. */
  val Boundary = "#"

  /** (doc rows ++ tri) — one row per character-trigram of the padded
    * normalized text. A document of normalized length L yields L+1
    * trigrams (two leading markers, one trailing). */
  private def explodeTrigrams(df: DataFrame, textCol: Column,
      keep: Seq[Column]): DataFrame = {
    val padded = concat(lit(Boundary * 2), Dedup.normalizeText(textCol),
      lit(Boundary))
    df.select(keep :+ padded.alias("__pad"): _*)
      .select(keep :+ explode(sequence(lit(1),
        length(col("__pad")) - 2)).alias("__i") :+ col("__pad"): _*)
      .select(keep :+ col("__pad").substr(col("__i"), lit(3)).alias("tri"): _*)
  }

  /** Train: (tri, prob_micro) where prob_micro = floor(1e6 · cnt(tri) /
    * cnt(ctx)) and ctx is the trigram's leading 2 chars — the context
    * count is DERIVED from the trigram table as a window sum over its
    * ≤ |Σ|³ rows, so training is exactly ONE corpus pass (a ctx
    * re-aggregation joined back would re-derive the corpus explode as a
    * second scan unless runtime exchange reuse catches it — plan-audited).
    * The floor division is computed as (x − x mod d) / d: the numerator
    * is an exact multiple of d, so the one double division is exact and
    * the result replays as integer `//` in any engine. */
  def trainCharTrigramModel(df: DataFrame, textCol: Column): DataFrame = {
    val tri = explodeTrigrams(df, textCol, Seq.empty)
      .groupBy(col("tri")).agg(count(lit(1)).alias("cnt3"))
    val wCtx = org.apache.spark.sql.expressions.Window
      .partitionBy(substring(col("tri"), 1, 2))
    val x = lit(1000000L) * col("cnt3")
    tri.withColumn("cnt2", sum(col("cnt3")).over(wCtx))
      .select(col("tri"),
        ((x - pmod(x, col("cnt2"))) / col("cnt2")).cast(LongType)
          .alias("prob_micro"))
  }

  /** Score each document against a [[trainCharTrigramModel]] model.
    * Output: idCols…, n_tri, oov_tri, sum_prob_micro, lm_score (average
    * trigram probability in micro-units, one IEEE division of exact
    * integers). */
  def scoreDocs(docs: DataFrame, idCols: Seq[String], textCol: Column,
      model: DataFrame): DataFrame = {
    val keep = idCols.map(col)
    explodeTrigrams(docs, textCol, keep)
      .join(model, Seq("tri"), "left")
      .groupBy(keep: _*)
      .agg(count(lit(1)).alias("n_tri"),
        sum(when(col("prob_micro").isNull, 1L).otherwise(0L)).alias("oov_tri"),
        sum(coalesce(col("prob_micro"), lit(0L))).alias("sum_prob_micro"))
      .withColumn("lm_score",
        col("sum_prob_micro").cast(DoubleType) / col("n_tri").cast(DoubleType))
  }
}
