package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text retrieval over a document corpus: BM25 scoring of a fixed query-term
  * set — the curation-side lookup ("find the docs about X in 100 TB") that
  * complements the embedding ANN family with a lexical signal.
  *
  * Scale shape: the corpus is tokenized once (projection + explode, no
  * shuffle), filtered to the query terms BEFORE any aggregation — so the
  * only shuffled rows are (doc, query-term) occurrences, a vanishing
  * fraction of the corpus. Document-frequency and corpus statistics are
  * tiny aggregates that broadcast back; the final top-k is a
  * TakeOrderedAndProject (per-partition heads, no global sort).
  */
object Retrieval {

  /** BM25 top-k (Robertson/Spärck Jones; idf in the Lucene
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` form).
    *
    * Determinism for cross-engine replay: the per-document score sums its
    * per-term contributions in FIXED query-term order (pivoted columns, not
    * a float `sum()` whose addend order depends on row order), and the
    * result is [[TextAnalysis.roundDet]]-rounded before ranking; ties break
    * by ascending id. `ln` is the only transcendental — both engines
    * evaluate it on bit-identical inputs.
    */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms)
    val toks = split(Dedup.normalizeText(col(textCol)), " ")
    // one corpus pass: per-doc length + per-(doc, query-term) occurrences
    val tokens = df.select(col(idCol), size(toks).alias("__dl"),
        explode(toks).alias("__term"))
      .filter(col("__term").isin(queryTerms: _*))
    val tf = tokens.groupBy(col(idCol), col("__term"))
      .agg(max(col("__dl")).alias("__dl"), count(lit(1)).alias("__tf"))
    // tiny aggregates: document frequency per query term; corpus N + total
    // token count (second, column-pruned corpus pass)
    val dfreq = tokens.select(col(idCol), col("__term")).distinct()
      .groupBy(col("__term")).agg(count(lit(1)).alias("__df"))
    val stats = df.agg(count(lit(1)).alias("__n"),
      sum(size(toks).cast(LongType)).alias("__tot"))
    val avgdl = col("__tot").cast(DoubleType) / col("__n").cast(DoubleType)
    val idf = log(lit(1.0) +
      (col("__n").cast(DoubleType) - col("__df") + 0.5) / (col("__df") + 0.5))
    val contrib = idf * (col("__tf") * (k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast(DoubleType) / avgdl))
    val scored = tf
      .join(broadcast(dfreq), "__term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("__term"), contrib.alias("__c"))
    // fixed-order pivot sum: term_1 + term_2 + ... — row-order independent
    val pivots = queryTerms.zipWithIndex.map { case (t, i) =>
      max(when(col("__term") === t, col("__c"))).alias(s"__c$i")
    }
    val score = queryTerms.indices
      .map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduce[org.apache.spark.sql.Column](_ + _)
    scored.groupBy(col(idCol))
      .agg(pivots.head, pivots.tail: _*)
      .select(col(idCol),
        TextAnalysis.roundDet(score, 4).alias("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col(idCol).asc)).cast(LongType))
      .select(col(idCol), col("rank"), col("score"))
  }
}
