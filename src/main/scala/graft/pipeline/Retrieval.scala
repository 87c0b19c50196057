package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
    // per-term document frequency is an exact identity of the tf table
    // (one row per (doc, term) ⇒ df_t = tf's row count for the term), so
    // no second corpus text pass — the previous shape re-scanned the full
    // normalized text once per query term for a substring probe. Corpus
    // stats (N, Σtokens) stay a column-pruned single aggregate.
    val dfs = tf.groupBy(col("__term")).agg(count(lit(1)).alias("__df"))
    val stats = df.agg(count(lit(1)).alias("__n"),
      sum(size(toks).cast(LongType)).alias("__tot"))
    val avgdl = col("__tot").cast(DoubleType) / col("__n").cast(DoubleType)
    val dfc = col("__df")
    val idf = log(lit(1.0) +
      (col("__n").cast(DoubleType) - dfc + 0.5) / (dfc + 0.5))
    val contrib = idf * (col("__tf") * (k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast(DoubleType) / avgdl))
    // no broadcast hint on dfs: a hint would force the tf subplan to
    // compute twice (build + probe), while the plain join lets
    // ReuseExchange share tf's aggregate exchange between both references
    // and AQE still broadcasts the tiny aggregated build side at runtime
    val scored = tf
      .join(dfs, Seq("__term"))
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

  /** Multi-query BM25 top-k: score a whole batch of queries in ONE corpus
    * pass. `queries` is a DataFrame (`queryIdCol`, `termsCol`: array of
    * terms); output is (queryIdCol, idCol, rank, score), the per-query
    * top-k.
    *
    * Scale shape: the distinct term set across all queries (tiny — query
    * batches are KBs against a 100 TB corpus) joins the corpus token
    * stream, so only (doc, query-term) occurrences ever shuffle, shared by
    * every query that mentions the term; document frequency and the corpus
    * stats are aggregates of that same filtered stream (no per-query corpus
    * scan, unlike running [[bm25TopK]] per query). The per-query fan-out
    * happens after aggregation, on (doc, term) rows.
    *
    * Determinism for cross-engine replay: [[bm25TopK]]'s fixed-order pivot
    * does not extend to a relational query set, so per-term contributions
    * are instead quantized to exact BIGINT micro-units
    * (`floor(c·10⁶ + 0.5)` — contributions are positive, so this is
    * half-up in any engine) and summed as integers — order-independent by
    * construction; only the final score is one double division, then
    * [[TextAnalysis.roundDet]]. Per-query ranking sorts only that query's
    * matching docs (window keyed by query id; skew is bounded by the
    * busiest query's match count). */
  def bm25TopKMultiQuery(df: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, queryIdCol: String, termsCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = queries.select(col(queryIdCol).alias("__qid"),
      explode(col(termsCol)).alias("__term")).distinct()
    val terms = qt.select(col("__term")).distinct()
    val toks = split(Dedup.normalizeText(col(textCol)), " ")
    val tokens = df.select(col(idCol), size(toks).alias("__dl"),
        explode(toks).alias("__term"))
      .join(terms, Seq("__term")) // AQE broadcasts the tiny term set
    val tf = tokens.groupBy(col(idCol), col("__term"))
      .agg(max(col("__dl")).alias("__dl"), count(lit(1)).alias("__tf"))
    val stats = df.agg(count(lit(1)).alias("__n"),
      sum(size(toks).cast(LongType)).alias("__tot"))
    scoreTf(tf, stats, qt, idCol, queryIdCol, k, k1, b)
  }

  /** Materialized postings index: ONE corpus tokenization pass into
    * (term, id, tf, dl) — the "build once, query many" layout real
    * retrieval over 100 TB uses (write it sorted by term so scans of a
    * query's postings prune row groups on the term min/max stats). `dl`
    * is denormalized per posting so scoring never rejoins the corpus. */
  def buildPostingsIndex(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val toks = split(Dedup.normalizeText(col(textCol)), " ")
    df.select(col(idCol), size(toks).alias("dl"),
        explode(toks).alias("term"))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).alias("tf"), max(col("dl")).alias("dl"))
  }

  /** Multi-query BM25 over a prebuilt [[buildPostingsIndex]] table —
    * bit-identical to [[bm25TopKMultiQuery]] on the same corpus (the
    * corpus stats N = distinct ids and Σtokens = Σtf are exact integer
    * identities of the one-pass form, and the scoring tail is the shared
    * code path), without re-tokenizing the corpus per batch. The term
    * filter lands on the index scan, so a query batch touches only its
    * own postings. Requires unique `idCol` values (any real corpus). */
  def bm25TopKFromIndex(postings: DataFrame, idCol: String,
      queries: DataFrame, queryIdCol: String, termsCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = queries.select(col(queryIdCol).alias("__qid"),
      explode(col(termsCol)).alias("__term")).distinct()
    val terms = qt.select(col("__term")).distinct()
    val tf = postings.select(col("term").alias("__term"), col(idCol),
        col("dl").alias("__dl"), col("tf").alias("__tf"))
      .join(terms, Seq("__term"))
    val stats = postings.agg(count_distinct(col(idCol)).alias("__n"),
      sum(col("tf")).alias("__tot"))
    scoreTf(tf, stats, qt, idCol, queryIdCol, k, k1, b)
  }

  /** Multi-query TF-IDF top-k over a prebuilt [[buildPostingsIndex]]
    * table — the classic log-tf · smooth-idf weighting
    * (w = (1 + ln tf) · ln(1 + N/df)), the length-normalization-free
    * cousin of BM25 for when document length IS signal (short spammy docs
    * shouldn't outrank long substantive ones term-for-term). Same
    * determinism scheme as the BM25 tail: per-term contributions quantize
    * to exact BIGINT micro-units (positive, so floor(+0.5) is half-up
    * anywhere), the per-(query, doc) sum is order-independent integer
    * arithmetic, and only the final score is one double division +
    * [[TextAnalysis.roundDet]]. The term filter lands on the index scan.
    * Output: (queryIdCol, idCol, rank, score). */
  def tfidfTopKFromIndex(postings: DataFrame, idCol: String,
      queries: DataFrame, queryIdCol: String, termsCol: String,
      k: Int = 10): DataFrame = {
    val qt = queries.select(col(queryIdCol).alias("__qid"),
      explode(col(termsCol)).alias("__term")).distinct()
    val terms = qt.select(col("__term")).distinct()
    val tf = postings.select(col("term").alias("__term"), col(idCol),
        col("tf").alias("__tf"))
      .join(terms, Seq("__term"))
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).alias("__df"))
    val stats = postings.agg(count_distinct(col(idCol)).alias("__n"))
    val contrib = (lit(1.0) + log(col("__tf").cast(DoubleType))) *
      log(lit(1.0) + col("__n").cast(DoubleType) / col("__df"))
    val scaled = tf.join(dfreq, Seq("__term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("__term"),
        floor(contrib * 1e6 + 0.5).cast(LongType).alias("__cs"))
    val perQueryDoc = scaled.join(qt, Seq("__term"))
      .groupBy(col("__qid"), col(idCol))
      .agg(sum(col("__cs")).alias("__s"))
      .select(col("__qid"), col(idCol),
        TextAnalysis.roundDet(col("__s").cast(DoubleType) / 1e6, 4).alias("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid")).orderBy(col("score").desc, col(idCol).asc)
    perQueryDoc.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("__qid").alias(queryIdCol), col(idCol), col("rank"),
        col("score"))
  }

  /** Shared BM25 scoring tail: per-term contributions quantized to exact
    * BIGINT micro-units (order-independent sums), one double division at
    * the end, per-query top-k window. `tf` = (__term, idCol, __dl, __tf)
    * already filtered to query terms; `stats` = one row (__n, __tot). */
  private def scoreTf(tf: DataFrame, stats: DataFrame, qt: DataFrame,
      idCol: String, queryIdCol: String, k: Int, k1: Double,
      b: Double): DataFrame = {
    // per-term document frequency falls out of tf (one row per (doc, term))
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).alias("__df"))
    val avgdl = col("__tot").cast(DoubleType) / col("__n").cast(DoubleType)
    val idf = log(lit(1.0) +
      (col("__n").cast(DoubleType) - col("__df") + 0.5) / (col("__df") + 0.5))
    val contrib = idf * (col("__tf") * (k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast(DoubleType) / avgdl))
    val scaled = tf.join(dfreq, Seq("__term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("__term"),
        floor(contrib * 1e6 + 0.5).cast(LongType).alias("__cs"))
    val perQueryDoc = scaled.join(qt, Seq("__term"))
      .groupBy(col("__qid"), col(idCol))
      .agg(sum(col("__cs")).alias("__s"))
      .select(col("__qid"), col(idCol),
        TextAnalysis.roundDet(col("__s").cast(DoubleType) / 1e6, 4).alias("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid")).orderBy(col("score").desc, col(idCol).asc)
    perQueryDoc.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("__qid").alias(queryIdCol), col(idCol), col("rank"), col("score"))
  }

  /** Per-document keyword extraction: each document's top-k terms by
    * TF-IDF over the corpus — document tagging / faceting / topic
    * seeding, the per-DOC inversion of the per-QUERY retrieval rankings.
    * Same weighting and determinism scheme as [[tfidfTopKFromIndex]]:
    * w = (1 + ln tf) · ln(1 + N/df) quantized to exact BIGINT
    * micro-units before ranking, ties to the lexicographically smaller
    * term.
    *
    * Plan: runs straight off a [[buildPostingsIndex]] table — df is one
    * term-keyed count over it, N one scalar, and the per-doc top-k is a
    * rank window on uniform doc keys (WindowGroupLimit: partial top-k
    * per map task, no full per-doc sort materialized).
    * Output: (idCol, rank, term, score_mu). */
  def keywordsPerDoc(postings: DataFrame, idCol: String,
      k: Int = 5): DataFrame = {
    val dfreq = postings.groupBy(col("term"))
      .agg(count(lit(1)).alias("__df"))
    val stats = postings.agg(count_distinct(col(idCol)).alias("__n"))
    val contrib = (lit(1.0) + log(col("tf").cast(DoubleType))) *
      log(lit(1.0) + col("__n").cast(DoubleType) / col("__df"))
    val scored = postings.join(dfreq, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"),
        floor(contrib * 1e6 + 0.5).cast(LongType).alias("score_mu"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score_mu").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score_mu"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009): merge two
    * per-query rankings — here the lexical (BM25) and its
    * length-normalization-free twin, in general any pair including an
    * embedding ANN list — by rrf = Σ_lists 1/(c + rank), then re-rank.
    * RRF needs no score calibration between lists (only ranks enter), is
    * the standard first fusion in hybrid retrieval, and c = 60 is the
    * paper's constant.
    *
    * Shape: one full-outer equi-join of two already-tiny top-k lists per
    * query (≤ 2k rows per query, never corpus-sized) + one per-query
    * rank window. Determinism: each 1/(c + rank) is a single correctly-
    * rounded IEEE division on exact integers and the fusion is ONE
    * addition in fixed (a, b) order, so scores are bit-identical in any
    * engine; ties break by ascending id. Inputs need (queryIdCol, idCol,
    * rank). Output: (queryIdCol, fused_rank, idCol, rrf). */
  def rrfFuse(a: DataFrame, b: DataFrame, queryIdCol: String, idCol: String,
      c: Int = 60, k: Int = 10): DataFrame = {
    val ra = a.select(col(queryIdCol), col(idCol), col("rank").alias("__ra"))
    val rb = b.select(col(queryIdCol), col(idCol), col("rank").alias("__rb"))
    val rrf =
      coalesce(lit(1.0) / (lit(c.toDouble) + col("__ra").cast(DoubleType)),
        lit(0.0)) +
      coalesce(lit(1.0) / (lit(c.toDouble) + col("__rb").cast(DoubleType)),
        lit(0.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol)).orderBy(col("rrf").desc, col(idCol).asc)
    ra.join(rb, Seq(queryIdCol, idCol), "full_outer")
      .withColumn("rrf", rrf)
      .withColumn("fused_rank", row_number().over(w).cast(LongType))
      .filter(col("fused_rank") <= k)
      .select(col(queryIdCol), col("fused_rank"), col(idCol), col("rrf"))
  }
}
