package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{BpeCount, BpeEncodeWord, BpeTable}

/** Byte-pair-encoding subword tokenizer: training (merge-table learning)
  * and tokenizer-true token counting, per Sennrich et al. 2016 (ACL,
  * "Neural Machine Translation of Rare Words with Subword Units" — the
  * public BPE algorithm; no reference-repo counterpart, this is
  * LLM-pipeline surface).
  *
  * LLM data pipelines budget in TOKENIZER tokens — packing, mixture
  * budgets, and curricula all count against a trained subword vocabulary,
  * and whitespace/char heuristics differ from it by 1.3-2×. This operator
  * closes that gap while staying engine-replayable: training is
  * deterministic (exact integer pair counts, total-order tie-breaks), and
  * encoding applies merges in rank order as left-to-right greedy passes —
  * a form a SQL oracle replays exactly with nested scan-forward
  * `replace()` calls over separator-wrapped symbols.
  *
  * Scale shape (100 TB): the ONLY corpus-scale step is one map-side-
  * combinable word-count aggregate; everything after operates on the
  * word-frequency table capped to the top `maxVocabWords` words — a
  * BOUNDED object by construction (the [[TextAnalysis]] LangModel / stop-
  * term-cap discipline), so the merge rounds are driver-side loops over
  * ≤ V rows, not corpus passes. [[trainDistributed]] is the per-round
  * aggregate twin (each merge round = one pair-count aggregate + one
  * bounded argmax) kept for the parity differential and for vocabularies
  * that genuinely exceed driver memory; on a bounded vocab it computes the
  * identical table (tested) at ~2 jobs per merge of pure overhead.
  * Counting ([[tokenCount]]) is a codegen'd per-row expression over a
  * broadcast-referenced frozen table — scan-bound, no shuffle, no
  * per-word state beyond a bounded per-thread memo. */
object Bpe {

  /** Bounded word-frequency table: one exact aggregate over the corpus,
    * capped DETERMINISTICALLY to the `maxVocabWords` most frequent words
    * (ties broken by word ascending). Output: (word, freq). */
  def wordCounts(df: DataFrame, textCol: String,
      maxVocabWords: Int): DataFrame =
    df.select(explode(split(Dedup.normalizeText(col(textCol)), " "))
        .alias("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).alias("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocabWords)

  /** Learn `numMerges` merges from a word-frequency table (pure JVM — the
    * table is bounded, see the object doc). Each round: exact adjacent-
    * pair counts weighted by word frequency (every occurrence counts, so
    * "bbb" contributes (b,b) twice), argmax by (count desc, left asc,
    * right asc), stop below `minPairFreq`. Merges apply as one greedy
    * left-to-right pass per word. Returns merges in rank order. */
  def trainFromWordCounts(wordFreq: Seq[(String, Long)], numMerges: Int,
      minPairFreq: Long = 2L): Seq[(String, String)] =
    trainFromSymbolized(wordFreq.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, f) => (w.toCharArray.map(String.valueOf), f) }.toArray,
      numMerges, minPairFreq)

  /** The merge-learning core both modes share: exact weighted adjacent-pair
    * counts over PRE-SYMBOLIZED sequences (chars in char mode, hex byte
    * pairs in byte mode), argmax by (count desc, left asc, right asc). */
  def trainFromSymbolized(vocab0: Array[(Array[String], Long)],
      numMerges: Int, minPairFreq: Long): Seq[(String, String)] = {
    require(numMerges >= 0 && minPairFreq >= 1)
    var vocab: Array[(Array[String], Long)] = vocab0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          val c = counts.get(k)
          counts.put(k, if (c == null) f else c.longValue() + f)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestC = minPairFreq - 1
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.longValue()
        val k = e.getKey
        if (c > bestC || (c == bestC && best != null &&
            (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
          best = k; bestC = c
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val (a, b) = best
        val ab = a + b
        vocab = vocab.map { case (syms, f) =>
          var hit = -1
          var j = 0
          while (hit < 0 && j < syms.length - 1) {
            if (syms(j) == a && syms(j + 1) == b) hit = j else j += 1
          }
          if (hit < 0) (syms, f)
          else {
            val out = new Array[String](syms.length)
            var n = 0
            var k2 = 0
            while (k2 < syms.length) {
              if (n > 0 && out(n - 1) == a && syms(k2) == b) out(n - 1) = ab
              else { out(n) = syms(k2); n += 1 }
              k2 += 1
            }
            (java.util.Arrays.copyOf(out, n), f)
          }
        }
      }
    }
    merges.toSeq
  }

  /** End-to-end training: corpus word-count aggregate → bounded top-V
    * table → [[trainFromWordCounts]]. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 65536, minPairFreq: Long = 2L)
      : Seq[(String, String)] = {
    val wf = wordCounts(df, textCol, maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromWordCounts(wf, numMerges, minPairFreq)
  }

  /** The per-round-aggregate twin of [[train]]: each merge round is one
    * map-side-combinable pair-count aggregate over the (bounded) vocab
    * DataFrame plus a 1-row argmax, and the merge applies as a
    * higher-order-function fold — no driver-side vocabulary. Identical
    * output to [[train]] by construction (same counts, same total-order
    * tie-break, same greedy fold — pinned by the unit differential);
    * ~2 Spark jobs per merge, so [[train]] is the default whenever the
    * capped vocab fits the driver (it does — it is bounded). */
  def trainDistributed(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 65536, minPairFreq: Long = 2L)
      : Seq[(String, String)] = {
    require(numMerges >= 0 && minPairFreq >= 1)
    var vocab = Materializer(wordCounts(df, textCol, maxVocabWords)
      .select(split(col("word"), "").alias("syms"), col("freq")),
      eager = true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      // guard size >= 2 BEFORE sequence(): Spark's sequence(1, 0) counts
      // DOWN — a 1-symbol word would explode into phantom pairs
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i-1] AS a, syms[i] AS b))")).alias("p"))
        .groupBy(col("p.a").alias("a"), col("p.b").alias("b"))
        .agg(sum(col("freq")).alias("cnt"))
        .filter(col("cnt") >= minPairFreq)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val a = top(0).getString(0); val b = top(0).getString(1)
        merges += ((a, b))
        val fold = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, x) => when(size(acc) > 0 &&
              element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
        // materialize per round (eager iterative-frontier boundary —
        // Materializer seam, so `reliable` mode actually covers a lost
        // executor mid-train): keeps the plan one fold deep instead of
        // numMerges folds deep
        vocab = Materializer(vocab.withColumn("syms", fold), eager = true)
      }
    }
    merges.toSeq
  }

  // ------------------------------------------------------ byte-level mode
  // GPT-2-style byte-level BPE: RAW text (no normalization, no OOV path —
  // arbitrary Unicode round-trips exactly), pre-tokenized into alternating
  // space / non-space runs (their concatenation IS the text, which is what
  // makes decode(encode(x)) == x a structural identity), each run's UTF-8
  // bytes symbolized as lowercase hex pairs, then the SAME merge machinery.
  // Hex keeps every symbol printable and SQL-replayable: the oracle
  // symbolizes with lower(hex(encode(piece))) split into pairs and applies
  // the identical wrapped-replace chain.

  /** Bounded PIECE-frequency table for byte-mode training: pieces are the
    * alternating space / non-space runs of the RAW text (single spaces are
    * 1-symbol pieces and contribute no pairs). Same deterministic cap as
    * [[wordCounts]]. */
  def pieceCounts(df: DataFrame, textCol: String,
      maxVocabWords: Int): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol),
        lit(" +|[^ ]+"), lit(0))).alias("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).alias("freq"))
      .orderBy(col("freq").desc, col("piece").asc)
      .limit(maxVocabWords)

  /** Byte-mode merge learning from a piece-frequency table: hex-symbolize
    * each piece's UTF-8 bytes, then [[trainFromSymbolized]]. For pure-ASCII
    * corpora with single-space separators this learns exactly the char-mode
    * table with every symbol hex-mapped (one byte per char, space pieces
    * pairless) — the structural parity the unit spec pins. */
  def trainBytesFromPieceCounts(pieceFreq: Seq[(String, Long)],
      numMerges: Int, minPairFreq: Long = 2L): Seq[(String, String)] =
    trainFromSymbolized(
      pieceFreq.iterator.filter(_._1.nonEmpty)
        .map { case (p, f) => (BpeTable.byteSyms(p), f) }.toArray,
      numMerges, minPairFreq)

  /** End-to-end byte-mode training: corpus piece-count aggregate (the only
    * corpus-scale step, map-side combinable) → bounded top-V table →
    * driver-side merge loop. */
  def trainBytes(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 65536, minPairFreq: Long = 2L)
      : Seq[(String, String)] = {
    val pf = pieceCounts(df, textCol, maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainBytesFromPieceCounts(pf, numMerges, minPairFreq)
  }

  /** Frozen byte-mode encode table (optionally with pass-through special
    * tokens — matched longest-first as literals, never split or merged). */
  def byteTable(merges: Seq[(String, String)],
      specials: Seq[String] = Nil): BpeTable =
    new BpeTable(merges.toArray, byteLevel = true, specials.toArray)

  /** Byte-level token count of RAW text under a byte-mode table —
    * codegen'd, no normalization, specials count one token each. The
    * packing / mixture / curriculum seams take any tokens column, so this
    * drops in wherever [[tokenCount]] does. */
  def byteTokenCount(text: Column, t: BpeTable): Column =
    org.apache.spark.sql.GraftColumns.column(
      graft.functions.BpeCountBytes(org.apache.spark.sql.GraftColumns
        .expression(coalesce(text, lit(""))), t))
      .cast(LongType)

  /** The whole text's byte-mode token sequence in the `|tok||…|` wrapped
    * form — the oracle-comparable encoding (see [[graft.functions.BpeEncodeText]]). */
  def encodeTextWrapped(text: Column, t: BpeTable): Column =
    org.apache.spark.sql.GraftColumns.column(
      graft.functions.BpeEncodeText(org.apache.spark.sql.GraftColumns
        .expression(coalesce(text, lit(""))), t))

  /** Frozen encode table for a trained merge list. */
  def table(merges: Seq[(String, String)]): BpeTable =
    new BpeTable(merges.toArray)

  /** Tokenizer-true token count of a raw text column: normalize exactly
    * like training did, then sum the per-word subword counts under
    * `merges`. Codegen'd scalar — drop-in for
    * [[TextAnalysis.bpeTokenEstimate]] in [[Packing.packSequencesByTokens]]
    * / [[Splits.tokenBudgetMixture]] / [[Splits.curriculumShards]]. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    tokenCount(text, table(merges))

  /** [[tokenCount]] against a pre-built (shared) table. */
  def tokenCount(text: Column, t: BpeTable): Column =
    org.apache.spark.sql.GraftColumns.column(
      BpeCount(org.apache.spark.sql.GraftColumns.expression(
        coalesce(Dedup.normalizeText(text), lit(""))), t))
      .cast(LongType)

  /** One WORD's encoding as the `|tok||tok2|…|` wrapped string — the
    * exact intermediate the SQL oracle's replace chain produces. */
  def encodeWordCol(word: Column, t: BpeTable): Column =
    org.apache.spark.sql.GraftColumns.column(
      BpeEncodeWord(org.apache.spark.sql.GraftColumns.expression(word), t))

  /** Subword-vocabulary usage report under a trained table: one row per
    * final token with its total corpus occurrence count and the number
    * of distinct words it appears in — the "what did the tokenizer
    * actually learn / what carries the mass" artifact of a tokenizer
    * rollout. Scale shape: word explode + word-count aggregate (the
    * corpus-scale part, map-side combinable), then encode + token
    * algebra over DISTINCT words only — vocabulary-sized, not
    * corpus-sized. */
  def vocabularyReport(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val t = table(merges)
    val words = df.select(explode(split(
        coalesce(Dedup.normalizeText(col(textCol)), lit("")), " "))
        .alias("word"))
      .filter(length(col("word")) > 0)
    val wc = words.groupBy(col("word")).agg(count(lit(1)).alias("__n"))
    wc.select(col("word"), col("__n"),
        explode(split(trim(encodeWordCol(col("word"), t), "|"), "\\|\\|"))
          .alias("token"))
      .groupBy(col("token"))
      .agg(sum(col("__n")).alias("n_occurrences"),
        countDistinct(col("word")).alias("n_words"))
  }
}
