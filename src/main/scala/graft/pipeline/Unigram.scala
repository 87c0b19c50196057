package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{UnigramCount, UnigramEncodeText, UnigramTable}

/** Unigram-LM tokenizer training — the deterministic count-derived
  * variant of Kudo 2018's vocabulary (see [[graft.functions.UnigramTable]]
  * for the decode semantics): candidate pieces are every substring of the
  * bounded word-frequency table up to `maxPieceLen` chars, counted with
  * word-frequency weights; the vocabulary keeps EVERY single character
  * (total coverage over the corpus alphabet) plus the most frequent
  * multi-char pieces; scores are exact micro-unit log-probs over the
  * selected vocabulary's own count mass.
  *
  * Scale shape (the [[Bpe]] discipline): the ONLY corpus-scale step is
  * the one map-side-combinable word-count aggregate; candidate counting
  * and selection run driver-side over the capped table (≤ maxVocabWords
  * words × ≤ maxPieceLen offsets — bounded by construction). The trained
  * table is broadcast-sized and its scores are integers, so the oracle
  * embeds them verbatim. */
object Unigram {

  /** Train a unigram table. Ties in multi-piece selection break by
    * (count desc, piece asc) — a total order, so training is a pure
    * function of the corpus. `unkScoreQ` sits 10 nats (10⁷ micro-units)
    * below the worst vocab score: unknown chars always lose to any
    * in-vocab segmentation but keep encode total. */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 240,
      maxPieceLen: Int = 4, maxVocabWords: Int = 10000): UnigramTable = {
    require(vocabSize >= 1 && maxPieceLen >= 1)
    val wf = Bpe.wordCounts(df, textCol, maxVocabWords).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val cnt = new java.util.HashMap[String, java.lang.Long]()
    wf.foreach { case (w, f) =>
      var l = 1
      while (l <= math.min(maxPieceLen, w.length)) {
        var i = 0
        while (i + l <= w.length) {
          val p = w.substring(i, i + l)
          val c = cnt.get(p)
          cnt.put(p, if (c == null) f else c.longValue() + f)
          i += 1
        }
        l += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val all = cnt.asScala.toSeq.map { case (p, c) => (p, c.longValue()) }
    val chars = all.filter(_._1.length == 1).sortBy(_._1)
    val multi = all.filter(_._1.length >= 2)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - chars.size))
    val vocab = (chars ++ multi).sortBy(_._1) // canonical order for embedding
    val tot = vocab.iterator.map(_._2).sum
    val scored = vocab.map { case (p, c) =>
      (p, math.floor(math.log(c.toDouble / tot.toDouble) * 1e6 + 0.5).toLong)
    }
    val unk =
      (if (scored.isEmpty) 0L else scored.iterator.map(_._2).min) - 10000000L
    new UnigramTable(scored.toArray, maxPieceLen, unk)
  }

  /** One deterministic HARD-EM refinement iteration — the re-estimation
    * pass real SentencePiece runs, frozen to the engine-replayable core:
    * E-step segments every word of the bounded word-frequency table with
    * `t`'s own Viterbi (the exact decode the encoder runs, total-order
    * tiebreaks and all) and accumulates INTEGER piece counts weighted by
    * word frequency; M-step keeps the SAME vocabulary (probabilities are
    * re-estimated, coverage and the decode∘encode identity survive
    * untouched) and re-scores add-one over the used mass:
    * score(p) = floor(ln((c(p)+1)/(Σc+V))·10⁶+0.5), unk 10 nats below
    * the minimum (the [[train]] convention). Pieces the corpus's own
    * best segmentation never uses collapse toward the floor while used —
    * especially longer — pieces gain mass, so the refined table
    * segments with measurably LOWER fertility (pinned in the spec).
    *
    * Scale shape identical to [[train]]: one map-side-combinable
    * word-count aggregate is the only corpus-scale step; the E-step runs
    * driver-side over the capped word table (≤ maxVocabWords Viterbi
    * decodes of ≤ a few dozen chars — bounded by construction).
    * Determinism: counts are exact integers, the E-step segmentation is
    * the deterministic Viterbi, and the M-step is a pure function of the
    * integer counts — the refined table is a pure function of
    * (corpus, t) and embeds verbatim in the oracle. */
  def emRefine(df: DataFrame, textCol: String, t: UnigramTable,
      maxVocabWords: Int = 10000): UnigramTable = {
    val wf = Bpe.wordCounts(df, textCol, maxVocabWords).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val cnt = new java.util.HashMap[String, java.lang.Long]()
    wf.foreach { case (w, f) =>
      t.encodeWord(w).foreach { p =>
        val c = cnt.get(p)
        cnt.put(p, if (c == null) f else c.longValue() + f)
      }
    }
    val tot = {
      var s = 0L
      val it = cnt.values().iterator()
      while (it.hasNext) s += it.next().longValue()
      s
    }
    val v = t.pieces.length
    val scored = t.pieces.map { case (p, _) =>
      val c = Option(cnt.get(p)).map(_.longValue()).getOrElse(0L)
      (p, math.floor(math.log((c + 1).toDouble / (tot + v).toDouble) * 1e6
        + 0.5).toLong)
    }
    val unk =
      (if (scored.isEmpty) 0L else scored.iterator.map(_._2).min) - 10000000L
    new UnigramTable(scored, t.maxPieceLen, unk, t.chunkLen)
  }

  /** Tokenizer-true token count column under a trained table. */
  def tokenCount(text: Column, table: UnigramTable): Column =
    org.apache.spark.sql.GraftColumns.column(
      UnigramCount(org.apache.spark.sql.GraftColumns.expression(
        coalesce(Dedup.normalizeText(text), lit(""))), table))

  /** Whole-text wrapped token sequence (`|tok||tok2|…|`) under a
    * trained table — the token-identity column the oracle hashes. */
  def tokensWrapped(text: Column, table: UnigramTable): Column =
    org.apache.spark.sql.GraftColumns.column(
      UnigramEncodeText(org.apache.spark.sql.GraftColumns.expression(
        coalesce(Dedup.normalizeText(text), lit(""))), table))
}
