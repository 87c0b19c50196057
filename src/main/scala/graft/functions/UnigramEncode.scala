package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Frozen unigram-LM (SentencePiece-family) tokenizer: a trained piece
  * vocabulary with integer-quantized log-prob scores, segmented by
  * Viterbi under a TOTAL ORDER — maximize summed score, then fewer
  * tokens, then longer last piece — so the segmentation is a pure
  * function of (word, table) and replays exactly in SQL (the DP is the
  * LCS/DTW fixed-length fold shape; see the q_unigram_tokens oracle).
  * Kudo 2018 ("Subword Regularization", ACL) is the public unigram-LM
  * algorithm; this deterministic variant freezes its Viterbi decode
  * over a count-derived vocabulary (no EM, no sampling — the
  * engine-replayable core).
  *
  * Determinism details:
  *  - scores are exact BIGINT micro-units (floor(ln(cnt/tot)·10⁶+0.5)),
  *    trained once and EMBEDDED in the oracle — no cross-engine floats;
  *  - the tiebreak composite `s·4096 − t·64 + l` is monotone in the
  *    (score desc, tokens asc, last-len desc) order because
  *    t ≤ chunkLen < 64 and l ≤ maxPieceLen < 64 stay inside their bit
  *    slots (both bounds enforced by the constructor `require`s:
  *    63·64 < 4096);
  *  - words longer than `chunkLen` split into fixed chunks, each
  *    Viterbi'd independently (the LCS fixed-length-fold discipline —
  *    the SQL replay's folds never vary in length across a batch);
  *  - unknown single characters tokenize as themselves at `unkScoreQ`
  *    (below every vocab score), so encode is total and
  *    decode(encode(w)) == w by construction — tokens are substrings
  *    partitioning the word.
  *
  * Scale shape: the table is broadcast-sized (≤ vocabSize pieces);
  * encoding is a per-row codegen'd expression with a bounded per-thread
  * word memo (the [[BpeTable]] convention) — scan-bound, no shuffle. */
final class UnigramTable(val pieces: Array[(String, Long)],
    val maxPieceLen: Int, val unkScoreQ: Long, val chunkLen: Int = 24)
    extends Serializable {
  require(maxPieceLen >= 1 && maxPieceLen < 64, "maxPieceLen in 1..63")
  require(chunkLen >= maxPieceLen && chunkLen < 64,
    "chunkLen in maxPieceLen..63 (the 4096/64 composite bit slots)")

  @transient private lazy val scoreMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }

  @transient private lazy val memo: ThreadLocal[java.util.HashMap[String, Array[String]]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[String]]())

  /** Viterbi over one chunk (length ≤ chunkLen). First-maximum wins
    * under the composite — identical to the SQL replay's
    * list_position-of-max selection. */
  private def encodeChunk(w: String): Array[String] = {
    val n = w.length
    val dpS = new Array[Long](n + 1)
    val dpT = new Array[Long](n + 1)
    val dpL = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var bestComp = Long.MinValue
      var bS = 0L; var bT = 0L; var bL = 0
      var l = 1
      val lmax = math.min(maxPieceLen, j)
      while (l <= lmax) {
        val sc0 = scoreMap.get(w.substring(j - l, j))
        val sc: java.lang.Long =
          if (sc0 != null) sc0
          else if (l == 1) java.lang.Long.valueOf(unkScoreQ) else null
        if (sc != null) {
          val s = dpS(j - l) + sc.longValue()
          val t = dpT(j - l) + 1
          val comp = s * 4096 - t * 64 + l
          if (comp > bestComp) { bestComp = comp; bS = s; bT = t; bL = l }
        }
        l += 1
      }
      dpS(j) = bS; dpT(j) = bT; dpL(j) = bL
      j += 1
    }
    val toks = new Array[String](dpT(n).toInt)
    var k = toks.length - 1
    var p = n
    while (p > 0) { toks(k) = w.substring(p - dpL(p), p); p -= dpL(p); k -= 1 }
    toks
  }

  /** Encode one word (memoized per thread): fixed chunks, each
    * Viterbi'd. */
  def encodeWord(word: String): Array[String] = {
    val m = memo.get()
    val cached = m.get(word)
    if (cached != null) return cached
    val toks =
      if (word.length <= chunkLen) encodeChunk(word)
      else (0 until word.length by chunkLen).toArray.flatMap(i =>
        encodeChunk(word.substring(i, math.min(i + chunkLen, word.length))))
    if (m.size >= BpeTable.MemoCap) m.clear()
    m.put(word, toks)
    toks
  }

  /** Inverse: tokens partition each word, so concatenation restores it. */
  def decodeWord(tokens: Seq[String]): String = tokens.mkString

  /** Token count of a whitespace-separated, pre-normalized text. */
  def countTokens(text: UTF8String): Long = {
    val s = text.toString
    var total = 0L
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) total += encodeWord(s.substring(start, i)).length.toLong
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Whole-text encode to the `|tok||tok2|…|` wrapped string (word
    * tokens concatenate in word order — the engine-to-engine comparable
    * form, the [[BpeTable.encodeTextWrapped]] convention). */
  def encodeTextWrapped(text: UTF8String): UTF8String = {
    val s = text.toString
    val sb = new java.lang.StringBuilder
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) {
          val toks = encodeWord(s.substring(start, i))
          var k = 0
          while (k < toks.length) {
            sb.append('|').append(toks(k)).append('|'); k += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd unigram-LM token count over a normalized text column. */
case class UnigramCount(child: Expression, table: UnigramTable)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_unigram_count"

  override protected def nullSafeEval(input: Any): Any =
    table.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramCount =
    copy(child = newChild)
}

/** Codegen'd whole-text unigram encode to the wrapped `|tok||tok2|…|`
  * string — the token-identity form the oracle hashes. */
case class UnigramEncodeText(child: Expression, table: UnigramTable)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_unigram_encode_text"

  override protected def nullSafeEval(input: Any): Any =
    table.encodeTextWrapped(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeTextWrapped($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeText =
    copy(child = newChild)
}
