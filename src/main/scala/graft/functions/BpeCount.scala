package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Frozen greedy-BPE merge table + encoder (see [[graft.pipeline.Bpe]] for
  * training). `merges` is the trained table IN RANK ORDER; encoding applies
  * each merge as one left-to-right pass over the word's symbol sequence —
  * for well-formed tables (every merge's parts are chars or products of
  * earlier merges, which training guarantees) this equals the classic
  * lowest-rank-first loop, and it is exactly replayable as nested
  * scan-forward string `replace` calls in any SQL dialect (the DuckDB
  * oracle's form), because a non-overlapping left-to-right replace over
  * `|a||b|`-wrapped symbols IS the greedy fold.
  *
  * Token counting is per WORD (whitespace-separated, pre-normalized input)
  * with a per-thread memo — Zipf makes the distinct-word set tiny relative
  * to the corpus, so the steady-state cost per row is a hash lookup per
  * word, not an encode. The memo is bounded (cleared past [[MemoCap]]
  * entries) so a pathological vocabulary cannot grow executor memory. */
final class BpeTable(val merges: Array[(String, String)],
    val byteLevel: Boolean = false,
    val specials: Array[String] = Array.empty)
    extends Serializable {
  require(specials.forall(_.nonEmpty), "empty special token")
  private val as = merges.map(_._1)
  private val bs = merges.map(_._2)
  private val ms = merges.map(p => p._1 + p._2)
  // longest-first so overlapping specials resolve by longest match
  private val specialsByLen = specials.sortBy(s => (-s.length, s))

  @transient private lazy val memo: ThreadLocal[java.util.HashMap[String, java.lang.Long]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, java.lang.Long]())
  // byte-mode piece memo holds the token ARRAY (read-only once stored) so
  // count and wrapped-encode share one encode per distinct piece
  @transient private lazy val pieceMemo: ThreadLocal[java.util.HashMap[String, Array[String]]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[String]]())

  /** Run every merge, in rank order, as one greedy left-to-right pass over
    * an already-symbolized sequence (chars in char mode, lowercase hex byte
    * pairs in byte mode) — the machinery both modes share. */
  def applyMerges(syms0: Array[String]): Array[String] = {
    var syms = syms0
    var r = 0
    while (r < as.length) {
      val a = as(r); val b = bs(r)
      // cheap presence scan before allocating the merged sequence
      var hit = -1
      var j = 0
      while (hit < 0 && j < syms.length - 1) {
        if (syms(j) == a && syms(j + 1) == b) hit = j else j += 1
      }
      if (hit >= 0) {
        val out = new Array[String](syms.length)
        var n = 0
        var k2 = 0
        while (k2 < syms.length) {
          if (n > 0 && out(n - 1) == a && syms(k2) == b) out(n - 1) = ms(r)
          else { out(n) = syms(k2); n += 1 }
          k2 += 1
        }
        syms = java.util.Arrays.copyOf(out, n)
      }
      r += 1
    }
    syms
  }

  /** Encode one word; returns its symbols after all merges (char mode). */
  def encodeWord(word: String): Array[String] = {
    val syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    applyMerges(syms)
  }

  /** One piece's UTF-8 bytes as lowercase two-hex-char initial symbols —
    * the byte-mode symbolization (`héllo` → 68 c3 a9 6c 6c 6f). Hex keeps
    * symbols printable, separator-safe (`|` never occurs), and exactly
    * replayable in SQL as `lower(hex(encode(piece)))` split into pairs. */
  def byteSyms(piece: String): Array[String] = BpeTable.byteSyms(piece)

  /** Byte-mode encode of one piece (a space run or a non-space run),
    * memoized per thread; the returned array is shared read-only. */
  def encodePieceBytes(piece: String): Array[String] = {
    val m = pieceMemo.get()
    val cached = m.get(piece)
    if (cached != null) return cached
    val toks = applyMerges(byteSyms(piece))
    if (m.size >= BpeTable.MemoCap) m.clear()
    m.put(piece, toks)
    toks
  }

  /** Byte-mode full-text tokenization: special tokens pass through whole
    * (longest literal match, never split or merged), and the remainder
    * partitions into alternating space / non-space runs whose UTF-8 bytes
    * encode under the merge table. The piece concatenation IS the text, so
    * `decodeText(encodeText(x)) == x` for any valid Unicode string — the
    * no-OOV property char-level BPE lacks. */
  def encodeText(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var runStart = 0
    def flushRun(until: Int): Unit = {
      var j = runStart
      while (j < until) { // alternating ' ' / non-' ' runs
        val sp = text.charAt(j) == ' '
        var e = j + 1
        while (e < until && (text.charAt(e) == ' ') == sp) e += 1
        out ++= encodePieceBytes(text.substring(j, e))
        j = e
      }
    }
    while (i < text.length) {
      var hit: String = null
      var k = 0
      while (hit == null && k < specialsByLen.length) {
        if (text.startsWith(specialsByLen(k), i)) hit = specialsByLen(k)
        k += 1
      }
      if (hit != null) {
        flushRun(i)
        out += hit
        i += hit.length
        runStart = i
      } else i += 1
    }
    flushRun(text.length)
    out.toArray
  }

  /** Inverse of [[encodeText]]: hex tokens concatenate at the BYTE level
    * before UTF-8 decoding (a merge table need not keep a multi-byte
    * character's bytes inside one token), specials pass through verbatim. */
  def decodeText(tokens: Seq[String]): String = {
    val sb = new java.lang.StringBuilder
    val buf = new java.io.ByteArrayOutputStream
    def flush(): Unit = if (buf.size > 0) {
      sb.append(new String(buf.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
      buf.reset()
    }
    tokens.foreach { t =>
      if (specials.contains(t)) { flush(); sb.append(t) }
      else {
        var i = 0
        while (i < t.length) {
          buf.write(java.lang.Integer.parseInt(t.substring(i, i + 2), 16))
          i += 2
        }
      }
    }
    flush()
    sb.toString
  }

  /** Byte-mode token count of a raw text (specials included as one token
    * each). */
  def countTokensBytes(text: UTF8String): Long = {
    val s = text.toString
    if (specials.isEmpty) {
      // avoid the ArrayBuffer: walk runs and sum memoized piece lengths
      var total = 0L
      var j = 0
      while (j < s.length) {
        val sp = s.charAt(j) == ' '
        var e = j + 1
        while (e < s.length && (s.charAt(e) == ' ') == sp) e += 1
        total += encodePieceBytes(s.substring(j, e)).length
        j = e
      }
      total
    } else encodeText(s).length.toLong
  }

  /** The whole text's byte-mode encoding in the `|tok||tok2|…|` wrapped
    * form (piece forms concatenate to exactly the joint form). Requires no
    * specials — a special literal could contain the separator. */
  def encodeTextWrapped(text: UTF8String): UTF8String = {
    require(specials.isEmpty, "wrapped form is for oracle tables (no specials)")
    val s = text.toString
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < s.length) {
      val sp = s.charAt(j) == ' '
      var e = j + 1
      while (e < s.length && (s.charAt(e) == ' ') == sp) e += 1
      val toks = encodePieceBytes(s.substring(j, e))
      var k = 0
      while (k < toks.length) {
        sb.append('|').append(toks(k)).append('|'); k += 1
      }
      j = e
    }
    UTF8String.fromString(sb.toString)
  }

  /** Token count of one word, memoized per thread. */
  def wordTokens(word: String): Long = {
    val m = memo.get()
    val cached = m.get(word)
    if (cached != null) return cached.longValue()
    val n = encodeWord(word).length.toLong
    if (m.size >= BpeTable.MemoCap) m.clear()
    m.put(word, n)
    n
  }

  /** One word's encoding in the separator-wrapped string form
    * `|tok||tok2||…|` — EXACTLY the intermediate the SQL oracle's nested
    * `replace` chain produces, so token lists can be compared engine-to-
    * engine as plain strings. No memo: callers feed pre-deduplicated
    * words (the vocabulary path). */
  def encodeWrapped(word: String): String =
    encodeWord(word).mkString("|", "||", "|")

  /** BPE token count of a whitespace-separated, pre-normalized text:
    * the sum of its words' subword counts. Codegen entry point. */
  def countTokens(text: UTF8String): Long = {
    val s = text.toString
    var total = 0L
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) total += wordTokens(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }
}

object BpeTable {
  /** Per-thread memo bound: past this many distinct words the memo resets
    * (a full LRU is not worth the bookkeeping at this hit rate). */
  val MemoCap = 1 << 20

  /** Interned lowercase hex symbols for all 256 byte values — the byte-mode
    * initial alphabet. */
  val HexSyms: Array[String] = Array.tabulate(256)(b => f"$b%02x")

  /** One piece's UTF-8 bytes as lowercase two-hex-char initial symbols. */
  def byteSyms(piece: String): Array[String] = {
    val bytes = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val syms = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) { syms(i) = HexSyms(bytes(i) & 0xff); i += 1 }
    syms
  }
}

/** Codegen'd BPE subword token count over a normalized text column — the
  * tokenizer-true replacement for the char-heuristic
  * [[graft.pipeline.TextAnalysis.bpeTokenEstimate]] wherever a trained
  * merges table is available (packing, token budgets, curricula). Stays
  * inside whole-stage codegen: one static-shaped call per row against a
  * referenced frozen [[BpeTable]]. */
case class BpeCount(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    table.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

/** Codegen'd single-WORD BPE encoding to the separator-wrapped string
  * form (see [[BpeTable.encodeWrapped]]) — the vocabulary-report
  * primitive. */
case class BpeEncodeWord(child: Expression, table: BpeTable)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_bpe_encode_word"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      table.encodeWrapped(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$ref.encodeWrapped($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWord =
    copy(child = newChild)
}

/** Codegen'd BYTE-level BPE token count over RAW text (no normalization,
  * no OOV — every byte is representable): pieces are alternating space /
  * non-space runs, special tokens pass through whole. */
case class BpeCountBytes(child: Expression, table: BpeTable)
    extends UnaryExpression {
  require(table.byteLevel, "byte-mode count needs a byte-level table")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count_bytes"

  override protected def nullSafeEval(input: Any): Any =
    table.countTokensBytes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokensBytes($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountBytes =
    copy(child = newChild)
}

/** Codegen'd byte-level whole-text encode to the `|tok||tok2|…|` wrapped
  * string — the oracle-comparable token sequence (piece forms concatenate
  * to exactly the joint form, so the SQL replay's ordered per-piece
  * string_agg reproduces it verbatim). */
case class BpeEncodeText(child: Expression, table: BpeTable)
    extends UnaryExpression {
  require(table.byteLevel, "wrapped byte encode needs a byte-level table")
  require(table.specials.isEmpty,
    "wrapped byte encode is separator-based; specials could contain '|'")

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_bpe_encode_text"

  override protected def nullSafeEval(input: Any): Any =
    table.encodeTextWrapped(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeTextWrapped($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeText =
    copy(child = newChild)
}
