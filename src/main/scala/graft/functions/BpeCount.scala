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
final class BpeTable(val merges: Array[(String, String)])
    extends Serializable {
  private val as = merges.map(_._1)
  private val bs = merges.map(_._2)
  private val ms = merges.map(p => p._1 + p._2)

  @transient private lazy val memo: ThreadLocal[java.util.HashMap[String, java.lang.Long]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, java.lang.Long]())

  /** Encode one word; returns its symbols after all merges. */
  def encodeWord(word: String): Array[String] = {
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
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
