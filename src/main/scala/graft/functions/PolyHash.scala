package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.Hashing

/** Native Catalyst form of the engine-agnostic polynomial string hash
  * (h = fold over codepoints of (h·B + cp) mod P — see [[Hashing]]).
  *
  * The Column-algebra form (`aggregate(split(c, ""), …)`) runs as an
  * interpreted higher-order lambda per character — the measured hot spot of
  * every MinHash/SimHash/fingerprint pipeline. This expression evaluates the
  * same fold as one codegen'd static call (a tight JVM loop over the string),
  * keeping the surrounding operators inside whole-stage codegen.
  *
  * Value parity with the HOF form holds for all BMP strings (split("") is
  * per UTF-16 code unit; every call site hashes normalized ASCII) and is
  * locked in by PipelineUnitSpec plus the full DuckDB oracle suite, whose
  * SQL twin replays the same fold.
  */
case class PolyHash(child: Expression, mod: Long = Hashing.P)
    extends UnaryExpression {

  // internal expression: every call site feeds a StringType column
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Static target for generated code (scalac emits a forwarder on the
    * class, so Janino sees a plain static method). The modulus is a
    * parameter so the wide (CRT-pair) hash family can reuse the same fold
    * with a second prime — see [[Hashing.P2]]. */
  def hash(s: UTF8String, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * Hashing.B + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  def hash(s: UTF8String): Long = hash(s, Hashing.P)
}
