package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-agnostic deterministic hashing.
  *
  * Everything that feeds a correctness oracle must be replayable bit-for-bit
  * in DuckDB, which cannot evaluate Spark's xxhash64. This module provides a
  * 30-bit polynomial string hash (base 131, mod 1e9+7) plus an affine
  * per-seed mixer family h ↦ (a_s·h + b_s) mod P. All arithmetic stays below
  * 2^61, so 64-bit integer math is exact and non-overflowing in Spark, in
  * DuckDB (whose BIGINT errors on overflow rather than wrapping), and in
  * plain JVM Longs.
  *
  * Each primitive exists in three congruent forms — a Catalyst `Column`, a
  * DuckDB SQL fragment generated from the same constants, and a JVM scalar —
  * so MinHash/SimHash/LSH pipelines hash identically on both sides of the
  * correctness gate.
  */
object Hashing {
  /** modulus: 30-bit prime */
  val P = 1000000007L

  /** character base of the polynomial hash */
  val B = 131L

  /** base used when folding several mod-P values into one (LSH banding) */
  val FoldBase = 1000003L

  /** affine mixer coefficients for seed `s` (multiplier kept nonzero) */
  def aCoef(s: Int): Long = {
    val a = (s.toLong * 2654435761L + 1L) % P
    if (a == 0L) 1L else a
  }
  def bCoef(s: Int): Long = (s.toLong * 40503L + 7L) % P

  // -------------------------------------------------- Catalyst Column forms
  /** Polynomial hash of a string column — the native codegen'd
    * [[graft.functions.PolyHash]] expression (one static-call fold over the
    * string, vs the interpreted per-char HOF lambda it replaced: that
    * `aggregate(split(c, ""), …)` form was the hot spot of every hashing
    * pipeline). Empty string hashes to 0 in both forms and both engines. */
  def polyHash(c: Column): Column =
    org.apache.spark.sql.GraftColumns.column(
      graft.functions.PolyHash(org.apache.spark.sql.GraftColumns.expression(c)))

  /** Per-seed affine remix of a mod-P hash. */
  def mix(h: Column, s: Int): Column = pmod(h * aCoef(s) + bCoef(s), lit(P))

  /** Pack two mod-P values into one 61-bit long (hi occupies bits 31..60). */
  def combine(hi: Column, lo: Column): Column = hi * lit(1L << 31) + lo

  /** Fold an ordered sequence of mod-P values into one (band hashing). */
  def foldHashes(hs: Seq[Column]): Column =
    hs.reduceLeft((acc, h) => pmod(acc * FoldBase + h, lit(P)))

  // ------------------------------------------ DuckDB SQL fragment twins
  def polyHashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(coalesce(ascii(c), 0) AS BIGINT))), " +
      s"(acc, c) -> (acc * $B + c) % $P)"

  def mixSql(h: String, s: Int): String = s"((($h) * ${aCoef(s)} + ${bCoef(s)}) % $P)"

  def combineSql(hi: String, lo: String): String = s"(($hi) * ${1L << 31} + ($lo))"

  def foldHashesSql(hs: Seq[String]): String =
    hs.reduceLeft((acc, h) => s"((($acc) * $FoldBase + $h) % $P)")

  // ------------------------------------------------------ JVM scalar twins
  /** Byte-level twin of [[polyHash]]: equal to the Column form whenever the
    * bytes are ASCII (each byte == its codepoint). */
  def polyHashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * B + (bytes(i) & 0xffL)) % P; i += 1 }
    h
  }

  def mixLong(h: Long, s: Int): Long = (h * aCoef(s) + bCoef(s)) % P
}
