package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication at corpus scale: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard and embedding-cosine near-dup.
  *
  * All operators are pure Column algebra (codegen'd, no UDFs):
  * shingling/minhashing use higher-order functions (`transform`,
  * `array_min`, `aggregate`) over `split` tokens; candidate generation is an
  * equi-join on LSH band hashes — the only shuffles are the band-bucket join
  * and the final aggregation, both keyed well for 1000-executor scale (band
  * hash keys are uniformly distributed by construction).
  */
object Dedup {

  /** Exact dedup: canonical row per duplicate group = the one with the lowest
    * `idCol`. Hash-groupBy on the full key — one shuffle, map-side combine. */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact text dedup on a normalized fingerprint (lowercase, strip non
    * [a-z0-9 ], collapse whitespace) — catches trivially-reformatted copies. */
  def exactNormalized(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = md5(normalizeText(col(textCol)))
    exact(df.withColumn("__fp", fp), Seq("__fp"), idCol).drop("__fp")
  }

  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Word w-shingles as strings, via HOFs (no UDF): `transform(sequence(...),
    * i -> concat_ws(' ', slice(tokens, i, w)))`. */
  def shingles(textCol: Column, w: Int): Column = {
    val tokens = split(normalizeText(textCol), " ")
    array_distinct(
      when(size(tokens) >= w,
        transform(sequence(lit(1), size(tokens) - (w - 1)),
          i => concat_ws(" ", slice(tokens, i, lit(w)))))
        .otherwise(array(concat_ws(" ", tokens))))
  }

  /** k-permutation MinHash signature: sig[s] = min over shingles of
    * xxhash64(shingle, s). One pass, fully codegen'd. */
  def minhashSignature(shinglesCol: Column, k: Int): Column =
    array((0 until k).map(s =>
      array_min(transform(shinglesCol, x => xxhash64(x, lit(s))))): _*)

  /** MinHash-LSH candidate pairs: signatures banded into `bands` groups of
    * `rowsPerBand`; docs sharing any band hash become a candidate pair.
    * Returns (idCol_a, idCol_b) with a < b, deduplicated across bands.
    *
    * Scale path: the self-join is an equi-join on (band index, band hash) —
    * uniform 64-bit keys, no skew; never a cross join.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
      shingleWidth: Int = 3, bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val sig = minhashSignature(shingles(col(textCol), shingleWidth), k)
    val banded = df
      .select(col(idCol), sig.alias("__sig"))
      .select(col(idCol), explode(
        array((0 until bands).map(b =>
          struct(lit(b).alias("band"),
            xxhash64(concat_ws(",",
              (0 until rowsPerBand).map(r => col("__sig").getItem(b * rowsPerBand + r)): _*))
              .alias("bhash"))): _*)).alias("__band"))
      .select(col(idCol), col("__band.band"), col("__band.bhash"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").alias(s"${idCol}_a"), col(s"b.$idCol").alias(s"${idCol}_b"))
      .distinct()
  }

  /** 64-bit SimHash fingerprint per document: sign-sum of per-token xxhash64
    * bits. Explode + single groupBy (map-side combinable). */
  def simhash(df: DataFrame, textCol: String, idCol: String,
      outCol: String = "simhash"): DataFrame = {
    val tokens = split(normalizeText(col(textCol)), " ")
    val exploded = df
      .select(col(idCol), explode(tokens).alias("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("__h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .alias(s"__b$j")
    }
    val packed = (0 until 64).map { j =>
      when(col(s"__b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce[Column](_ + _)
    exploded
      .groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), packed.alias(outCol))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** n-gram Jaccard similarity for candidate pairs — exact verify stage after
    * LSH candidate generation. |A∩B| / (|A|+|B|-|A∩B|) on distinct shingle
    * sets. */
  def jaccard(shA: Column, shB: Column): Column = {
    val inter = size(array_intersect(shA, shB)).cast(DoubleType)
    inter / (size(shA) + size(shB) - inter)
  }

  /** LSH candidates verified with exact Jaccard ≥ threshold. */
  def nearDuplicates(df: DataFrame, textCol: String, idCol: String,
      shingleWidth: Int = 3, bands: Int = 4, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val cands = minhashCandidates(df, textCol, idCol, shingleWidth, bands, rowsPerBand)
    val sh = df.select(col(idCol),
      shingles(col(textCol), shingleWidth).alias("__sh"))
    cands
      .join(sh.withColumnRenamed(idCol, s"${idCol}_a").withColumnRenamed("__sh", "__sha"),
        s"${idCol}_a")
      .join(sh.withColumnRenamed(idCol, s"${idCol}_b").withColumnRenamed("__sh", "__shb"),
        s"${idCol}_b")
      .withColumn("jaccard", jaccard(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"), col("jaccard"))
  }
}
