package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

import graft.SparkTestBase

/** Differential locks for the native text kernels (r18 optimization):
  * [[graft.functions.CollapseNonAlnum]], [[graft.functions.WordNGrams]]
  * and [[graft.functions.WinnowGrams]] must be bit-identical to the
  * Column-algebra forms they replaced — the regex normalize, the
  * split+transform n-gram assembly, and the interpreted closed-form
  * winnow selection (reconstructed here verbatim from the pre-r18
  * implementations). */
class TextKernelsSpec extends SparkTestBase {
  import spark.implicits._

  // adversarial corpus: empties, whitespace runs, non-alnum, non-ASCII
  // (including a codepoint that lowercases into ASCII range), long
  // repetitive text (hash-tie heavy), and short docs below one window
  private val texts = Seq(
    "",
    " ",
    "   ",
    "a",
    "ab",
    "Hello, World!",
    "The   quick  brown FOX --- jumps!! over 42 lazy dogs 42 42",
    "aaaa aaaa aaaa aaaa aaaa aaaa",
    "abab ababab abababab ababab abab",
    "ÉCLAIR über straße ĲSSELMEER KK kelvin", // K = U+212A
    "tab\tseparated\nnewline\r\nmixed",
    "1234567890 0987654321",
    "a b c d e f g h i j k l m n o p",
    "xyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxy",
    "the the the the the the the the",
    "mixed CASE With Numb3rs and $ymb0ls %%% ___",
    ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 8),
    "ends with spaces   ",
    "   starts with spaces",
    "日本語テキスト with ascii islands 123"
  )

  private def df: DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  private val oldNormalize: Column => Column = c =>
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  test("CollapseNonAlnum matches the regex normalize bit-for-bit") {
    val got = df.select(col("id"), Dedup.normalizeText(col("text")).alias("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = df.select(col("id"), oldNormalize(col("text")).alias("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
  }

  test("WordNGrams matches split+transform n-gram assembly for n=2 and n=3") {
    for (n <- Seq(2, 3)) {
      val toks = split(oldNormalize(col("text")), " ")
      val oldGrams = df
        .select(col("id"), toks.alias("__toks"))
        .filter(size(col("__toks")) >= n)
        .select(col("id"),
          explode(transform(sequence(lit(1), size(col("__toks")) - (n - 1)),
            i => struct((0 until n).map(o =>
              element_at(col("__toks"), i + o).alias(s"w${o + 1}")): _*)))
            .alias("__t"))
        .filter((1 to n).map(j => col(s"__t.w$j") =!= "").reduce(_ && _))
        .select(col("id") +: (1 to n).map(j => col(s"__t.w$j")): _*)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
      val newGrams = df
        .select(col("id"),
          explode(org.apache.spark.sql.GraftColumns.column(
            graft.functions.WordNGrams(
              org.apache.spark.sql.GraftColumns.expression(
                Dedup.normalizeText(col("text"))), n))).alias("__t"))
        .select(col("id") +: (1 to n).map(j => col(s"__t.w$j")): _*)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
      // multiset equality, not set: repeated grams within a document carry
      // LM counts, so a kernel bug that duplicated or dropped a repeated
      // gram must fail here
      assert(newGrams == oldGrams, s"n=$n")
    }
  }

  test("WordShingles matches the HOF shingle assembly for w=1,2,3,5") {
    for (w <- Seq(1, 2, 3, 5)) {
      val tokens = split(oldNormalize(col("text")), " ")
      val oldSh =
        if (w == 1) array_distinct(tokens)
        else
          array_distinct(flatten(transform(array(tokens), ts =>
            when(size(ts) >= w,
              transform(sequence(lit(1), size(ts) - (w - 1)),
                i => concat_ws(" ", slice(ts, i, lit(w)))))
              .otherwise(array(concat_ws(" ", ts))))))
      val got = df.select(col("id"), Dedup.shingles(col("text"), w).alias("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val want = df.select(col("id"), oldSh.alias("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(got == want, s"w=$w") // including element ORDER
    }
  }

  /** The pre-r18 interpreted winnow selection, verbatim. */
  private def oldWinnow(df: DataFrame, k: Int, w: Int): DataFrame = {
    val sels = flatten(transform(
      array(oldNormalize(col("text"))), nt =>
        flatten(transform(
          array(when(length(nt) >= k,
            transform(sequence(lit(1), length(nt) - (k - 1)),
              i => Hashing.polyHash(nt.substr(i, lit(k)))))
            .otherwise(array().cast(ArrayType(LongType)))), hs => {
          val m = size(hs)
          def h(i: Column): Column = element_at(hs, i.cast(IntegerType))
          def sel(j: Column): Column = {
            val minv = least((0 until w).map(t => h(j + t + 1)): _*)
            val hiFirst = when(h(j + w) === minv, j + w)
            (w - 1 to 2 by -1).foldLeft(hiFirst)((acc, t) =>
              acc.when(h(j + t) === minv, j + t)).otherwise(j + 1)
          }
          val longSel = filter(
            transform(sequence(lit(0), m - w),
              j => when(j === 0 ||
                  sel(j) =!= sel(greatest(j - 1, lit(0))), sel(j))
                .otherwise(-1)),
            x => x >= 0)
          val shortSel = array(aggregate(
            sequence(lit(1), m),
            struct(lit(Long.MaxValue).alias("h"), lit(0).alias("p")),
            (acc, i) => when(h(i) <= acc.getField("h"),
                struct(h(i).alias("h"), i.alias("p")))
              .otherwise(acc)).getField("p"))
          val positions = when(m >= w, longSel)
            .when(m >= 1, shortSel)
            .otherwise(array().cast(ArrayType(IntegerType)))
          transform(positions, p =>
            struct(p.cast(LongType).alias("pos"), h(p).alias("fp")))
        }))))
    df.select(col("id"), explode(sels).alias("__s"))
      .select(col("id"), col("__s.pos").alias("pos"), col("__s.fp").alias("fp"))
  }

  test("WinnowGrams matches the interpreted winnow selection bit-for-bit") {
    for ((k, w) <- Seq((5, 4), (16, 4), (2, 2), (3, 7))) {
      val got = TextAnalysis.winnowFingerprints(df, "text", "id", k, w)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
      val want = oldWinnow(df, k, w)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
      assert(got == want, s"k=$k w=$w")
    }
  }

  test("HashedGramBuckets matches the grams+bucketOf Column chain " +
      "bit-for-bit, including order and multiplicity") {
    // the pre-r19 DSIR gram/bucket chain, verbatim
    def oldGrams(textCol: Column): Column = {
      val toks = split(oldNormalize(textCol), " ")
      flatten(transform(array(toks), ts =>
        concat(ts,
          when(size(ts) >= 2,
            transform(sequence(lit(1), size(ts) - 1),
              i => concat_ws(" ", slice(ts, i, lit(2)))))
            .otherwise(array().cast(ArrayType(StringType))))))
    }
    def oldBucketOf(g: Column, buckets: Int, seed: Int): Column =
      pmod(Hashing.mix(Hashing.polyHash(g), seed), lit(buckets.toLong))
    for ((buckets, seed) <- Seq((4096, 23), (7, 23), (1, 5), (256, 0))) {
      val want = df.select(col("id"),
        transform(oldGrams(col("text")),
          g => oldBucketOf(g, buckets, seed)).alias("bs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val got = df.select(col("id"),
        org.apache.spark.sql.GraftColumns.column(
          graft.functions.HashedGramBuckets(
            org.apache.spark.sql.GraftColumns.expression(
              Dedup.normalizeText(col("text"))), buckets, seed)).alias("bs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got == want, s"buckets=$buckets seed=$seed") // incl. ORDER
    }
  }

  test("WinnowGrams guarantees: shared fingerprint for long-enough matches") {
    // two docs sharing a >= w+k-1 substring must share a fingerprint
    val k = 5; val w = 4
    val d = Seq(
      (1L, "prefix common shared substring here suffix one"),
      (2L, "other text with common shared substring here trailing")
    ).toDF("id", "text")
    val fps = TextAnalysis.winnowFingerprints(d, "text", "id", k, w)
      .select(col("id"), col("fp")).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
  }
}
