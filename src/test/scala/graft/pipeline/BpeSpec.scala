package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {

  // classic Sennrich-style fixture, hand-computed under this trainer's
  // conventions (no end-of-word marker; every pair occurrence counts;
  // tie-break count desc then pair lexicographic asc):
  //   round 1: (e,s)=9 ties (s,t)=9 -> (e,s)
  //   round 2: (es,t)=9
  //   round 3: (l,o)=7 ties (o,w)=7 -> (l,o)
  //   round 4: (lo,w)=7
  //   round 5: (e,w)=6 ties (n,e),(w,est) -> (e,w)
  private val fixtureCounts =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
  private val handMerges = Seq(
    ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w"))

  test("trainFromWordCounts reproduces the hand-computed merge table") {
    assert(Bpe.trainFromWordCounts(fixtureCounts, 5) == handMerges)
    // truncation: fewer merges = a prefix of the same table
    assert(Bpe.trainFromWordCounts(fixtureCounts, 3) == handMerges.take(3))
    // minPairFreq stops training: after the 5 merges above the best
    // remaining pair is (n,ew)/(ew,est)=6 ... keep going until pairs die
    val all = Bpe.trainFromWordCounts(fixtureCounts, 100)
    assert(all.take(5) == handMerges)
    // a fully-merged vocab has no pairs left -> training stops early
    assert(all.length < 100)
  }

  test("encode: greedy left-to-right semantics, runs included") {
    val t = Bpe.table(Seq(("b", "b")))
    assert(t.encodeWord("bbbb").toSeq == Seq("bb", "bb"))
    assert(t.encodeWord("bbb").toSeq == Seq("bb", "b"))
    assert(t.encodeWord("abba").toSeq == Seq("a", "bb", "a"))
    // cascade through multi-char symbols; boundary-safe (no cross-symbol
    // phantom matches)
    val t2 = Bpe.table(handMerges)
    assert(t2.encodeWord("low").toSeq == Seq("low"))
    assert(t2.encodeWord("lower").toSeq == Seq("low", "e", "r"))
    assert(t2.encodeWord("newest").toSeq == Seq("n", "ew", "est"))
    assert(t2.encodeWord("widest").toSeq == Seq("w", "i", "d", "est"))
    assert(t2.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "low lower newest widest")) == 1L + 3 + 3 + 4)
    // empty / whitespace-only
    assert(t2.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("")) == 0L)
  }

  test("trainDistributed computes the identical merge table") {
    import spark.implicits._
    // corpus realizing the fixture frequencies through document repetition
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    assert(Bpe.trainDistributed(docs, "text", 5) == handMerges)
    // and both trainers agree on a messier multi-word corpus
    val messy = Seq("the quick brown fox", "the quick dog", "brown fox fox",
      "the the the lazy dog", "quick brown quick")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val local = Bpe.train(messy, "text", 12)
    val dist = Bpe.trainDistributed(messy, "text", 12)
    assert(local == dist, s"local=$local dist=$dist")
  }

  test("vocabularyReport: per-token occurrence mass and word spread") {
    import spark.implicits._
    val merges = handMerges // low->low; lower->low,e,r; newest->n,ew,est; widest->w,i,d,est
    val df = Seq("low lower", "newest widest", "low low").toDF("text")
    val got = Bpe.vocabularyReport(df, "text", merges)
      .orderBy("token")
      .as[(String, Long, Long)].collect().toSeq
    // words: low x3, lower x1, newest x1, widest x1
    // low -> [low]; lower -> [low, e, r]; newest -> [n, ew, est];
    // widest -> [w, i, d, est]
    assert(got == Seq(
      ("d", 1L, 1L), ("e", 1L, 1L), ("est", 2L, 2L), ("ew", 1L, 1L),
      ("i", 1L, 1L), ("low", 4L, 2L), ("n", 1L, 1L), ("r", 1L, 1L),
      ("w", 1L, 1L)), got.toString)
  }

  test("tokenCount column: normalization parity, nulls, and the " +
      "packSequencesByTokens / tokenBudgetMixture seams") {
    import spark.implicits._
    val merges = Bpe.trainFromWordCounts(fixtureCounts, 5)
    val df = Seq(
      (1L, "src_a", "Low, LOWER!  newest"), // normalizes to "low lower newest"
      (2L, "src_a", "widest widest"),
      (3L, "src_b", ""),
      (4L, "src_b", null.asInstanceOf[String])
    ).toDF("doc_id", "source", "text")
    val counted = df.select(col("doc_id"),
      Bpe.tokenCount(col("text"), merges).alias("n"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(counted == Seq((1L, 7L), (2L, 8L), (3L, 0L), (4L, 0L)))
    // packSequencesByTokens accepts the BPE count column: 4 docs of
    // 7/8/0/0 tokens, capacity 8 -> doc1 [0,7) seq0, doc2 [7,15) seq0
    // off 7, docs 3/4 zero-width at 15
    val packed = Packing.packSequencesByTokens(df,
      Bpe.tokenCount(col("text"), merges), "doc_id", Seq.empty, capacity = 8)
      .orderBy("doc_id")
      .select("doc_id", "tokens", "seq_id", "seq_off")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(packed == Seq((1L, 7L, 0L, 0L), (2L, 8L, 0L, 7L),
      (3L, 0L, 1L, 7L), (4L, 0L, 1L, 7L)))
    // tokenBudgetMixture accepts it: budget 7 on src_a keeps the bucket
    // holding doc 1 or 2 depending on hashing; just assert the budget
    // semantics hold (kept tokens start below budget, deterministic)
    val withN = df.withColumn("n", Bpe.tokenCount(col("text"), merges))
    val kept = Splits.tokenBudgetMixture(withN, "doc_id", "source", "n",
      Map("src_a" -> 7L), defaultBudget = 1L)
    val kept2 = Splits.tokenBudgetMixture(withN, "doc_id", "source", "n",
      Map("src_a" -> 7L), defaultBudget = 1L)
    assert(kept.collect().toSet == kept2.collect().toSet) // deterministic
    assert(kept.filter(col("source") === "src_b").count() == 2) // 0-token docs fit
  }
}
