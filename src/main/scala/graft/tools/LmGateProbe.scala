package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-gate probe for the LM/novelty families (SURVEY §21 protocol):
  * prints, for one sf dir, the numbers the sf10 spot-gate records beyond
  * wall ratios — model-table row growth (bigram + trigram KN), the
  * novelty gate's state-row count (distinct winnow fingerprints), and
  * the FINAL AQE executedPlan's join mix for q_lm_kn / q_lm_kn3 (the
  * broadcast→shuffle-join flip as the model outgrows the threshold).
  * Usage: LmGateProbe <sfDir> [cpus] */
object LmGateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // counts-only probe: spread the explode across cores (the replica
    // parquet is one row group — without this the probe runs one task)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    // materialize the tokens ONCE per row before any element_at — the
    // production contribs do the same (__toks alias); inlining the
    // split(normalizeText(...)) into the lambda re-runs the regex per
    // token access, O(tokens²·regex) per doc (measured: an HOUR at sf10
    // vs minutes)
    val tokDocs = docs.select(
      split(graft.pipeline.Dedup.normalizeText(col("text")), " ")
        .alias("__toks"))
    val toks = col("__toks")

    val bigramModelRows = tokDocs
      .select(explode(transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).alias("w1"),
          element_at(toks, i + 1).alias("w2")))).alias("b"))
      .filter(col("b.w1") =!= "" && col("b.w2") =!= "")
      .select(col("b.w1"), col("b.w2")).distinct().count()
    val trigramModelRows = tokDocs
      .filter(size(toks) >= 3)
      .select(explode(transform(sequence(lit(1), size(toks) - 2),
        i => struct(element_at(toks, i).alias("w1"),
          element_at(toks, i + 1).alias("w2"),
          element_at(toks, i + 2).alias("w3")))).alias("t"))
      .filter(col("t.w1") =!= "" && col("t.w2") =!= "" && col("t.w3") =!= "")
      .select(col("t.w1"), col("t.w2"), col("t.w3")).distinct().count()
    val distinctFps = graft.pipeline.TextAnalysis.winnowFingerprints(
      docs, "text", "doc_id").select(col("fp")).distinct().count()

    def joinMix(df: org.apache.spark.sql.DataFrame): String = {
      df.count() // materialize so AQE settles on the final plan
      val p = df.queryExecution.executedPlan.toString
      val bhj = "BroadcastHashJoin".r.findAllIn(p).size
      val smj = "SortMergeJoin".r.findAllIn(p).size
      val shj = "ShuffledHashJoin".r.findAllIn(p).size
      s"BHJ=$bhj SMJ=$smj SHJ=$shj"
    }
    val kn2 = joinMix(graft.pipeline.TextAnalysis.lmKneserNeyScore(
      docs, "text", "doc_id"))
    val kn3 = joinMix(graft.pipeline.TextAnalysis.lmKneserNey3Score(
      docs, "text", "doc_id"))
    // the flip arm: the replica fixture SATURATES the model (closed
    // vocab), so the broadcast→shuffle flip never fires naturally;
    // disabling autoBroadcast proves the same declarative plan degrades
    // to shuffle joins under Catalyst control, no hand-scheduling
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (kn2f, kn3f) =
      try {
        (joinMix(graft.pipeline.TextAnalysis.lmKneserNeyScore(
          docs, "text", "doc_id")),
          joinMix(graft.pipeline.TextAnalysis.lmKneserNey3Score(
            docs, "text", "doc_id")))
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    println(s"GATE dir=$dir bigramModelRows=$bigramModelRows " +
      s"trigramModelRows=$trigramModelRows noveltyStateRows=$distinctFps " +
      s"q_lm_kn[$kn2] q_lm_kn3[$kn3] " +
      s"noBcast:q_lm_kn[$kn2f] noBcast:q_lm_kn3[$kn3f]")
    spark.stop()
  }
}
