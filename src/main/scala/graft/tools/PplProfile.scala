package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for pplBucketsByThreshold's slowness:
  * times the KN scoring alone, the u-key projection alone, the eager
  * materialization, and the full threshold cut, on one sf dir.
  * Usage: PplProfile <sfDir> [cpus] */
object PplProfile {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"))
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val kn = graft.pipeline.TextAnalysis.lmKneserNeyScore(docs, "text",
      "doc_id")
    t("kn.count")(kn.count())
    t("kn.count-again")(kn.count())
    val MaxU = (1L << 45) - 1
    val uExpr = when(col("n_bigrams") > 0, greatest(lit(0L), lit(MaxU) -
      expr("(cast(-sum_mu as decimal(38,0)) * 1000000 + n_bigrams - 1)" +
        " div n_bigrams")))
    val proj = kn.select(col("doc_id"), col("n_bigrams"), uExpr.alias("__u"))
    t("proj.count")(proj.count())
    var mat: org.apache.spark.sql.DataFrame = null
    t("materialize-eager") {
      mat = graft.pipeline.Materializer(proj, eager = true)
      0L
    }
    t("mat.count")(mat.count())
    t("mat.hist1")(mat.filter(col("__u").isNotNull)
      .groupBy(shiftright(col("__u"), 32).alias("c"))
      .agg(count(lit(1))).count())
    t("full-threshold-cut")(graft.pipeline.TextAnalysis
      .pplBucketsByThreshold(kn, "doc_id").count())
    t("range.localCheckpoint")(
      spark.range(50000).toDF("x").localCheckpoint(true).count())
    // piecewise: where does the full-value path spend its time?
    val contribs = graft.pipeline.TextAnalysis.lmKneserNeyContribs(
      docs, docs, "text", "doc_id")
    t("contribs.count")(contribs.count())
    t("contribs.sum_mu")(
      contribs.agg(sum(col("__mu"))).collect().head.getLong(0))
    val toksOf = split(graft.pipeline.Dedup.normalizeText(col("text")), " ")
    val bg = docs.select(col("doc_id"), toksOf.alias("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => struct(element_at(col("__toks"), i).alias("w1"),
            element_at(col("__toks"), i + 1).alias("w2")))).alias("__b"))
    t("bigrams.count")(bg.count())
    t("bigrams.hashsum")(bg.select(col("__b.w1").alias("w1"))
      .agg(sum(length(col("w1")))).collect().head.getLong(0))
    // isolate: regex normalize vs plain split vs explode shapes
    t("normalize.only")(docs.select(
      graft.pipeline.Dedup.normalizeText(col("text")).alias("n"))
      .agg(sum(length(col("n")))).collect().head.getLong(0))
    val bgPlain = docs.select(col("doc_id"),
      split(col("text"), " ").alias("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => struct(element_at(col("__toks"), i).alias("w1"),
            element_at(col("__toks"), i + 1).alias("w2")))).alias("__b"))
    t("bigrams.plainsplit")(bgPlain.select(col("__b.w1").alias("w1"))
      .agg(sum(length(col("w1")))).collect().head.getLong(0))
    val bgZip = docs.select(col("doc_id"), toksOf.alias("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1))).alias("__b"))
    t("bigrams.zipslice")(bgZip.select(col("__b.0").alias("w1"))
      .agg(sum(length(col("w1")))).collect().head.getLong(0))
    spark.stop()
  }
}
