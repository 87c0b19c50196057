package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object SkewBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 11M rows; one fingerprint holds 10M copies (Zipf head), rest unique
    val df = spark.range(11000000).select(col("id"),
      when(col("id") < 10000000, lit("hot")).otherwise(concat(lit("u"), col("id"))).alias("fp"),
      concat(lit("payload"), col("id")).alias("text")).cache()
    df.count()
    def time(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); val n = f
        println(f"$name rep$i ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      }
    }
    time("window   ") {
      val w = Window.partitionBy(col("fp")).orderBy(col("id").asc)
      df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn").count()
    }
    time("aggregate") {
      graft.pipeline.Dedup.exact(df, Seq("fp"), "id").count()
    }
    df.unpersist()

    // KMV k-min: one group holding 8M DISTINCT hashes (plus a small one) —
    // the regime the sketch exists for. Old shape = distinct + group-wide
    // row_number window; new shape = the bounded mergeable k-min aggregate.
    val kdf = spark.range(8000000).select(
      when(col("id") < 7999000, lit("hot")).otherwise(lit("small")).alias("g"),
      concat(lit("item"), col("id")).alias("item")).cache()
    kdf.count()
    val h = graft.pipeline.Hashing.mix(
      graft.pipeline.Hashing.polyHash(col("item")), 17)
    time("kmv-window   ") {
      val hashed = kdf.select(col("g"), h.alias("__h")).distinct()
      val w = Window.partitionBy(col("g")).orderBy(col("__h"))
      hashed.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 256)
        .groupBy(col("g")).agg(count(lit(1)), max(col("__h"))).count()
    }
    time("kmv-aggregate") {
      graft.pipeline.Sketch.kmvDistinct(kdf, Seq("g"), col("item"), 256).count()
    }
    kdf.unpersist()

    // Sequence packing: ONE source holding 4M docs — the single-corpus
    // layout. Old shape = one ordered window over the whole group; new
    // shape = two-pass prefix sum over ordered id buckets.
    val pdf = spark.range(4000000).select(lit("web").alias("source"),
      col("id").alias("doc_id"),
      concat(lit("some text body number "), col("id")).alias("text")).cache()
    pdf.count()
    // consume the packed columns through an aggregate — a bare count()
    // would let column pruning delete the (unreferenced) window entirely
    // and time nothing
    time("pack-window  ") {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tokens = graft.pipeline.TextAnalysis
        .bpeTokenEstimate(col("text")).cast("long")
      val start = sum(col("tokens")).over(w) - col("tokens")
      pdf.select(col("source"), col("doc_id"), tokens.alias("tokens"))
        .withColumn("seq_id", floor(start / 2048).cast("long"))
        .withColumn("seq_off", (start % 2048).cast("long"))
        .agg(sum(col("seq_id") + col("seq_off"))).collect()
      pdf.count()
    }
    time("pack-two-pass") {
      graft.pipeline.Packing.packSequences(
        pdf, "text", "doc_id", Seq("source"), 2048)
        .agg(sum(col("seq_id") + col("seq_off"))).collect()
      pdf.count()
    }
    pdf.unpersist()

    // Optional big-pack crossover probe (`packbig` arg): ONE source at
    // 32M docs — where the single-window form's one sort task stops
    // being "fast enough" and the two-pass's parallel buckets take over.
    // (Runs after the standard scenarios; invoke with the arg when the
    // extra ~minutes are wanted.)
    if (args.contains("packbig")) {
      val big = spark.range(32000000).select(lit("web").alias("source"),
        col("id").alias("doc_id"),
        concat(lit("some text body number "), col("id")).alias("text"))
      time("packbig-window ") {
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tokens = graft.pipeline.TextAnalysis
          .bpeTokenEstimate(col("text")).cast("long")
        val start = sum(col("tokens")).over(w) - col("tokens")
        big.select(col("source"), col("doc_id"), tokens.alias("tokens"))
          .withColumn("seq_id", floor(start / 2048).cast("long"))
          .withColumn("seq_off", (start % 2048).cast("long"))
          .agg(sum(col("seq_id") + col("seq_off"))).collect()
        1L
      }
      time("packbig-two-pass") {
        graft.pipeline.Packing.packSequences(
          big, "text", "doc_id", Seq("source"), 2048)
          .agg(sum(col("seq_id") + col("seq_off"))).collect()
        1L
      }
    }

    // Exact quantile pass 2: 30% of 20M rows share one cents value. Old
    // shape = row_number over the target bin; new shape = per-cents counts.
    val qdf = spark.range(20000000).select(
      when(col("id") % 10 < 3, lit(42.17))
        .otherwise((col("id") % 500).cast("double") + 0.25).alias("v")).cache()
    qdf.count()
    time("quant-window ") {
      // the old pass 2, isolated: rank every row of the hot target bin
      val vals = qdf.select(
        floor(col("v") * 100.0 + 0.5).cast("long").alias("__c"),
        graft.pipeline.Sketch.histBin(col("v"), 0.0, 512.0, 64).alias("__bin"))
        .filter(col("__bin") === 5L) // the bin holding the 30% value
      val w = Window.partitionBy(col("__bin")).orderBy(col("__c"))
      vals.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 3000000L).count()
    }
    time("quant-2pass  ") {
      graft.pipeline.Sketch.exactQuantiles2Pass(
        qdf, col("v"), Seq(0.5, 0.9), 0.0, 512.0, 64).count()
    }
    spark.stop()
  }
}
