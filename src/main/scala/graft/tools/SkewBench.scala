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
    // 2M rows; one fingerprint holds 1M copies (Zipf head), rest unique
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
    spark.stop()
  }
}
