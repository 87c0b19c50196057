package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.tsdf.TSDF

/** The scale contract of [[TSDFWriter.writeBucketedTable]]: series-keyed
  * windows, aggregates, and same-bucketing joins read the on-disk hash
  * placement instead of exchanging — at 100 TB that shuffle IS the cost of
  * the query, so the plans must show zero series-key exchanges. */
class BucketedWriteSpec extends SparkTestBase {

  private def exchanges(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("bucketed table: series window, groupBy, and bucket join skip the shuffle") {
    import java.sql.Timestamp
    val spark2 = spark
    import spark2.implicits._
    val t1 = "graft_bucketed_a"; val t2 = "graft_bucketed_b"
    spark.sql(s"DROP TABLE IF EXISTS $t1")
    spark.sql(s"DROP TABLE IF EXISTS $t2")
    try {
      val rows = (0 until 300).map { i =>
        (i % 7L, Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
          i.toDouble)
      }
      val df = rows.toDF("user_id", "ts", "value")
      TSDFWriter.writeBucketedTable(TSDF(df, "ts", Seq("user_id")), t1, numBuckets = 4)
      TSDFWriter.writeBucketedTable(TSDF(df, "ts", Seq("user_id")), t2, numBuckets = 4)
      val a = spark.table(t1)
      assert(a.count() == 300)

      val windowed = a.withColumn("rn",
        row_number().over(Window.partitionBy("user_id").orderBy("ts")))
      assert(exchanges(windowed) == 0,
        windowed.queryExecution.executedPlan.toString)

      val agged = a.groupBy("user_id").agg(sum("value"))
      assert(exchanges(agged) == 0, agged.queryExecution.executedPlan.toString)

      val joined = a.join(spark.table(t2).select(col("user_id"),
        col("ts").alias("ts2"), col("value").alias("v2")), Seq("user_id"))
      assert(exchanges(joined) == 0, joined.queryExecution.executedPlan.toString)
      assert(joined.count() > 0)

      // and the layout is value-faithful
      assert(a.agg(sum("value")).head().getDouble(0) == (0 until 300).sum.toDouble)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t1")
      spark.sql(s"DROP TABLE IF EXISTS $t2")
    }
  }
}
