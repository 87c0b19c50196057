package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.tsdf.TSDF

/** Multi-micro-batch and checkpoint-restart differentials for the stateful
  * streaming twins.
  *
  * Every twin is proven equal to its batch oracle on a SINGLE AvailableNow
  * micro-batch by [[StreamingBatchDifferentialSpec]]; what that cannot see
  * is whether per-series state (EMA value, Holt level/trend, Kalman
  * variance, join buffers, dedup fingerprints) survives the two boundaries
  * a production stream crosses constantly:
  *   - micro-batch boundaries: the same input split across ≥3 batches must
  *     produce bit-identical output (state handed from batch to batch);
  *   - query restarts: stop the query between batches and start a fresh
  *     one from the checkpoint — state must round-trip through the state
  *     store, not just through the in-memory incremental execution.
  * Chunks are time-ordered slices, so no row is late and watermark
  * semantics cannot drop anything — any divergence is a state bug. */
class StreamingResumeSpec extends SparkTestBase {

  private val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime // ms
  private def at(tenths: Int) = new Timestamp(base + tenths * 6000L)

  /** Random (series, ts, value) rows: per series, distinct times on a
    * 6-second lattice, integer values (same shape as the single-batch
    * differential spec). */
  private def randomSeries(rnd: scala.util.Random): Seq[(String, Timestamp, Double)] =
    Seq("u1", "u2", "u3").flatMap { s =>
      val nTicks = 400
      val count = 6 + rnd.nextInt(18)
      val offsets = rnd.shuffle((1 until nTicks - 1).toList).take(count)
      offsets.distinct.sorted.map(o => (s, at(o), rnd.nextInt(1000).toDouble))
    }

  /** Split rows into `n` contiguous time slices (global time order, so
    * per-series order is preserved and nothing is ever late). */
  private def timeSlices(rows: Seq[(String, Timestamp, Double)], n: Int)
      : Seq[Seq[(String, Timestamp, Double)]] = {
    val sorted = rows.sortBy(r => (r._2.getTime, r._1))
    val per = math.max(1, (sorted.size + n - 1) / n)
    sorted.grouped(per).toSeq
  }

  private var runId = 0

  /** Feed time-ordered slices as separate micro-batches into one running
    * query (processAllAvailable between addData calls forces a batch per
    * slice). */
  private def runChunkedStream(rows: Seq[(String, Timestamp, Double)],
      nChunks: Int, build: DataFrame => DataFrame): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    runId += 1
    val name = s"resume_sink_$runId"
    val mem = MemoryStream[(String, Timestamp, Double)]
    val out = build(mem.toDF().toDF("user_id", "ts", "value"))
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    var batches = 0
    timeSlices(rows, nChunks).foreach { slice =>
      mem.addData(slice: _*)
      q.processAllAvailable()
      batches += 1
    }
    q.stop()
    assert(batches >= nChunks.min(rows.size),
      s"expected >=$nChunks micro-batches, drained $batches")
    spark.table(name)
  }

  /** Feed time-ordered slices through a FILE source, stopping the query
    * after every slice and starting a NEW query from the same checkpoint —
    * per-series state must round-trip through the state store across
    * nChunks−1 real restarts. Output goes to a parquet sink (memory sinks
    * don't survive restarts). */
  private def runRestartStream(rows: Seq[(String, Timestamp, Double)],
      nChunks: Int, build: DataFrame => DataFrame): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_resume_").toString
    val srcDir = s"$dir/src"; val outDir = s"$dir/out"; val chk = s"$dir/chk"
    val slices = timeSlices(rows, nChunks)
    def writeChunk(s: Seq[(String, Timestamp, Double)]): Unit =
      s.toDF("user_id", "ts", "value").repartition(1)
        .write.mode("append").parquet(srcDir)
    writeChunk(slices.head)
    val sch = spark.read.parquet(srcDir).schema
    def startQ() = build(spark.readStream.schema(sch).parquet(srcDir))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", chk)
      .outputMode(OutputMode.Append()).start()
    var q = startQ(); q.processAllAvailable(); q.stop()
    slices.tail.foreach { s =>
      writeChunk(s)
      q = startQ(); q.processAllAvailable(); q.stop() // full restart per slice
    }
    spark.read.parquet(outDir)
  }

  private def emaSelect(df: DataFrame): DataFrame =
    df.select(col("user_id"), col("ts"), col("value"),
      col("ema_value").alias("ema"))

  test("streaming ema over 4 micro-batches equals batch emaExact") {
    val rnd = new scala.util.Random(91)
    val rows = randomSeries(rnd)
    val spark2 = spark
    import spark2.implicits._
    val streamed = emaSelect(runChunkedStream(rows, 4, df =>
      StreamingTSDF.ema(df, "ts", Seq("user_id"), "value", alpha = 0.3)))
    val batch = emaSelect(
      TSDF(rows.toDF("user_id", "ts", "value"), "ts", Seq("user_id"))
        .emaExact("value", alpha = 0.3).df
        .withColumnRenamed("ema_exact_value", "ema_value"))
    assertDfEquality(streamed, batch)
  }

  test("streaming holt over 4 micro-batches equals batch holtExact") {
    val rnd = new scala.util.Random(92)
    val rows = randomSeries(rnd)
    val spark2 = spark
    import spark2.implicits._
    def sel(df: DataFrame) = df.select(col("user_id"), col("ts"), col("value"),
      col("holt_level_value").alias("lvl"), col("holt_trend_value").alias("trd"))
    val streamed = sel(runChunkedStream(rows, 4, df =>
      StreamingTSDF.holt(df, "ts", Seq("user_id"), "value",
        alpha = 0.3, beta = 0.1)))
    val batch = sel(TSDF(rows.toDF("user_id", "ts", "value"), "ts", Seq("user_id"))
      .holtExact("value", alpha = 0.3, beta = 0.1).df)
    assertDfEquality(streamed, batch)
  }

  test("streaming kalman over 4 micro-batches equals batch kalmanLevel") {
    val rnd = new scala.util.Random(93)
    val rows = randomSeries(rnd)
    val spark2 = spark
    import spark2.implicits._
    def sel(df: DataFrame) = df.select(col("user_id"), col("ts"), col("value"),
      col("kalman_level_value").alias("m"), col("kalman_var_value").alias("p"),
      col("kalman_gain_value").alias("k"))
    val streamed = sel(runChunkedStream(rows, 4, df =>
      StreamingTSDF.kalmanLevel(df, "ts", Seq("user_id"), "value",
        q = 0.3, r = 2.7)))
    val batch = sel(TSDF(rows.toDF("user_id", "ts", "value"), "ts", Seq("user_id"))
      .kalmanLevel("value", q = 0.3, r = 2.7).df)
    assertDfEquality(streamed, batch)
  }

  test("stream-stream tolerance join fed in 3 chunk pairs equals batch join") {
    val rnd = new scala.util.Random(94)
    val leftRows = randomSeries(rnd)
    val rightRows = randomSeries(rnd)
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(String, Timestamp, Double)]
    val memR = MemoryStream[(String, Timestamp, Double)]
    runId += 1
    val name = s"resume_tol_$runId"
    val out = StreamingTSDF.toleranceJoin(
      memL.toDF().toDF("user_id", "ts", "value"),
      memR.toDF().toDF("user_id", "ts", "rv"),
      "ts", Seq("user_id"), Seq("rv"), tolerance = "5 minutes")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    // chunk BOTH sides on the same time boundaries so the watermark (10 min
    // delay > 5 min tolerance) never evicts a buffered row a later left
    // chunk still needs
    timeSlices(leftRows, 3).zip(timeSlices(rightRows, 3)).foreach {
      case (ls, rs) =>
        memL.addData(ls: _*)
        memR.addData(rs: _*)
        q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table(name)
    val l = leftRows.toDF("user_id", "ts", "value").alias("l")
    val r = rightRows.toDF("user_id", "ts", "rv").alias("r")
    val batch = l.join(r,
      col("l.user_id") === col("r.user_id") &&
        col("r.ts") <= col("l.ts") &&
        col("r.ts") >= col("l.ts") - expr("INTERVAL 5 minutes"), "inner")
      .select(col("l.user_id"), col("l.ts"), col("l.value"),
        col("r.ts").alias("right_ts"), col("r.rv").alias("right_rv"))
    assertDfEquality(streamed, batch)
  }

  test("streaming hll changelog max-rolls to the batch register file over " +
      "4 batches, narrow AND wide") {
    for (wide <- Seq(false, true)) {
      val rnd = new scala.util.Random(95)
      val rows = randomSeries(rnd)
      val spark2 = spark
      import spark2.implicits._
      val sink = runChunkedStream(rows, 4, df =>
        StreamingTSDF.hllRegisters(df, "ts", Seq("user_id"),
          col("value").cast("string"), wide = wide))
      val rolled = sink.groupBy(col("user_id"), col("bucket"))
        .agg(max(col("register")).alias("register"))
      val batch = graft.pipeline.Sketch.hllRegisters(
        rows.toDF("user_id", "ts", "value"), Seq("user_id"),
        col("value").cast("string"), wide = wide)
      // register changelog rollup == batch register file, bit-exact
      withClue(s"wide=$wide: ") { assertDfEquality(rolled, batch) }
    }
  }

  test("streaming histogram deltas sum-roll to the batch histogram over 4 batches") {
    val rnd = new scala.util.Random(96)
    val rows = randomSeries(rnd)
    val spark2 = spark
    import spark2.implicits._
    val sink = runChunkedStream(rows, 4, df =>
      StreamingTSDF.histogramDeltas(df, "ts", Seq("user_id"),
        col("value"), 0.0, 1024.0, 64))
    val rolled = sink.groupBy(col("user_id"), col("bin"))
      .agg(sum(col("cnt")).alias("cnt"))
    val batch = graft.pipeline.Sketch.histogram(
      rows.toDF("user_id", "ts", "value"), Seq("user_id"),
      col("value"), 0.0, 1024.0, 64)
    assertDfEquality(rolled, batch)
  }

  test("streaming dedup state survives micro-batch boundaries") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    runId += 1
    val name = s"resume_dedup_$runId"
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingTSDF.dedupNormalized(
      mem.toDF().toDF("doc_id", "ts", "text"), "ts", "text",
      watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    // batch 1: first copies
    mem.addData(
      (1L, at(0), "Hello,  World!"),
      (2L, at(10), "something else"))
    q.processAllAvailable()
    // batch 2 (inside the watermark): duplicates of batch-1 docs must STILL
    // be dropped — only state carried across the batch boundary can know
    mem.addData(
      (3L, at(20), "hello world"),       // dup of doc 1 (normalized)
      (4L, at(30), "SOMETHING   ELSE"),  // dup of doc 2 (normalized)
      (5L, at(40), "genuinely new text"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table(name).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 5L), s"got $ids")
  }

  test("streaming ema state round-trips a checkpoint restart (file source)") {
    val rnd = new scala.util.Random(95)
    val rows = randomSeries(rnd)
    val spark2 = spark
    import spark2.implicits._
    val streamed = emaSelect(runRestartStream(rows, 3, df =>
      StreamingTSDF.ema(df, "ts", Seq("user_id"), "value", alpha = 0.3)))
    val batch = emaSelect(
      TSDF(rows.toDF("user_id", "ts", "value"), "ts", Seq("user_id"))
        .emaExact("value", alpha = 0.3).df
        .withColumnRenamed("ema_exact_value", "ema_value"))
    assertDfEquality(streamed, batch)
  }

  test("streaming holt state round-trips a checkpoint restart (file source)") {
    val rnd = new scala.util.Random(96)
    val rows = randomSeries(rnd)
    val spark2 = spark
    import spark2.implicits._
    def sel(df: DataFrame) = df.select(col("user_id"), col("ts"), col("value"),
      col("holt_level_value").alias("lvl"), col("holt_trend_value").alias("trd"))
    val streamed = sel(runRestartStream(rows, 3, df =>
      StreamingTSDF.holt(df, "ts", Seq("user_id"), "value",
        alpha = 0.3, beta = 0.1)))
    val batch = sel(TSDF(rows.toDF("user_id", "ts", "value"), "ts", Seq("user_id"))
      .holtExact("value", alpha = 0.3, beta = 0.1).df)
    assertDfEquality(streamed, batch)
  }

  test("streaming kalman state round-trips a checkpoint restart (file source)") {
    val rnd = new scala.util.Random(97)
    val rows = randomSeries(rnd)
    val spark2 = spark
    import spark2.implicits._
    def sel(df: DataFrame) = df.select(col("user_id"), col("ts"), col("value"),
      col("kalman_level_value").alias("m"), col("kalman_var_value").alias("p"),
      col("kalman_gain_value").alias("k"))
    val streamed = sel(runRestartStream(rows, 3, df =>
      StreamingTSDF.kalmanLevel(df, "ts", Seq("user_id"), "value",
        q = 0.3, r = 2.7)))
    val batch = sel(TSDF(rows.toDF("user_id", "ts", "value"), "ts", Seq("user_id"))
      .kalmanLevel("value", q = 0.3, r = 2.7).df)
    assertDfEquality(streamed, batch)
  }

  test("streaming dedup state survives a checkpoint restart (file source)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_resume_").toString
    val srcDir = s"$dir/src"; val outDir = s"$dir/out"; val chk = s"$dir/chk"
    def writeChunk(s: Seq[(Long, Timestamp, String)]): Unit =
      s.toDF("doc_id", "ts", "text").repartition(1)
        .write.mode("append").parquet(srcDir)
    writeChunk(Seq(
      (1L, at(0), "Hello,  World!"),
      (2L, at(10), "something else")))
    val sch = spark.read.parquet(srcDir).schema
    def startQ() = StreamingTSDF.dedupNormalized(
      spark.readStream.schema(sch).parquet(srcDir), "ts", "text",
      watermarkDelay = "1 hour")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", chk)
      .outputMode(OutputMode.Append()).start()
    var q = startQ(); q.processAllAvailable(); q.stop()
    // duplicates arrive AFTER a full restart — only checkpointed dedup
    // state can reject them
    writeChunk(Seq(
      (3L, at(20), "hello world"),
      (4L, at(30), "SOMETHING   ELSE"),
      (5L, at(40), "genuinely new text")))
    q = startQ(); q.processAllAvailable(); q.stop()
    val ids = spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 5L), s"got $ids")
  }

  test("streaming scd2Changelog across checkpoint restarts equals the " +
      "batch change set") {
    val rnd = new scala.util.Random(97)
    val rows = randomSeries(rnd)
    val spark2 = spark
    import spark2.implicits._
    // attr derived from the value so no-op re-emits are common; the value
    // column doubles as the tie column (unused here — distinct ts — but
    // exercises the tie plumbing through the state round-trip)
    def withAttr(df: DataFrame) =
      df.withColumn("event_type", (col("value") % 3).cast("string"))
    val streamed = runRestartStream(rows, 3, df =>
      StreamingTSDF.scd2Changelog(withAttr(df), Seq("user_id"), "ts",
        Seq("event_type"), "value"))
      .select("user_id", "ts", "event_type")
    val batch = graft.pipeline.Cdc.scd2FromLog(
      withAttr(rows.toDF("user_id", "ts", "value")),
      "user_id", "ts", Seq("event_type"), tieCols = Seq("value"))
      .select(col("user_id"), col("valid_from").alias("ts"),
        col("event_type"))
    assertDfEquality(streamed, batch)
  }
}
