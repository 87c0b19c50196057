package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream product analytics: funnels, retention cohorts, sliding
  * active users, inter-arrival statistics. All exact-integer relational
  * plans (counts, selected timestamps, fixed IEEE assembly for the few
  * terminal ratios) — deterministic on any engine and any partitioning.
  *
  * Reference scope note: tempo has no product-analytics surface; these are
  * the event-table companions a pipeline runs next to its time-series ops.
  */
object Analytics {

  /** Ordered funnel: for each user, the earliest strictly-increasing
    * completion chain through `steps` — t1 = first step-1 event, t2 =
    * first step-2 event AFTER t1, … (the standard "re-anchored" funnel:
    * later steps only count after the previous step completed). `depth` =
    * number of steps reached. Selected timestamps only ⇒ engine-exact.
    *
    * Plan shape: one tiny per-step aggregate + equi-join per step, all
    * keyed on the user — k−1 joins over shrinking sets, each map-side
    * combinable; the event table streams through once per step with the
    * step filter pushed to the scan. Output: (user, t1_us…tk_us, depth). */
  def funnel(df: DataFrame, tsCol: String, userCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val tsUs = unix_micros(col(tsCol))
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(tsUs).alias("t1_us"))
    val chained = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (prev, (step, i)) =>
        val tPrev = s"t${i}_us"
        val tCur = s"t${i + 1}_us"
        val nxt = df.filter(col(typeCol) === step)
          .select(col(userCol), tsUs.alias("__ts"))
          .join(prev.select(col(userCol), col(tPrev)), Seq(userCol))
          .filter(col("__ts") > col(tPrev))
          .groupBy(col(userCol)).agg(min(col("__ts")).alias(tCur))
        prev.join(nxt.select(col(userCol), col(tCur)), Seq(userCol), "left")
    }
    val depth = steps.indices.map(i => when(col(s"t${i + 1}_us").isNotNull, 1L)
      .otherwise(0L)).reduce(_ + _)
    chained.withColumn("depth", depth)
  }

  /** Hierarchical multi-granularity rollup — the warehouse "one scan,
    * every aggregation level" operator: one pass produces the
    * (dims…, day, hour) leaf cells PLUS every coarser prefix level
    * (per-day, per-dim, grand total), tagged by the SQL-standard
    * `grouping_id` bitmask (bit set = that column is aggregated away; the
    * identical bitmask DuckDB's GROUPING() returns, so levels join
    * exactly in the oracle). Spark's native `rollup` plans this as ONE
    * expand + hash aggregate — partial aggregation applies to every
    * level simultaneously, so at 100 TB the scan happens once instead of
    * once per granularity, and no level ever re-shuffles the corpus.
    * Day/hour are exact integer µs arithmetic (no calendar conventions);
    * the measure is exact cents, so every level's sum is
    * order-insensitive. */
  def timeRollup(df: DataFrame, tsCol: String, dimCols: Seq[String],
      centsCol: Column): DataFrame = {
    val withTime = df
      .withColumn("day", expr(s"unix_micros($tsCol) div 86400000000"))
      .withColumn("hr",
        expr(s"(unix_micros($tsCol) % 86400000000) div 3600000000"))
    withTime
      .rollup((dimCols.map(col) :+ col("day")) :+ col("hr"): _*)
      .agg(grouping_id().alias("gid"),
        count(lit(1)).alias("n_events"),
        sum(centsCol.cast(LongType)).alias("sum_cents"))
  }

  /** MATCH_RECOGNIZE-style sequence-pattern detection per series — the
    * regex generalization of [[funnel]] (a funnel is the pattern
    * `a.*?b.*?c`; this operator also expresses negations, bounded gaps,
    * immediate adjacency and repetitions the chained-join form cannot).
    * Each series' events are rendered in (ts, tie) order as a
    * one-char-per-event TRACE string via `alphabet` (event value → char;
    * unmapped events become `defaultChar` so patterns can skip or block
    * on them), then `pattern` — a regex in the Java∩RE2 common subset —
    * runs against the trace: non-overlapping `n_matches` plus the 1-based
    * position of the EARLIEST match (−1 when absent; a lazy-prefix
    * capture, so inner groups in `pattern` don't shift the index).
    *
    * Plan shape: ONE shuffle (the series groupBy); the trace is built
    * with sort_array over collected (ts, tie, char) structs — bounded by
    * the series' own event count, the [[graft.tsdf.Stats]] lookback
    * discipline, and orders of magnitude smaller than the events it
    * encodes (1 char each). The regex work is per-series scan-bound
    * column algebra that replays bit-identically in a SQL oracle
    * (string_agg ORDER BY + regexp_extract_all). */
  def sequencePattern(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      eventCol: String, alphabet: Map[String, String], pattern: String,
      defaultChar: String = "o", tieCols: Seq[String] = Seq()): DataFrame = {
    require(alphabet.values.forall(_.length == 1) && defaultChar.length == 1,
      "alphabet values and defaultChar must be single characters")
    val charOf = alphabet.toSeq.sortBy(_._1)
      .foldRight(lit(defaultChar): Column) { case ((k, v), acc) =>
        when(col(eventCol) === k, lit(v)).otherwise(acc)
      }
    val ord = struct(((unix_micros(col(tsCol)).alias("__t") +:
      tieCols.map(col)) :+ charOf.alias("__c")): _*)
    df.groupBy(seriesCols.map(col): _*)
      .agg(collect_list(ord).alias("__evs"))
      .withColumn("trace", array_join(
        transform(sort_array(col("__evs")), x => x.getField("__c")), ""))
      .drop("__evs")
      .withColumn("trace_len", length(col("trace")).cast(LongType))
      .withColumn("n_matches",
        regexp_count(col("trace"), lit(pattern)).cast(LongType))
      .withColumn("first_pos",
        when(col("n_matches") > 0L,
          length(regexp_extract(col("trace"), s"^(.*?)(?:$pattern)", 1))
            .cast(LongType) + 1L)
          .otherwise(lit(-1L)))
  }

  /** Retention cohorts: users bucketed by their FIRST active period
    * (period = `periodDays`-day windows from the epoch, exact integer
    * µs arithmetic — no calendar/ISO-week conventions to diverge on);
    * for offset k, retention = active users of the cohort in period
    * cohort+k over the cohort size (one terminal division). Output one
    * row per (cohort_period, k): (cohort_period, k, n_active,
    * cohort_size, retention). */
  def retentionCohorts(df: DataFrame, tsCol: String, userCol: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, "periodDays must be >= 1")
    val periodUs = periodDays * 86400000000L
    val active = df.select(col(userCol),
      expr(s"unix_micros($tsCol) div $periodUs").alias("__p")).distinct()
    val cohorts = active.groupBy(col(userCol))
      .agg(min(col("__p")).alias("cohort_period"))
    val sizes = cohorts.groupBy(col("cohort_period"))
      .agg(count(lit(1)).alias("cohort_size"))
    active.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_period"),
        (col("__p") - col("cohort_period")).alias("k"))
      .agg(count(lit(1)).alias("n_active"))
      .join(sizes, Seq("cohort_period"))
      .select(col("cohort_period"), col("k"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast(DoubleType) / col("cohort_size"))
          .alias("retention"))
  }

  /** Sliding active users: for every observed day, the distinct users
    * active in the trailing `windowDays` window (WAU at 7, MAU at 30).
    * Exact distinct via the day-explode decomposition: each (user, day)
    * activity contributes to `windowDays` report days, then one distinct +
    * count per report day — linear × windowDays, no sliding-window state,
    * embarrassing to parallelize at any corpus size. Report days are
    * clipped to the observed [min, max] span (one-row broadcast).
    * Output: (day_idx, day_ts_us, active_users). */
  def slidingActiveUsers(df: DataFrame, tsCol: String, userCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val dayUs = 86400000000L
    val days = df.select(col(userCol),
      expr(s"unix_micros($tsCol) div $dayUs").alias("__d")).distinct()
    val span = days.agg(min(col("__d")).alias("__lo"),
      max(col("__d")).alias("__hi"))
    days
      .withColumn("day_idx",
        explode(sequence(col("__d"), col("__d") + (windowDays - 1))))
      .select(col(userCol), col("day_idx")).distinct()
      .crossJoin(broadcast(span))
      .filter(col("day_idx") <= col("__hi"))
      .groupBy(col("day_idx"))
      .agg(count(lit(1)).alias("active_users"))
      .select(col("day_idx"), (col("day_idx") * dayUs).alias("day_ts_us"),
        col("active_users"))
  }

  /** Inter-arrival statistics per series: gap count, mean gap, and the
    * coefficient of variation (burstiness gauge: CV ≈ 1 Poisson, ≫ 1
    * bursty). Gaps quantize to whole SECONDS (integer µs difference
    * div 10⁶) so Σgap² stays far inside BIGINT range at any series
    * length; mean/sd/cv assemble from the exact sums in fixed IEEE order
    * (sample stddev, the [[Stats]] moment-sum discipline — sqrt is
    * correctly-rounded, so the result replays bit-for-bit). ONE series
    * exchange (lag window + aggregate share the sort). Output per series:
    * (series…, n_gaps, mean_gap_s, cv_gap). */
  def interArrival(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    val sc = seriesCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sc: _*).orderBy((tsCol +: tieCols).map(col): _*)
    val tsUs = unix_micros(col(tsCol))
    val gap = ((tsUs - lag(tsUs, 1).over(w)) / 1000000L).cast(LongType)
    val agg = df.withColumn("__g", gap)
      .groupBy(sc: _*)
      .agg(count(col("__g")).alias("n_gaps"),
        sum(col("__g")).alias("__s1"),
        sum(col("__g") * col("__g")).alias("__s2"))
    val n = col("n_gaps")
    val mean = col("__s1").cast(DoubleType) / n
    val sd = sqrt((n * col("__s2") - col("__s1") * col("__s1"))
      .cast(DoubleType) / (n * (n - 1)))
    agg.select(sc ++ Seq(n,
      when(n > 0, mean).alias("mean_gap_s"),
      when(n > 1 && mean =!= 0.0, sd / mean).alias("cv_gap")): _*)
  }

  /** First-order Markov transition matrix over each series' event stream:
    * counts of adjacent (from → to) event-type steps in (ts, tie) order,
    * with the per-from totals and the transition probability — behavior
    * modeling, anomaly triage (improbable transitions), and QA of
    * synthetic sequences all read this table. Counts are exact BIGINTs;
    * `p` is ONE terminal correctly-rounded division, so the matrix
    * replays bit-exactly in any engine.
    *
    * Plan shape: one lead window per series partition (uniform series
    * keys — no global sort), then a map-side-combinable count per
    * (from, to); the per-from totals derive from the ALREADY-aggregated
    * count table (O(types²) rows), never from a second pass over the
    * corpus. Output: (from_type, to_type, n, n_from, p). */
  def transitionMatrix(df: DataFrame, tsCol: String, seriesCols: Seq[String],
      typeCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    require(seriesCols.nonEmpty, "need at least one series column")
    val sc = seriesCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sc: _*).orderBy((tsCol +: tieCols).map(col): _*)
    val cnt = df.withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).alias("from_type"), col("__to").alias("to_type"))
      .agg(count(lit(1)).alias("n"))
    transitionMatrixFromCounts(cnt)
  }

  /** The [[transitionMatrix]] tail over already-counted
    * (from_type, to_type, n) rows — the shape a folded streaming
    * [[graft.streaming.StreamingTSDF.transitionDeltas]] sink arrives
    * in. */
  def transitionMatrixFromCounts(cnt: DataFrame): DataFrame = {
    val fromTotals = cnt.groupBy(col("from_type"))
      .agg(sum(col("n")).alias("n_from"))
    cnt.join(fromTotals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast(DoubleType) / col("n_from").cast(DoubleType))
          .alias("p"))
  }

  /** Item co-occurrence with exact lift — the market-basket affinity pass:
    * a "basket" is the DISTINCT item set of a session (any composite
    * session key), n_ab = sessions containing both items of a pair,
    * lift = (n_ab·N)/(n_a·n_b) (> 1 ⇒ the pair co-occurs more than
    * independence predicts). All counts are exact BIGINTs; support/lift
    * are single terminal divisions on exact integer products (the casts
    * round identically in any engine).
    *
    * Plan shape: one distinct on (session, item), a session-keyed
    * self-join for pair generation (per-session cost is |basket|² — cap
    * baskets upstream if a session can hold thousands of distinct items),
    * then map-side-combinable counts; the per-item counts and the one-row
    * session total join back by AQE's choice (no forced broadcast).
    * Output: (item_a, item_b, n_ab, n_a, n_b, n_sessions, support, lift). */
  def cooccurrence(df: DataFrame, sessionCols: Seq[String],
      itemCol: String): DataFrame = {
    require(sessionCols.nonEmpty, "need at least one session key column")
    val sess = sessionCols.map(col)
    val baskets = df.select(sess :+ col(itemCol).alias("item_a"): _*).distinct()
    val nSess = baskets.select(sess: _*).distinct()
      .agg(count(lit(1)).alias("n_sessions"))
    val itemCounts = baskets.groupBy(col("item_a")).agg(count(lit(1)).alias("n"))
    val pairs = baskets
      .join(baskets.withColumnRenamed("item_a", "item_b"), sessionCols)
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).alias("n_ab"))
    pairs
      .join(itemCounts.withColumnRenamed("n", "n_a"), Seq("item_a"))
      .join(itemCounts.withColumnRenamed("item_a", "item_b")
        .withColumnRenamed("n", "n_b"), Seq("item_b"))
      .crossJoin(broadcast(nSess))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_sessions"),
        (col("n_ab").cast(DoubleType) / col("n_sessions")).alias("support"),
        ((col("n_ab") * col("n_sessions")).cast(DoubleType) /
          (col("n_a") * col("n_b")).cast(DoubleType)).alias("lift"))
  }

  /** Exact-integer PageRank over an edge list — every arithmetic step is a
    * BIGINT operation, so the result is bit-identical on any engine, any
    * partitioning, any iteration parallelism (float PageRank is not: the
    * per-node Σ of double contributions is order-dependent). Ranks live in
    * `scale`-units (default 10¹²): rank₀ = scale div N, each iteration
    * rank(v) = base + Σ_{u→v} (rank(u)·85 div 100) div outdeg(u) with
    * base = (scale·15 div 100) div N. Integer floor drops sub-unit mass
    * and dangling-node mass is discarded (a symmetric graph — e.g. the
    * [[cooccurrence]] pair graph — has none); both losses are
    * deterministic and bounded by one scale-unit per node per iteration.
    *
    * Plan shape: the classic distributed iteration — `iterations` rounds
    * of (edge ⋈ rank on src) → dst-keyed partial-agg sum → left-join back
    * to the node set; each round is two shuffles on uniform keys.
    *
    * Iteration hygiene — MEASURED (sf0.1 basket graph, local[32],
    * min-of-2 warm): the default LAZY plan runs 3.4 s; `persistEdges`
    * 4.4-4.6 s; any `localCheckpoint` cadence 7.5-10.3 s. Three findings
    * behind the defaults:
    *  - within ONE action, `ReuseExchange` already dedups every reference
    *    to the edge-derivation subplan, so the "re-derives edges per
    *    iteration" recompute does not actually occur — lazy wins;
    *  - `Dataset.localCheckpoint` materializes through the physical plan
    *    WITHOUT AQE's runtime re-optimization, so the iteration joins it
    *    covers lose their broadcast/coalesce conversions — a >2x
    *    regression on the checkpointed span, far outweighing the lineage
    *    saving at any scale where the per-round data still fits AQE's
    *    broadcast thresholds;
    *  - persisting caches pays serialization up front to save cross-ACTION
    *    recompute, and there is only one extra action here (the n=count).
    * Set `persistEdges=true` when the caller's edge lineage is expensive
    * enough that even two computations hurt (it is computed once for the
    * count and once for the final action), and `checkpointEvery=k` (a real
    * lineage cut via localCheckpoint) only for deep runs — iterations ≳ 50
    * — where analysis/stack depth itself becomes the constraint, or on
    * preemptible clusters where bounded failure-replay matters more than
    * steady-state speed. Semantics are identical on every path (exact
    * BIGINT arithmetic). Output: (node, rank). */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10, scale: Long = 1000000000000L,
      persistEdges: Boolean = false, checkpointEvery: Int = 0): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col(srcCol).alias("node"), col(dstCol).alias("__dst"))
    val e = if (persistEdges) e0.persist(lvl) else e0
    val nodes0 = e.select(col("node"))
      .union(e.select(col("__dst").alias("node"))).distinct()
    val nodes = if (persistEdges) nodes0.persist(lvl) else nodes0
    val withDeg0 = e
      .join(e.groupBy(col("node")).agg(count(lit(1)).alias("__deg")),
        Seq("node"))
    val withDeg = if (persistEdges) withDeg0.persist(lvl) else withDeg0
    try {
      val n = nodes.count() // one documented driver-side scalar (graph order)
      require(n > 0, "pagerank needs a non-empty graph")
      val base = (scale * 15L / 100L) / n
      var ranks = nodes.select(col("node"), lit(scale / n).alias("rank"))
      for (i <- 1 to iterations) {
        val inbound = withDeg.join(ranks, Seq("node"))
          .select(col("__dst").alias("node"),
            expr("((rank * 85) div 100) div __deg").alias("__c"))
          .groupBy(col("node")).agg(sum(col("__c")).alias("__s"))
        ranks = nodes.join(inbound, Seq("node"), "left")
          .select(col("node"),
            (lit(base) + coalesce(col("__s"), lit(0L))).alias("rank"))
        if (checkpointEvery > 0 &&
            (i % checkpointEvery == 0 || i == iterations))
          // eager iterative-frontier boundary through the Materializer
          // seam — deep runs survive executor loss under `reliable` mode
          ranks = Materializer(ranks, eager = true)
      }
      if (persistEdges && checkpointEvery == 0) {
        // materialize the result (AQE path) before the edge caches drop in
        // the finally block — the returned frame serves from its own small
        // per-node cache, never from the unpersisted lineage
        ranks = ranks.persist(lvl)
        ranks.count()
      }
      ranks
    } finally {
      if (persistEdges) {
        e.unpersist(false)
        nodes.unpersist(false)
        withDeg.unpersist(false)
      }
    }
  }

  /** Per-node triangle count, degree, and local clustering coefficient
    * over an undirected edge list (either orientation, self-loops and
    * duplicates tolerated — canonicalized internally).
    *
    * Plan shape: the degree-ordered node-iterator — edges are oriented
    * from the lower-(degree, node) endpoint to the higher, wedges
    * enumerated by self-joining the oriented list on its source, and each
    * wedge closed by probing the canonical edge set. Orienting by degree
    * bounds each node's wedge fan-out by its ORIENTED out-degree (≤ √|E|
    * in expectation), the standard defense against hub skew: a
    * billion-edge graph with a degree-10⁶ hub generates wedges at the
    * hub's low-degree neighbors, not 10¹² pairs at the hub. All joins are
    * key-partitioned equi-joins; counts are exact BIGINTs and the
    * clustering coefficient one fixed-order IEEE expression
    * (2·tri/(deg·(deg−1)), null when deg < 2) — engine-exact.
    * Output: (node, degree, triangles, clustering). */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val ec = edges
      .select(least(col(srcCol), col(dstCol)).alias("a"),
        greatest(col(srcCol), col(dstCol)).alias("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = ec.select(col("a").alias("node"))
      .union(ec.select(col("b").alias("node")))
      .groupBy("node").agg(count(lit(1)).alias("degree"))
    // orient each edge from the lower-(degree, node) endpoint
    val oriented = ec
      .join(deg.select(col("node").alias("a"), col("degree").alias("__da")), Seq("a"))
      .join(deg.select(col("node").alias("b"), col("degree").alias("__db")), Seq("b"))
      .select(
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).alias("src"),
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).alias("dst"))
    val wedges = oriented.alias("e1")
      .join(oriented.alias("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").alias("u"),
        least(col("e1.dst"), col("e2.dst")).alias("v"),
        greatest(col("e1.dst"), col("e2.dst")).alias("w"))
    val tris = wedges.join(ec,
      wedges("v") === ec("a") && wedges("w") === ec("b"))
      .select(col("u"), col("v"), col("w"))
    val nodeTri = tris
      .select(explode(array(col("u"), col("v"), col("w"))).alias("node"))
      .groupBy("node").agg(count(lit(1)).alias("triangles"))
    deg.join(nodeTri, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).alias("triangles"))
      .withColumn("clustering", when(col("degree") >= 2,
        lit(2.0) * col("triangles") / (col("degree") * (col("degree") - lit(1L)))))
  }

  /** RFM segmentation: per customer, recency (days from their last order
    * to the newest order in the table), frequency (order count), monetary
    * (exact integer total, e.g. cents — `amountCol` must be
    * integer-valued), each scored into `buckets` quantile tiles with
    * `ntile` over a TOTAL order (metric, then customer id — deterministic
    * under ties), segment = r·100 + f·10 + m. Recency tile 1 = most
    * recent; frequency/monetary tile 1 = highest. All-integer ⇒
    * engine-exact.
    *
    * Plan shape: one customer-keyed partial aggregate over the fact table,
    * then three ntile windows on the CUSTOMER-level aggregate — a
    * dimension-sized global sort (orders of magnitude below the fact
    * table; Spark range-partitions the sort, the unpartitioned window then
    * runs on the sorted dimension). Beyond ~10⁹ customers swap the exact
    * ntile for counts-against-quantile-threshold joins.
    * Output: (customer, recency_days, frequency, monetary, r, f, m,
    * rfm_segment). */
  def rfm(orders: DataFrame, custCol: String, dateCol: String,
      amountCol: String, buckets: Int = 5): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    // global max date as a 1-row broadcast (stays in-plan, no driver scalar)
    val maxD = orders.agg(max(col(dateCol)).alias("__maxd"))
    val perCust = orders.groupBy(col(custCol))
      .agg(max(col(dateCol)).alias("__lastd"),
        count(lit(1)).alias("frequency"),
        sum(graft.tsdf.Stats.integralOrFail(col(amountCol), "rfm"))
          .alias("monetary"))
      .crossJoin(broadcast(maxD))
      .withColumn("recency_days",
        datediff(col("__maxd"), col("__lastd")).cast(LongType))
      .drop("__maxd", "__lastd")
    val rW = Window.orderBy(col("recency_days").asc, col(custCol).asc)
    val fW = Window.orderBy(col("frequency").desc, col(custCol).asc)
    val mW = Window.orderBy(col("monetary").desc, col(custCol).asc)
    perCust
      .withColumn("r", ntile(buckets).over(rW).cast(LongType))
      .withColumn("f", ntile(buckets).over(fW).cast(LongType))
      .withColumn("m", ntile(buckets).over(mW).cast(LongType))
      .withColumn("rfm_segment", col("r") * 100L + col("f") * 10L + col("m"))
  }

  /** Kaplan–Meier survival estimator per group — the churn/retention
    * survival curve (time-to-event with right censoring: a user who is
    * still active at observation end contributes to the at-risk counts
    * but never to an event step).
    *
    * Exact construction: per (group, duration t) one aggregate gives
    * dᵢ (events) and total observations leaving at t; n_at_risk(tᵢ) =
    * N_group − Σ_{t<tᵢ} leavers, an INTEGER window cumsum (exact in any
    * accumulation order, unlike a float window). The curve steps only
    * at event times (dᵢ > 0, the KM definition); S(tᵢ) =
    * Π_{j≤i}(1 − dⱼ/nⱼ) is computed as a LEFT-TO-RIGHT fold over each
    * group's time-ordered step list — a fixed-order IEEE composition on
    * exact integers, so any engine replaying the same fold is
    * bit-identical (a window `product()` would NOT be: tree-shaped
    * accumulation reorders float multiplies).
    *
    * Scale shape: one map-side-combinable aggregate to the (group, t)
    * grid, one integer window, one collect_list BOUNDED by the distinct
    * event times per group (the per-group contract class of
    * [[sequencePattern]] — curves with more steps than fit one executor
    * row aren't plottable anyway). Output: (group…, t, d_events,
    * n_risk, survival). */
  def kaplanMeier(df: DataFrame, groupCols: Seq[String],
      durationCol: Column, eventCol: Column): DataFrame = {
    require(groupCols.nonEmpty, "kaplanMeier needs at least one group col")
    val g = groupCols.map(col)
    val byT = df
      .select(g :+ durationCol.cast(LongType).alias("t") :+
        eventCol.alias("__ev"): _*)
      .filter(col("t").isNotNull && col("__ev").isNotNull)
      .groupBy(g :+ col("t"): _*)
      .agg(sum(when(col("__ev"), 1L).otherwise(0L)).alias("d"),
        count(lit(1)).alias("obs"))
    kaplanMeierFromGrid(byT, groupCols)
  }

  /** The [[kaplanMeier]] tail over an already-counted (group…, t, d,
    * obs) grid — the grid counts are ADDITIVE, so a folded streaming
    * delta sink ([[graft.streaming.StreamingTSDF.kmDeltas]]) lands on
    * the identical curve (the q_stream_pmi discipline). */
  def kaplanMeierFromGrid(byT: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    val risk = byT
      .withColumn("n_risk",
        sum(col("obs")).over(wAll) -
          (sum(col("obs")).over(wOrd) - col("obs")))
    val steps = risk.filter(col("d") > 0)
      .groupBy(g: _*)
      .agg(sort_array(collect_list(
        struct(col("t"), col("d"), col("n_risk")))).alias("__st"))
    // left-to-right survival scan; the accumulator carries the running
    // product and the emitted prefix (single-level fold — no nesting)
    val surv = aggregate(
      col("__st"),
      struct(lit(1.0).alias("s"),
        array().cast(ArrayType(DoubleType)).alias("ss")),
      (acc, x) => {
        val sNew = acc.getField("s") *
          (lit(1.0) - x.getField("d").cast(DoubleType) /
            x.getField("n_risk").cast(DoubleType))
        struct(sNew.alias("s"),
          concat(acc.getField("ss"), array(sNew)).alias("ss"))
      },
      acc => acc.getField("ss"))
    steps.withColumn("__surv", surv)
      .select(g ++ Seq(col("__surv"),
        posexplode(col("__st")).as(Seq("__i", "__x"))): _*)
      .select(g ++ Seq(
        col("__x.t").alias("t"),
        col("__x.d").alias("d_events"),
        col("__x.n_risk").alias("n_risk"),
        element_at(col("__surv"), (col("__i") + 1).cast(IntegerType))
          .alias("survival")): _*)
  }
}
