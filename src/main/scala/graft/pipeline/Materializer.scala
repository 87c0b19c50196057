package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Pluggable plan-boundary materializer — the seam behind every
  * multi-consumer checkpoint in the pipeline operators (winnow
  * fingerprints, curation survivor frontier, connected-component edge
  * frontiers).
  *
  * Why a seam: `localCheckpoint` is the right PLAN boundary (it stops
  * differently-pruned consumer subtrees from re-running a shared scan —
  * the Curation.curate ReuseExchange finding) but the wrong FAILURE
  * domain at cluster scale: its blocks are non-replicated executor-local
  * state, so on a real 100-TB cluster a lost executor kills the job
  * mid-pipeline instead of recomputing. The mode picks the tradeoff at
  * runtime, per SparkSession, with no operator code change:
  *
  *  - `local` (default): `localCheckpoint` — fastest, single-process
  *    and bench scale; executor loss loses the blocks.
  *  - `reliable`: `Dataset.checkpoint` into the configured directory
  *    (replicated/durable storage on a cluster) — survives executor
  *    loss; pays a write to the checkpoint filesystem.
  *  - `parquet`: an explicit parquet round-trip under the configured
  *    directory — durable AND re-readable by later jobs (the restart
  *    story a multi-day 100-TB pipeline actually wants); always eager
  *    by construction — CALLER-FACING CAVEAT: in this mode, merely
  *    CONSTRUCTING an operator's plan (e.g. calling `winnowSimilarity`
  *    or `Curation.curate` without ever executing the result) runs the
  *    corpus-scale write job at each boundary, including eager=false
  *    ones. That eagerness is the point of the mode (each boundary is
  *    a restartable artifact), but pick `local`/`reliable` when plans
  *    are built speculatively. Each boundary writes under a per-app
  *    subdirectory `<dir>/<spark.app.id>/mat_<uuid>`, and the whole
  *    per-app subdirectory is deleted at application end (a listener
  *    registered on first use); iterative loops (one eager boundary
  *    per star round) therefore do not leak directories past the app's
  *    life. If the JVM dies hard, the orphaned `<dir>/<appId>` is
  *    re-readable state by design — purge it externally once the
  *    pipeline is known not to restart from it.
  *  - `none`: no materialization at LAZY boundaries — fully declarative
  *    plans (shared subtrees may recompute; ReuseExchange applies where
  *    it can). Eager boundaries ignore `none` and stay `local`: they sit
  *    inside iterative loops (connected-components star rounds) whose
  *    plans DOUBLE per round without a lineage cut — measured: the
  *    driver's analyzer spins in TreeNode.exists on the exponential
  *    tree long before any executor runs. A lineage cut there is
  *    correctness-of-termination, not an optimization.
  *
  * Modes `reliable`/`parquet` read the directory from
  * `spark.graft.materializer.dir` (for `reliable`, only when the
  * SparkContext has no checkpoint dir set yet). */
object Materializer {
  val ModeKey = "spark.graft.materializer"
  val DirKey = "spark.graft.materializer.dir"

  /** Materialize `df` at a plan boundary under the session-configured
    * mode. `eager` asks for compute-now semantics (iterative frontiers:
    * the loop's next convergence probe needs the data anyway); lazy
    * boundaries defer to first consumer. `parquet` mode is always
    * eager; `none` downgrades lazy boundaries only (see object doc). */
  def apply(df: DataFrame, eager: Boolean): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "none" => if (eager) df.localCheckpoint(true) else df
      case "local" => df.localCheckpoint(eager)
      case "reliable" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(
          spark.conf.get(DirKey))
        df.checkpoint(eager)
      case "parquet" =>
        val appDir = spark.conf.get(DirKey).stripSuffix("/") + "/" +
          spark.sparkContext.applicationId
        registerCleanup(spark, appDir)
        val dir = appDir + "/mat_" + java.util.UUID.randomUUID().toString
        df.write.parquet(dir)
        spark.read.schema(df.schema).parquet(dir)
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be one of none|local|reliable|parquet, got '$other'")
    }
  }

  // one cleanup listener per (context, appDir) — parquet-mode boundaries
  // accumulate one mat_<uuid> directory each (one PER ROUND in iterative
  // loops), all under the per-app subdir, deleted at application end
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def registerCleanup(spark: org.apache.spark.sql.SparkSession,
      appDir: String): Unit = {
    val key = spark.sparkContext.applicationId + "|" + appDir
    if (cleanupRegistered.add(key)) {
      val hconf = spark.sparkContext.hadoopConfiguration
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              end: org.apache.spark.scheduler.SparkListenerApplicationEnd)
              : Unit = {
            try {
              val p = new org.apache.hadoop.fs.Path(appDir)
              val fs = p.getFileSystem(hconf)
              fs.delete(p, true)
            } catch { case _: Exception => () } // best-effort; orphan is re-readable state
          }
        })
    }
  }
}
