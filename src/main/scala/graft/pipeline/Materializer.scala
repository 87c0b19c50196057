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
  *    by construction.
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
        val dir = spark.conf.get(DirKey).stripSuffix("/") + "/mat_" +
          java.util.UUID.randomUUID().toString
        df.write.parquet(dir)
        spark.read.schema(df.schema).parquet(dir)
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be one of none|local|reliable|parquet, got '$other'")
    }
  }
}
