package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) maintenance — the standard
  * warehouse shape for "what did this row look like at time t", built
  * from an append-only change log in one pass.
  *
  * 100 TB design: one window per id (the same shuffle any per-key
  * sessionization pays), no self-join, no driver state; re-running on a
  * longer log is idempotent because versions are a pure function of the
  * (id, ts)-ordered attribute sequence. Collapsing no-op updates BEFORE
  * the validity windows keeps output proportional to true changes, not
  * log volume (upstream systems love re-emitting unchanged rows).
  *
  * Reference scope note: tempo has no table-maintenance surface; this
  * serves the pipeline side (dimension snapshots for training-data joins
  * — "which label/config was live when this example was logged").
  */
object Cdc {

  /** Versioned rows from a change log: for each id, keep only rows whose
    * tracked attributes differ from the previous row (null-safe struct
    * compare), then derive `valid_from` = change ts, `valid_to` = next
    * change ts (null = still current), `is_current`.
    *
    * Version selection is only deterministic if the window order is total
    * per id: pass `tieCols` (e.g. a log sequence/offset column) whenever
    * (id, ts) pairs can repeat — with an empty `tieCols`, duplicate
    * (id, ts) rows make the kept version engine- AND partition-dependent,
    * so that shape is rejected up front via a one-pass duplicate probe
    * rather than silently producing unstable dimensions. Tie columns ride
    * the windows only; they are dropped from the output. */
  def scd2FromLog(log: DataFrame, idCol: String, tsCol: String,
      attrCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    require(tieCols.forall(c => !attrCols.contains(c) && c != idCol && c != tsCol),
      "tieCols must be distinct from id/ts/attr columns")
    val orderCols = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(idCol)).orderBy(orderCols: _*)
    val attrs = struct(attrCols.map(col): _*)
    val base = log
      .select(col(idCol) +: col(tsCol) +: (attrCols ++ tieCols).map(col): _*)
    if (tieCols.isEmpty) {
      // enforce the documented unique-(id, ts) precondition instead of
      // assuming it: one map-side-combinable count aggregate, failing fast
      // on the first duplicate natural key
      val dup = base.groupBy(col(idCol), col(tsCol))
        .agg(count(lit(1)).alias("__n")).filter(col("__n") > 1L).limit(1)
        .collect()
      require(dup.isEmpty,
        s"duplicate ($idCol, $tsCol) pairs in the change log (e.g. " +
          s"${dup.headOption.map(_.toSeq.take(2)).getOrElse(Nil)}): pass " +
          "tieCols (a sequence/offset column) for a total version order")
    }
    val changed = base
      .withColumn("__prev", lag(attrs, 1).over(w))
      // null-safe: first row (null prev) and genuine changes survive;
      // a no-op re-emit (prev <=> attrs) is dropped
      .filter(!(col("__prev") <=> attrs))
      .drop("__prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol +: tieCols: _*)
  }

  /** Point-in-time lookup against a [[scd2FromLog]] dimension: attach the
    * attribute version live at each fact row's timestamp (the training-
    * data join: label/config as of example time — no leakage from later
    * versions). Interval semantics [valid_from, valid_to); facts before
    * the first version get null attributes. Implemented as an equi-join
    * on the id plus validity-range predicates, so Catalyst plans a hash
    * join on the id (the range filter rides along) — no as-of sort pass
    * needed because versions per id are few. */
  def asOfLookup(facts: DataFrame, dim: DataFrame, idCol: String,
      factTsCol: String): DataFrame = {
    // unique names on the dim side — a post-join drop by Column can
    // resolve to the wrong twin of an ambiguous id
    val d = dim.columns.foldLeft(dim)((acc, c) =>
      acc.withColumnRenamed(c, if (c == idCol) "__dim_id" else s"dim_$c"))
    facts.join(d,
      facts(idCol) === d("__dim_id") &&
        facts(factTsCol) >= d("dim_valid_from") &&
        (d("dim_valid_to").isNull || facts(factTsCol) < d("dim_valid_to")),
      "left")
      .drop("__dim_id", "dim_is_current")
  }
}
