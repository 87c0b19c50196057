package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the sanity pass a pipeline runs on every
  * new source before trusting it (completeness and cardinality drive
  * schema checks, join-key selection, and partition-column choices).
  *
  * Reference scope note: tempo has no profiler; this serves the
  * training-data pipeline side.
  */
object Profile {

  /** Per-column completeness + cardinality: one row per profiled column
    * with (column, n_rows, n_nonnull, n_distinct). Distinct counts are
    * EXACT (count(DISTINCT) — Catalyst plans one pass via Expand, at the
    * cost of a row-multiplying shuffle by the number of profiled columns);
    * at corpus scale profile a sample, or swap the cardinality leg for
    * [[Sketch.kmvDistinct]] (deterministic estimate, one distinct per
    * column). The wide aggregate pivots to long form with an array-explode
    * — no second pass, no driver round-trip. */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = count(lit(1)).alias("__n") +:
      cols.flatMap(c => Seq(
        count(col(c)).alias(s"__nn_$c"),
        countDistinct(col(c)).alias(s"__nd_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map(c =>
      struct(lit(c).alias("column"), col("__n").alias("n_rows"),
        col(s"__nn_$c").alias("n_nonnull"),
        col(s"__nd_$c").alias("n_distinct"))): _*)
    wide.select(explode(entries).alias("__e")).select(col("__e.*"))
  }
}
