package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's custom expressions.
  *
  * Register via `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`); SQL users
  * then call e.g. `SELECT graft_poly_hash(text) FROM docs` and get the same
  * codegen'd expression the DataFrame API uses — no UDF registration, no
  * serialization penalty, full Catalyst optimization (constant folding,
  * null propagation) included.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.polyHashDescriptor)
  }
}

object GraftExtensions {
  val polyHashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_poly_hash"),
    new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_poly_hash takes exactly one argument")
      PolyHash(children.head)
    })

  /** Imperative registration on an already-running session (notebooks / REPLs
    * that can't pass `spark.sql.extensions` at startup). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftColumns.registerFunction(spark, polyHashDescriptor)
}
