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

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {

  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def unary(name: String, clazz: Class[_],
      build: Expression => Expression): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 1, s"$name takes exactly one argument")
      build(children.head)
    })

  private def binary(name: String, clazz: Class[_],
      build: (Expression, Expression) => Expression): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"$name takes exactly two arguments")
      build(children.head, children(1))
    })

  val polyHashDescriptor: Descriptor =
    unary("graft_poly_hash", classOf[PolyHash], (c: Expression) => PolyHash(c))

  val dotDescriptor: Descriptor =
    binary("graft_dot", classOf[DotProduct], DotProduct.apply)

  val l2SqDescriptor: Descriptor =
    binary("graft_l2sq", classOf[L2SqDistance], L2SqDistance.apply)

  val sortedIntersectSizeDescriptor: Descriptor =
    binary("graft_sorted_intersect_size", classOf[SortedIntersectSize],
      SortedIntersectSize.apply)

  val zorderDescriptor: Descriptor = (
    FunctionIdentifier("graft_zorder"),
    new ExpressionInfo(MortonInterleave.getClass.getName, "graft_zorder"),
    (children: Seq[Expression]) => MortonInterleave(children))

  /** graft_hilbert(bits, x, y): bits must be a foldable integer literal
    * (the curve order is a plan constant, like a window frame size). */
  val hilbertDescriptor: Descriptor = (
    FunctionIdentifier("graft_hilbert"),
    new ExpressionInfo(HilbertIndex.getClass.getName, "graft_hilbert"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "graft_hilbert takes (bits, x, y)")
      require(children.head.foldable,
        "graft_hilbert bits must be a literal")
      val bits = children.head.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_hilbert bits must be an integer literal, got $other")
      }
      Hilbert2(bits, children(1), children(2))
    })

  val descriptors: Seq[Descriptor] =
    Seq(polyHashDescriptor, dotDescriptor, l2SqDescriptor,
      sortedIntersectSizeDescriptor, zorderDescriptor, hilbertDescriptor)

  /** Imperative registration on an already-running session (notebooks / REPLs
    * that can't pass `spark.sql.extensions` at startup). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach(
      org.apache.spark.sql.GraftColumns.registerFunction(spark, _))
}
