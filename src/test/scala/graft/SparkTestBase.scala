package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + chispa-style DataFrame equality for golden tests.
  * Mirrors the reference harness settings (tests/base.py:250-273):
  * shuffle.partitions=1, UTC session timezone; equality ignores column
  * order, nullability and metadata (base.py:390-427). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkTestBase.session

  /** Strip nullability (and metadata) recursively; lowercase names. */
  private def normalize(dt: DataType): DataType = dt match {
    case st: StructType =>
      StructType(st.fields.map(f =>
        StructField(f.name.toLowerCase, normalize(f.dataType))))
    case ArrayType(et, _) => ArrayType(normalize(et))
    case MapType(k, v, _) => MapType(normalize(k), normalize(v))
    case other => other
  }

  private def canon(v: Any): Any = v match {
    case t: java.sql.Timestamp => t.getTime
    case t: java.time.Instant => t.toEpochMilli
    case d: java.sql.Date => d.toString
    case f: java.lang.Float => f.toDouble
    case b: java.math.BigDecimal => b.doubleValue()
    case b: scala.math.BigDecimal => b.doubleValue
    case r: Row => r.toSeq.map(canon)
    case s: Seq[_] => s.map(canon)
    case x => x
  }

  /** Doubles compare with a small relative tolerance: our operators are
    * re-expressed Catalyst plans, not transcriptions, so last-ulp drift vs
    * the reference goldens is expected and fine. */
  private def valEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Double, y: Double) =>
      (x.isNaN && y.isNaN) || x == y ||
        math.abs(x - y) <= 1e-6 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    case _ => a == b
  }

  private def sortKey(vals: Seq[Any]): String = vals.map {
    case d: Double => f"$d%.6f"
    case other => String.valueOf(other)
  }.mkString("")

  def assertDfEquality(actual: DataFrame, expected: DataFrame): Unit = {
    val aSchema = actual.schema.fields
      .map(f => f.name.toLowerCase -> normalize(f.dataType)).sortBy(_._1).toSeq
    val eSchema = expected.schema.fields
      .map(f => f.name.toLowerCase -> normalize(f.dataType)).sortBy(_._1).toSeq
    assert(aSchema == eSchema,
      s"schemas differ:\n  actual:   $aSchema\n  expected: $eSchema")
    val cols = expected.columns.sorted.toSeq
    def rowsOf(df: DataFrame): Seq[Seq[Any]] =
      df.select(cols.map(col): _*).collect().toSeq
        .map(_.toSeq.map(canon)).sortBy(sortKey)
    val aRows = rowsOf(actual)
    val eRows = rowsOf(expected)
    assert(aRows.size == eRows.size,
      s"row counts differ: actual ${aRows.size} vs expected ${eRows.size}")
    aRows.zip(eRows).zipWithIndex.foreach { case ((ar, er), i) =>
      val ok = ar.size == er.size && ar.zip(er).forall { case (a, b) => valEq(a, b) }
      assert(ok, s"row $i differs (columns $cols):\n  actual:   $ar\n  expected: $er")
    }
  }

  def assertTsdfEquality(actual: tsdf.TSDF, expected: DataFrame): Unit =
    assertDfEquality(actual.df, expected)
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
