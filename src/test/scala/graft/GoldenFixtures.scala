package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tsdf.TSDF
import graft.intervals.IntervalsDF

/** Loader for the reference's golden JSON fixtures (the reference's
  * tests/unit_test_data JSON files, copied verbatim into test resources).
  * Implements the same contract as the reference harness
  * (tests/base.py:19-211,328-355): each test case holds named entries of
  * `{df: {schema: <DDL>, data: [[row]...], ts_convert/date_convert/
  * decimal_convert: [cols]}, tsdf|idf: <constructor kwargs>}`, with
  * jsonref-style `{"$ref": "#/path"}` sharing. */
class GoldenFixtures(spark: SparkSession, fileName: String) {

  private val mapper = new ObjectMapper()

  private val root: JsonNode = {
    val in = getClass.getResourceAsStream(s"/unit_test_data/$fileName")
    require(in != null, s"fixture file $fileName not found on test classpath")
    try mapper.readTree(in) finally in.close()
  }

  /** Resolve `$ref` pointers recursively (jsonref semantics). */
  private def resolve(node: JsonNode): JsonNode = node match {
    case obj: ObjectNode if obj.has("$ref") =>
      val path = obj.get("$ref").asText().stripPrefix("#/").split("/")
      resolve(path.foldLeft(root)((n, p) => n.get(p)))
    case obj: ObjectNode =>
      val out = mapper.createObjectNode()
      obj.fieldNames().asScala.foreach(k => out.set[JsonNode](k, resolve(obj.get(k))))
      out
    case arr: ArrayNode =>
      val out = mapper.createArrayNode()
      arr.elements().asScala.foreach(e => out.add(resolve(e)))
      out
    case other => other
  }

  /** The named entries of one test case, e.g. testCase("AsOfJoinTest",
    * "test_asof_join"). */
  def testCase(className: String, testName: String): JsonNode = {
    val cls = root.get(className)
    require(cls != null, s"$fileName has no class $className")
    val tc = cls.get(testName)
    require(tc != null, s"$fileName/$className has no test $testName")
    resolve(tc)
  }

  // ---------------------------------------------------------------- builders
  private def jsonToScala(node: JsonNode, dt: DataType): Any =
    if (node == null || node.isNull) null
    else dt match {
      case StringType => node.asText()
      case IntegerType => node.asInt()
      case LongType => node.asLong()
      case ShortType => node.asInt().toShort
      case ByteType => node.asInt().toByte
      case DoubleType => node.asDouble()
      case FloatType => node.asDouble().toFloat
      case BooleanType => node.asBoolean()
      case _: DecimalType => new java.math.BigDecimal(node.asText())
      case DateType => java.sql.Date.valueOf(node.asText())
      case TimestampType => java.sql.Timestamp.valueOf(node.asText())
      case st: StructType =>
        Row.fromSeq(st.fields.zipWithIndex.map { case (f, i) =>
          jsonToScala(node.get(i), f.dataType)
        }.toSeq)
      case ArrayType(et, _) =>
        (0 until node.size()).map(i => jsonToScala(node.get(i), et))
      case other => throw new IllegalArgumentException(s"unhandled type $other")
    }

  /** Apply a fixture conversion list (handles nested "col.field"). */
  private def convert(df: DataFrame, dfn: JsonNode, key: String,
      fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    if (!dfn.has(key)) df
    else dfn.get(key).elements().asScala.foldLeft(df) { (d, c) =>
      val name = c.asText()
      if (name.contains(".")) {
        val Array(parent, field) = name.split("\\.", 2)
        d.withColumn(parent, col(parent).withField(field, fn(col(parent).getField(field))))
      } else d.withColumn(name, fn(col(name)))
    }

  /** Build the Spark DataFrame of a fixture entry (base.py as_sdf). */
  /** pyspark accepts both "a INT, b STRING" and "a: INT, b: STRING" schema
    * strings (falling back to struct<...> parsing); mirror that. */
  private def parseSchema(ddl: String): StructType =
    try StructType.fromDDL(ddl)
    catch {
      case _: Exception =>
        DataType.fromDDL(s"struct<$ddl>").asInstanceOf[StructType]
    }

  def df(entry: JsonNode): DataFrame = {
    val dfn = entry.get("df")
    val schema = parseSchema(dfn.get("schema").asText())
    val dataNode = dfn.get("data")
    val rows: Seq[Row] =
      if (dataNode.isTextual) csvRows(dataNode.asText(), schema)
      else (0 until dataNode.size()).map { i =>
        val r = dataNode.get(i)
        Row.fromSeq(schema.fields.zipWithIndex.map { case (f, j) =>
          jsonToScala(r.get(j), f.dataType)
        }.toSeq)
      }
    val base = spark.createDataFrame(rows.asJava, schema)
    val withTs = convert(base, dfn, "ts_convert", to_timestamp(_))
    val withNtz = convert(withTs, dfn, "ts_convert_ntz", c => c.cast(TimestampNTZType))
    val withDate = convert(withNtz, dfn, "date_convert", to_date(_))
    convert(withDate, dfn, "decimal_convert", _.cast("decimal"))
  }

  private def csvRows(name: String, schema: StructType): Seq[Row] = {
    val in = getClass.getResourceAsStream(s"/unit_test_data/$name")
    require(in != null, s"csv fixture $name not found")
    val lines = scala.io.Source.fromInputStream(in).getLines().toList
    in.close()
    lines.drop(1).filter(_.nonEmpty).map { line =>
      val parts = line.split(",", -1)
      Row.fromSeq(schema.fields.zipWithIndex.map { case (f, i) =>
        val v = parts(i)
        if (v.isEmpty) null
        else f.dataType match {
          case StringType => v
          case IntegerType => v.toInt
          case LongType => v.toLong
          case DoubleType => v.toDouble
          case FloatType => v.toFloat
          case other => throw new IllegalArgumentException(s"csv type $other")
        }
      }.toSeq)
    }
  }

  private def optText(n: JsonNode, key: String): Option[String] =
    Option(n.get(key)).filterNot(_.isNull).map(_.asText())

  /** Build a TSDF from an entry's `tsdf` kwargs (base.py as_tsdf). String ts
    * columns go through the reference-parity [[TSDF.of]] conversion. */
  def tsdf(entry: JsonNode): TSDF = {
    val t = entry.get("tsdf")
    val tsCol = optText(t, "ts_col").getOrElse("event_ts")
    val pCols = Option(t.get("partition_cols")).map(p =>
      (0 until p.size()).map(p.get(_).asText())).getOrElse(Seq.empty)
    val seqCol = optText(t, "sequence_col")
    val sdf = df(entry)
    if (sdf.schema(tsCol).dataType == StringType) TSDF.of(sdf, tsCol, pCols, seqCol)
    else TSDF(sdf, tsCol, pCols, seqCol)
  }

  /** As [[tsdf]] but without the string-ts auto-conversion (for tests whose
    * goldens are stated on string/timestamp-converted columns). */
  def tsdfRaw(entry: JsonNode): TSDF = {
    val t = entry.get("tsdf")
    val tsCol = optText(t, "ts_col").getOrElse("event_ts")
    val pCols = Option(t.get("partition_cols")).map(p =>
      (0 until p.size()).map(p.get(_).asText())).getOrElse(Seq.empty)
    TSDF(df(entry), tsCol, pCols, optText(t, "sequence_col"))
  }

  /** Build an IntervalsDF from an entry's `idf` kwargs. */
  def idf(entry: JsonNode): IntervalsDF = {
    val t = entry.get("idf")
    val seriesIds = Option(t.get("series")).orElse(Option(t.get("series_ids")))
      .map(p => (0 until p.size()).map(p.get(_).asText())).getOrElse(Seq.empty)
    IntervalsDF(df(entry), t.get("start_ts").asText(), t.get("end_ts").asText(), seriesIds)
  }
}
