package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, plus batch-shaped decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side mechanics — schema, partition sizing, per-partition batch
  * iteration, output shape — are real and tested. The *codec* itself is
  * STUBBED: this container has no image/audio libraries, so `decodeStub`
  * derives a deterministic fake decode from the payload bytes. Swap
  * `decodeStub` for a real codec (e.g. javacpp-ffmpeg / TwelveMonkeys) at
  * deployment; nothing else changes.
  */
object Multimodal {

  /** Canonical multimodal schema fragment. */
  val MediaMeta: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // e.g. jpeg, wav, mp4
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Attach a metadata struct inferred from payload headers.
    * STUB: deterministic pseudo-metadata derived from byte length/prefix. */
  def withMediaMeta(df: DataFrame, payloadCol: String,
      metaCol: String = "media_meta"): DataFrame = {
    val p = col(payloadCol)
    val n = length(p)
    df.withColumn(metaCol, struct(
      when(pmod(n, lit(3)) === 0, "image").when(pmod(n, lit(3)) === 1, "audio")
        .otherwise("video").alias("media_type"),
      when(pmod(n, lit(2)) === 0, "jpeg").otherwise("wav").alias("format"),
      (pmod(xxhash64(p), lit(1024)) + 32).cast(IntegerType).alias("width"),
      (pmod(xxhash64(p, lit(1)), lit(1024)) + 32).cast(IntegerType).alias("height"),
      pmod(xxhash64(p, lit(2)), lit(60000)).alias("duration_ms")))
  }

  /** Deterministic fake decode: payload bytes → fixed-length feature vector.
    * ??? REAL CODEC GOES HERE — the signature (bytes in, float features out,
    * batch-iterated per partition) is the production contract. */
  def decodeStub(bytes: Array[Byte], featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    i = 0
    while (i < featureDim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = ((h >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Feature extraction over the payload column via `mapPartitions` — rows
    * stream through in executor-sized batches; the decode call sits behind
    * [[decodeStub]]. Output: (idCol, features array<float>). */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
      featureDim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("features", ArrayType(FloatType))))
    val idIdx = 0
    df.select(col(idCol), col(payloadCol))
      .mapPartitions { it =>
        it.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          Row(r.get(idIdx), decodeStub(if (bytes == null) Array.emptyByteArray else bytes,
            featureDim).toSeq)
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** Deterministic frame sampling plan for video payloads: every `everyMs`
    * milliseconds within the (stubbed) duration — pure Column algebra, the
    * explode shape a real frame extractor plugs into. */
  def sampleFramePlan(df: DataFrame, idCol: String, metaCol: String,
      everyMs: Long): DataFrame =
    df.filter(col(s"$metaCol.media_type") === "video")
      .select(col(idCol),
        explode(sequence(lit(0L), col(s"$metaCol.duration_ms"), lit(everyMs)))
          .alias("frame_ts_ms"))
}
