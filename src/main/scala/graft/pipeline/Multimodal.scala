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
  *
  * The stub arithmetic is the engine-agnostic [[Hashing]] polynomial, so for
  * ASCII payloads (bytes == codepoints) a DuckDB oracle can replay both the
  * metadata struct and the extracted features bit-for-bit — the plumbing is
  * correctness-gated even though the codec is fake.
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
    * STUB: deterministic pseudo-metadata derived from byte length + payload
    * hash (pure Column algebra — stays in codegen). */
  def withMediaMeta(df: DataFrame, payloadCol: String,
      metaCol: String = "media_meta"): DataFrame = {
    val p = col(payloadCol)
    val n = length(p) // byte length for binary columns
    val h = Hashing.polyHash(p.cast(StringType))
    df.withColumn(metaCol, struct(
      when(pmod(n, lit(3)) === 0, "image").when(pmod(n, lit(3)) === 1, "audio")
        .otherwise("video").alias("media_type"),
      when(pmod(n, lit(2)) === 0, "jpeg").otherwise("wav").alias("format"),
      (pmod(Hashing.mix(h, 0), lit(1024)) + 32).cast(IntegerType).alias("width"),
      (pmod(Hashing.mix(h, 1), lit(1024)) + 32).cast(IntegerType).alias("height"),
      pmod(Hashing.mix(h, 2), lit(60000)).alias("duration_ms")))
  }

  /** Feature seeds start above the metadata seeds (0..2). */
  private val FeatureSeedBase = 16

  /** Deterministic fake decode: payload bytes → fixed-length feature vector
    * with 3-decimal values in [0, 1).
    * ??? REAL CODEC GOES HERE — the signature (bytes in, numeric features
    * out, batch-iterated per partition) is the production contract. */
  def decodeStub(bytes: Array[Byte], featureDim: Int): Array[Double] = {
    val h = Hashing.polyHashBytes(bytes)
    Array.tabulate(featureDim)(i =>
      (Hashing.mixLong(h, FeatureSeedBase + i) % 1000L) / 1000.0)
  }

  /** Feature extraction over the payload column via `mapPartitions` — rows
    * stream through in executor-sized batches; the decode call sits behind
    * [[decodeStub]]. Output: (idCol, features array<double>). */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
      featureDim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("features", ArrayType(DoubleType))))
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

  /** Deterministic fake resize: payload bytes → a byte stream sized to the
    * target dimensions (1 byte per 256 pixels, floor 16).
    * ??? REAL RESIZE GOES HERE — the signature (bytes + target dims in,
    * bytes out, batch-iterated per partition) is the production contract. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(16, w * h / 256)
    val hash = Hashing.polyHashBytes(bytes)
    Array.tabulate(n)(i => (Hashing.mixLong(hash, i) % 256L).toByte)
  }

  /** Resize image payloads to `targetW`×`targetH` via `mapPartitions`;
    * non-image rows pass through untouched. Output keeps the input schema:
    * the payload column is replaced and the metadata struct's width/height
    * updated. The codec sits behind [[resizeStub]]. */
  def resizeImages(df: DataFrame, idCol: String, payloadCol: String,
      metaCol: String, targetW: Int, targetH: Int): DataFrame = {
    val schema = StructType(Seq(
      df.schema(idCol),
      StructField(payloadCol, BinaryType),
      df.schema(metaCol)))
    df.select(col(idCol), col(payloadCol), col(metaCol))
      .mapPartitions { it =>
        it.map { r =>
          val meta = r.getStruct(2)
          if (meta != null && meta.getAs[String]("media_type") == "image") {
            val bytes = r.getAs[Array[Byte]](1)
            val resized = resizeStub(
              if (bytes == null) Array.emptyByteArray else bytes, targetW, targetH)
            Row(r.get(0), resized, Row(meta.get(0), meta.get(1),
              targetW, targetH, meta.get(4)))
          } else Row(r.get(0), r.get(1), meta)
        }
      }(Encoders.row(schema))
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
