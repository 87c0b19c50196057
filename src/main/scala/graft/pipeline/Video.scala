package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MJPEG-in-AVI video: REAL container walk + REAL per-frame JPEG decode.
  *
  * The one video codec the engine can take end to end with zero native
  * dependencies: AVI is a plain RIFF container (the WAV chunk machinery
  * generalized — lists nest, chunks are word-aligned), and each MJPEG
  * frame is an ordinary baseline JFIF payload that [[Jpeg.decodeJpeg]]
  * already decodes bit-identically to ImageIO. Container arithmetic is
  * public structure (MSDN AVI RIFF reference / OpenDML AVI spec);
  * reference scope: tempo has no media path at all — this serves the
  * multimodal curation side of a 100 TB corpus, where "can we decode it"
  * is itself a data-quality signal.
  *
  * Scale shape: payload bytes never shuffle — synthesis/decode are
  * per-partition maps; the only exchange in the query plans is the cheap
  * id-spread repartition BEFORE the expansion (the decodePng lesson:
  * a few-KB id scan otherwise collapses the whole decode onto 1-2 input
  * partitions). */
object Video {

  /** Parsed MJPEG AVI: stream timing as the exact (rate, scale) rational
    * from `strh` — frame i covers [i·scale/rate, (i+1)·scale/rate) s —
    * plus the raw JFIF payload of every `##dc`/`##db` movi chunk. */
  final case class AviMjpeg(width: Int, height: Int, rate: Int, scale: Int,
      frames: IndexedSeq[Array[Byte]]) {
    def nFrames: Int = frames.length
    /** Total duration in ms, floor — nFrames·scale·1000 / rate. */
    def durationMs: Long = nFrames.toLong * scale * 1000L / rate
  }

  private def tag(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private final class W {
    val out = new java.io.ByteArrayOutputStream()
    def t(s: String): Unit = { require(s.length == 4); s.foreach(c => out.write(c)) }
    def i32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    def i16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
  }

  /** Minimal spec-valid MJPEG AVI: RIFF('AVI ') { LIST hdrl { avih,
    * LIST strl { strh(vids/MJPG, rate=fps, scale=1), strf(BITMAPINFOHEADER,
    * biCompression='MJPG') } }, LIST movi { '00dc' jfif ... } }. Chunks are
    * word-aligned (odd payloads get a pad byte) per RIFF. */
  def buildAviMjpeg(width: Int, height: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps > 0 && width > 0 && height > 0 && frames.nonEmpty)
    // strh(8+56) + strf(8+40) + 'strl'
    val strlSize = 4 + 64 + 48
    // avih(8+56) + LIST strl + 'hdrl'
    val hdrlSize = 4 + 64 + 8 + strlSize
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val moviSize = 4 + moviBody
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    val w = new W
    w.t("RIFF"); w.i32(riffSize); w.t("AVI ")
    w.t("LIST"); w.i32(hdrlSize); w.t("hdrl")
    w.t("avih"); w.i32(56)
    w.i32(1000000L / fps) // µs/frame (informational; strh carries the rational)
    w.i32(0); w.i32(0); w.i32(0) // maxBytesPerSec, padding, flags
    w.i32(frames.length); w.i32(0); w.i32(1); w.i32(0) // totalFrames, initial, streams, bufSize
    w.i32(width); w.i32(height)
    w.i32(0); w.i32(0); w.i32(0); w.i32(0) // reserved[4]
    w.t("LIST"); w.i32(strlSize); w.t("strl")
    w.t("strh"); w.i32(56)
    w.t("vids"); w.t("MJPG"); w.i32(0) // fccType, fccHandler, flags
    w.i16(0); w.i16(0) // priority, language
    w.i32(0) // initialFrames
    w.i32(1); w.i32(fps) // scale, rate → fps frames/s exactly
    w.i32(0); w.i32(frames.length) // start, length (in frames)
    w.i32(0); w.i32(0); w.i32(0) // suggestedBufferSize, quality, sampleSize
    w.i16(0); w.i16(0); w.i16(width); w.i16(height) // rcFrame
    w.t("strf"); w.i32(40)
    w.i32(40); w.i32(width); w.i32(height) // biSize, biWidth, biHeight
    w.i16(1); w.i16(24) // biPlanes, biBitCount
    w.t("MJPG") // biCompression
    w.i32(width.toLong * height * 3) // biSizeImage
    w.i32(0); w.i32(0); w.i32(0); w.i32(0) // pels/clr fields
    w.t("LIST"); w.i32(moviSize); w.t("movi")
    frames.foreach { f =>
      w.t("00dc"); w.i32(f.length); w.out.write(f, 0, f.length)
      if ((f.length & 1) == 1) w.out.write(0) // RIFF word alignment
    }
    w.out.toByteArray
  }

  /** Walk an MJPEG AVI container: header timing from `strh` (vids/MJPG
    * only), frame payloads from the `movi` list's `##dc`/`##db` chunks
    * (including `rec ` sub-lists). Returns None on any malformed or
    * non-MJPEG structure; declared sizes are bounds-checked in Long (a
    * hostile 32-bit length must not wrap an index negative — the
    * decodePng lesson). The JFIF payloads come back raw: pair with
    * [[Jpeg.decodeJpeg]] for pixels, or count them for coverage. */
  def parseAviMjpeg(bytes: Array[Byte]): Option[AviMjpeg] = {
    if (bytes == null || bytes.length < 12 ||
        tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return None
    var width = 0; var height = 0
    var rate = 0; var scale = 0
    var mjpeg = false
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    // one recursive list walk serves hdrl, strl, movi, and rec alike
    def walk(from: Long, to: Long, inMovi: Boolean): Boolean = {
      var o = from
      while (o + 8 <= to) {
        val oi = o.toInt
        val id = tag(bytes, oi)
        val sz = le32(bytes, oi + 4)
        val body = o + 8
        if (body + sz > to) return false // declared length escapes parent
        if (id == "LIST") {
          if (sz < 4) return false
          val lt = tag(bytes, body.toInt)
          if (!walk(body + 4, body + sz, inMovi || lt == "movi" || lt == "rec "))
            return false
        } else if (id == "avih") {
          if (sz < 56) return false
          width = le32(bytes, oi + 8 + 32).toInt
          height = le32(bytes, oi + 8 + 36).toInt
        } else if (id == "strh") {
          if (sz < 56) return false
          if (tag(bytes, oi + 8) == "vids") {
            mjpeg = tag(bytes, oi + 12) == "MJPG"
            scale = le32(bytes, oi + 8 + 20).toInt
            rate = le32(bytes, oi + 8 + 24).toInt
          }
        } else if (inMovi && id.length == 4 &&
            id(0).isDigit && id(1).isDigit &&
            (id.substring(2) == "dc" || id.substring(2) == "db")) {
          if (sz > Int.MaxValue) return false
          frames += java.util.Arrays.copyOfRange(bytes, body.toInt,
            (body + sz).toInt)
        }
        o = body + sz + (sz & 1L) // word alignment
      }
      true
    }
    val total = 8L + le32(bytes, 4)
    if (total > bytes.length) return None
    if (!walk(12L, total, inMovi = false)) return None
    val fs = frames.result()
    if (!mjpeg || rate <= 0 || scale <= 0 || width <= 0 || height <= 0 ||
        fs.isEmpty) None
    else Some(AviMjpeg(width, height, rate, scale, fs))
  }

  /** Deterministic MJPEG-AVI fixture column — the
    * [[Jpeg.synthesizeJpegPayload]] discipline, video edition: every
    * container field and every frame's 8×8 block constants derive from the
    * id, so the oracle restates per-frame decoded sums in SQL while the
    * engine must genuinely walk RIFF lists AND huffman-decode + IDCT each
    * frame:
    *  - fps = 2 + id % 4, frames n = 3 + id % 5
    *  - width = 8·(1 + id % 3), height = 8·(1 + (id·2) % 3)
    *  - frame f, block(bx, by) = (id % 251 + 29·f + 17·by + 23·bx) % 256 */
  def synthesizeAviPayload(df: DataFrame, idCol: String,
      payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(payloadCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        Row.fromSeq(r.toSeq :+ aviPayloadFor(r.getLong(idIdx)))
      }
    }(Encoders.row(outSchema)).toDF()
  }

  /** The single-payload form of [[synthesizeAviPayload]]'s arithmetic. */
  private[pipeline] def aviPayloadFor(id: Long): Array[Byte] = {
    val fps = (2 + id % 4).toInt
    val n = (3 + id % 5).toInt
    val w = (8 * (1 + id % 3)).toInt
    val h = (8 * (1 + (id * 2) % 3)).toInt
    val base = (id % 251).toInt
    val frames = (0 until n).map { f =>
      Jpeg.buildJpegWithBlocks(w, h,
        (bx, by) => (base + 29 * f + 17 * by + 23 * bx) % 256)
    }
    buildAviMjpeg(w, h, fps, frames)
  }

  /** Per-frame pixel statistics through the REAL container walk + REAL
    * JPEG decode: one output row per (video, frame). Undecodable frames
    * and unparseable containers are dropped ([[Jpeg.jpegPixelStats]]
    * convention); per-partition map, no shuffle. */
  def videoFrameStats(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", LongType), StructField("sample_sum", LongType)))
    df.select(col(idCol), col(payloadCol))
      .mapPartitions { it =>
        it.flatMap { r =>
          parseAviMjpeg(r.getAs[Array[Byte]](1)).toSeq.flatMap { avi =>
            avi.frames.iterator.zipWithIndex.flatMap { case (jfif, f) =>
              Jpeg.decodeJpeg(jfif).map { img =>
                var s = 0L
                var i = 0
                while (i < img.samples.length) { s += img.samples(i); i += 1 }
                Row(r.get(0), f, img.width, img.height, img.channels,
                  img.samples.length.toLong, s)
              }
            }
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** REAL frame sampling: every `everyMs` on the stream clock, decode THE
    * frame covering that instant — index = ⌊ts·rate / (1000·scale)⌋ from
    * the exact strh rational — and emit its pixel sum. This is
    * [[Multimodal.sampleFramePlan]] taken all the way to pixels: the
    * lattice explode happens inside the partition map (bounded by the
    * clip's own frame count), payloads never shuffle. */
  def sampleVideoFrames(df: DataFrame, idCol: String, payloadCol: String,
      everyMs: Long): DataFrame = {
    require(everyMs > 0, "everyMs must be positive")
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_ts_ms", LongType),
      StructField("frame_idx", IntegerType),
      StructField("sample_sum", LongType)))
    df.select(col(idCol), col(payloadCol))
      .mapPartitions { it =>
        it.flatMap { r =>
          parseAviMjpeg(r.getAs[Array[Byte]](1)).toSeq.flatMap { avi =>
            // decode lazily and at most once per frame actually sampled
            val cache = new java.util.HashMap[Int, Long]()
            Iterator.iterate(0L)(_ + everyMs)
              .map(ts => (ts, (ts * avi.rate / (1000L * avi.scale)).toInt))
              .takeWhile(_._2 < avi.nFrames)
              .flatMap { case (ts, f) =>
                val sum = cache.computeIfAbsent(f, _ =>
                  Jpeg.decodeJpeg(avi.frames(f)).map { img =>
                    var s = 0L
                    var i = 0
                    while (i < img.samples.length) { s += img.samples(i); i += 1 }
                    s
                  }.getOrElse(Long.MinValue))
                if (sum == Long.MinValue) None
                else Some(Row(r.get(0), ts, f, sum))
              }
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }
}
