package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The media near-dup ENGINE folds clamp band buckets at
  * maxBucketSize = 4096 while the DuckDB oracle replays the UNCLAMPED
  * pair set — equivalence holds only while no fixture band bucket
  * exceeds the clamp (buckets ≤ c keep the exact pair set: nSub = 1,
  * pool = whole bucket). This gate asserts that invariant at the
  * correctness scale factor, so a future fixture/scale change that
  * silently turns the recall clamp into an oracle mismatch fails HERE
  * with the real bucket number instead of as an opaque hash diff
  * (r17 ADVICE item). */
class ClampInvariantSpec extends SparkTestBase {

  private val clamp = 4096

  private def maxBandBucket(sigs: DataFrame, hi: String, lo: String): Long = {
    val dsig = sigs.select(col(hi).alias("__hi"), col(lo).alias("__lo"))
      .distinct()
    val banded = dsig.select(posexplode(array(
      col("__lo").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("__lo"), 16).bitwiseAND(lit(0xFFFFL)),
      col("__hi").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("__hi"), 16).bitwiseAND(lit(0xFFFFL))))
      .as(Seq("band_idx", "band_val")))
    val top = banded.groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).alias("n"))
      .agg(max(col("n"))).collect()
    if (top.head.isNullAt(0)) 0L else top.head.getLong(0)
  }

  test("correctness-sf media fixtures keep every band bucket under the " +
      "engine clamp (oracle replays the unclamped pair set)") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val ids = docs.select(col("doc_id")).repartition(8)

    // q_video_neardup fixture
    val vkf = Video.keyframePHashes(
      Video.synthesizeAviNearDupPayload(ids, "doc_id"), "doc_id", "payload")
    val vMax = maxBandBucket(vkf, "phash_hi", "phash_lo")
    assert(vMax < clamp, s"video fixture band bucket $vMax >= $clamp")

    // q_audio_neardup fixture
    val ahk = Multimodal.hkFingerprints(
      Multimodal.synthesizeWavNearDupPayload(ids, "doc_id"),
      "doc_id", "payload")
    val aMax = maxBandBucket(ahk, "hk_hi", "hk_lo")
    assert(aMax < clamp, s"audio fixture band bucket $aMax >= $clamp")

    // q_image_neardup / media e2e image arm: dHash signatures band on the
    // 4 x 16-bit halves directly
    val ih = Multimodal.imageDHash(
      Multimodal.synthesizeDecodablePayload(
        ids.filter(col("doc_id") % 4 <= 1), "doc_id"), "doc_id", "payload")
    val iTop = ih.select(col("dhash_hi"), col("dhash_lo"),
        col("band0"), col("band1"), col("band2"), col("band3"))
      .distinct()
      .select(posexplode(array(col("band0"), col("band1"), col("band2"),
        col("band3"))).as(Seq("band_idx", "band_val")))
      .groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).alias("n"))
      .agg(max(col("n"))).collect()
    val iMax = if (iTop.head.isNullAt(0)) 0L else iTop.head.getLong(0)
    assert(iMax < clamp, s"image fixture band bucket $iMax >= $clamp")
  }
}
