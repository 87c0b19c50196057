package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The single-pass PQ trainer must reproduce the per-subspace form exactly:
  * same seeds (hash reads only the id, so every subspace seeds from the same
  * rows), same Lloyd updates (integer-quantized vectors make the per-cell
  * sums exact in IEEE doubles, so aggregation order is immaterial). */
class PqTrainerSpec extends SparkTestBase {

  test("single-pass PQ trainer is bit-identical to per-subspace trainers") {
    val spark2 = spark
    import spark2.implicits._
    val dim = 16
    val m = 4
    val subDim = dim / m
    val vecs = (0 until 200).map { i =>
      (i.toLong, (0 until dim).map(d => ((i * 37 + d * 11) % 23 - 11).toDouble))
    }.toDF("id", "v")
    val onePass =
      Similarity.trainPqCodebooks(vecs, "id", "v", dim, m, ks = 8, iters = 3)
    val perSub = (0 until m).map { i =>
      val sub = vecs.select(col("id"),
        slice(col("v"), i * subDim + 1, subDim).alias("__sub"))
      Similarity.trainIvfCodebook(sub, "id", "__sub", nlist = 8, iters = 3)
    }
    assert(onePass == perSub)
  }

  test("zero iterations returns the sliced seeds") {
    val spark2 = spark
    import spark2.implicits._
    val vecs = (0 until 50).map { i =>
      (i.toLong, (0 until 8).map(d => ((i * 13 + d) % 7).toDouble))
    }.toDF("id", "v")
    val cb = Similarity.trainPqCodebooks(vecs, "id", "v", dim = 8, m = 2,
      ks = 4, iters = 0)
    assert(cb.size == 2 && cb.forall(_.size == 4) &&
      cb.forall(_.forall(_.size == 4)))
  }
}
