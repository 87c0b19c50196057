import org.apache.spark.sql.functions._
import graft.pipeline.Dedup
val docsDf = spark.read.parquet(sf + "/documents.parquet")
val banded0 = {
  val k = 16
  val sig = Dedup.minhashSignature(Dedup.shingles(col("text"), 2), k)
  docsDf.select(col("doc_id"), sig.alias("__sig"))
}
println("sig compute: " + time(banded0.count()))
val cands = Dedup.minhashCandidates(docsDf, "text", "doc_id", 2, 8, 2)
println("cands: " + time(cands.count()))
