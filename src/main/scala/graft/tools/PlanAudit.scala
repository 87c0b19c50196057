package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of registry queries — the scale
  * audit loop: check exchanges, broadcast choices, scan pruning and
  * WholeStageCodegen spans without leaving sbt.
  *
  * Usage: runMain graft.tools.PlanAudit <sfDir> <query> [query...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"\n===== $name =====")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
