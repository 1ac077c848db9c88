package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated repro of the bench's scale_cc block (1M pairs + 1000-hop chain)
  * for iterating on dedupClusters' per-round shuffle count. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val chain = spark.range(1000).selectExpr("id AS a", "id + 1 AS b")
    val rest = spark.range(999000L).selectExpr(
      "2000 + id * 2 AS a", "2001 + id * 2 AS b")
    val ccPairs = chain.union(rest)
    val ccDocs = spark.range(2000L + 2L * 999000L).toDF("doc_id")
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.dedupClusters(ccDocs, "doc_id", ccPairs)
      out.unpersist()
      println(f"round=$round rounds=${graft.ops.Dedup.lastClusterRounds.get()} " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
