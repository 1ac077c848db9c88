package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-round wall trace of the bench's scale_cc shape (2M docs, ~1M pairs +
  * one 1,000-hop chain) — the r22 delta-overlay evidence probe. Run with
  * GRAFT_CC_DEBUG=1 to see per-round walls; overlay rounds print "overlay".
  * Repeats `reps` warm passes (first pass includes the bench's own 1/100
  * JIT warmup) and prints total walls + overlay round counts. */
object CcTrace {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val chain = spark.range(1000).selectExpr("id AS a", "id + 1 AS b")
    val restN = 999000L
    val rest = spark.range(restN).selectExpr(
      "2000 + id * 2 AS a", "2001 + id * 2 AS b")
    val ccPairs = chain.union(rest)
    val ccDocs = spark.range(2000L + 2L * restN).toDF("doc_id")
    // the bench's 1/100 JIT warmup
    graft.ops.Dedup.dedupClusters(
      spark.range(20000L).toDF("doc_id"), "doc_id",
      spark.range(100).selectExpr("id AS a", "id + 1 AS b").union(
        spark.range(9900L).selectExpr("200 + id * 2 AS a", "201 + id * 2 AS b")))
      .unpersist()
    for (i <- 0 until reps) {
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.dedupClusters(ccDocs, "doc_id", ccPairs)
      val sec = (System.nanoTime() - t0) / 1e9
      val n = out.count(); out.unpersist()
      println(f"cc_trace pass=$i wall=$sec%.3f s rows=$n " +
        f"rounds=${graft.ops.Dedup.lastClusterRounds.get()} " +
        f"overlay=${graft.ops.Dedup.lastOverlayRounds.get()} " +
        f"bails=${graft.ops.Dedup.lastOverlayBails.get()}")
    }
    spark.stop()
  }
}
