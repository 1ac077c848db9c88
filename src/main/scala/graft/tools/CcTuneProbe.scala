package graft.tools

import org.apache.spark.sql.SparkSession

/** broadcastMaxRows sensitivity of dedupClusters on the bench CC shape:
  * round 1's frontier is ~1M rows (every just-converged 2-node cluster), so
  * the default 2M-row gate broadcasts three ~1M-row relations in that round;
  * this probe times the same clustering with the gate at several levels to
  * decide whether the big-frontier rounds should prefer the shuffle path. */
object CcTuneProbe {
  def main(args: Array[String]): Unit = {
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val gates = args.drop(1) match {
      case a if a.nonEmpty => a.map(_.toLong).toSeq
      case _ => Seq(2000000L, 500000L, 65536L)
    }
    val chain = spark.range(1000).selectExpr("id AS a", "id + 1 AS b")
    val rest = spark.range(999000L).selectExpr(
      "2000 + id * 2 AS a", "2001 + id * 2 AS b")
    val ccPairs = chain.union(rest)
    val ccDocs = spark.range(2000000L).toDF("doc_id")
    // warm
    graft.ops.Dedup.dedupClusters(ccDocs.limit(20000), "doc_id",
      ccPairs.limit(10000)).unpersist()
    for (rep <- 0 until reps; g <- gates) {
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.dedupClusters(ccDocs, "doc_id", ccPairs,
        broadcastMaxRows = g)
      out.unpersist()
      println(f"cc_tune rep=$rep gate=$g sec=${(System.nanoTime() - t0) / 1e9}%.3f " +
        f"rounds=${graft.ops.Dedup.lastClusterRounds.get()} " +
        s"bcasts=${graft.ops.Dedup.lastCandBroadcasts.mkString(",")}")
    }
    spark.stop()
  }
}
