package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated re-baseline of the bench's scale_cc shape (VERDICT r14 watch
  * item): the exact 1,000-hop chain + ~1M two-node clusters that
  * `Bench.scala` times, repeated in a fresh JVM so heap state and phase
  * ordering inside the full bench run cannot contaminate the sample.
  * Prints per-iteration wall seconds and the pointer-jumping round count. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("cc-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    var i = 0
    while (i < reps) {
      val chain = spark.range(1000).selectExpr("id AS a", "id + 1 AS b")
      val rest = spark.range(999000L).selectExpr(
        "2000 + id * 2 AS a", "2001 + id * 2 AS b")
      val ccPairs = chain.union(rest)
      val ccDocs = spark.range(2000L + 2L * 999000L).toDF("doc_id")
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.dedupClusters(ccDocs, "doc_id", ccPairs)
      out.unpersist()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"cc_probe iter=$i sec=$sec%.3f rounds=${graft.ops.Dedup.lastClusterRounds.get()} " +
        f"candCountJobs=${graft.ops.Dedup.lastCandCountJobs.get()}")
      i += 1
    }
    spark.stop()
  }
}
