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
    // r20: optional scale factor (second arg) multiplies the two-node-cluster
    // count — factor 10 is the sf1-equivalent sub-linearity arm of the 100 TB
    // extrapolation evidence (r19 verdict #1a)
    val factor = args.drop(1).headOption.map(_.toLong).getOrElse(1L)
    var i = 0
    while (i < reps) {
      val chain = spark.range(1000).selectExpr("id AS a", "id + 1 AS b")
      val restN = 999000L * factor
      val rest = spark.range(restN).selectExpr(
        "2000 + id * 2 AS a", "2001 + id * 2 AS b")
      val ccPairs = chain.union(rest)
      val ccDocs = spark.range(2000L + 2L * restN).toDF("doc_id")
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.dedupClusters(ccDocs, "doc_id", ccPairs)
      out.unpersist()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"cc_probe iter=$i factor=$factor sec=$sec%.3f rounds=${graft.ops.Dedup.lastClusterRounds.get()} " +
        f"candCountJobs=${graft.ops.Dedup.lastCandCountJobs.get()}")
      i += 1
    }
    spark.stop()
  }
}
