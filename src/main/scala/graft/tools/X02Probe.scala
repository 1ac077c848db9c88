package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated re-baseline of the bench's x02_neardup_jaccard headline (VERDICT
  * r15 Next #6): the judge's idle min drifted 0.946 → 1.198 across two
  * rounds of noisy-box samples with no code change touching its operators.
  * Runs the EXACT metric body Bench times — the SparkEntry query against
  * SPARK_GRAFT_SF_DIR, written to the noop sink — in a fresh JVM so heap
  * state and phase ordering inside the full bench cannot contaminate the
  * sample. Take the warm MIN across iterations as the trend value. */
object X02Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("x02-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = args.headOption.map(_.toInt).getOrElse(6)
    val fn = graft.SparkEntry.queries("x02_neardup_jaccard")
    fn(spark, sfDir).limit(1).collect() // plan + nimble conversion warmup
    var best = Double.MaxValue
    var i = 0
    while (i < reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      best = math.min(best, sec)
      println(f"x02_probe iter=$i sec=$sec%.3f")
      i += 1
    }
    println(f"x02_probe warm_min=$best%.3f sf=$sfDir cpus=$cpus")
    spark.stop()
  }
}
