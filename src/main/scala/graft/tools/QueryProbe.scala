package graft.tools

import org.apache.spark.sql.SparkSession

/** Fresh-JVM warm-min probe for ANY SparkEntry query (generalizes X02Probe):
  * `QueryProbe <name> [reps]` runs the exact Bench metric body — the query
  * against SPARK_GRAFT_SF_DIR, written to the noop sink — and prints
  * per-iteration seconds plus the warm min. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse {
      System.err.println(s"usage: QueryProbe <query-name> [reps]; known: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).limit(1).collect() // plan + nimble conversion warmup
    var best = Double.MaxValue
    var i = 0
    while (i < reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      best = math.min(best, sec)
      println(f"query_probe name=$name iter=$i sec=$sec%.3f")
      i += 1
    }
    println(f"query_probe name=$name warm_min=$best%.3f sf=$sfDir cpus=$cpus")
    spark.stop()
  }
}
