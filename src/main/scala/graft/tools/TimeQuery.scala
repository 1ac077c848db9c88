package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: warmed repeat timings of one SparkEntry query.
  * Usage: TimeQuery <name> <sfDir> [reps]. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"$name: " + times.map(t => f"$t%.3f").mkString(" ") + f" min=${times.min}%.3f")
    spark.stop()
  }
}
