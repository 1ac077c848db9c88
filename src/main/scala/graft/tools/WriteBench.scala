package graft.tools

import org.apache.spark.sql.SparkSession

/** Write-only microbench: repeated nimble + parquet writes of lineitem. */
object WriteBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 4
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(cpus.toInt).cache()
    li.count()
    val tmp = System.getProperty("java.io.tmpdir")
    for (label <- Seq("nimble", "parquet")) {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        if (label == "nimble") li.write.format("nimble").mode("overwrite").save(s"$tmp/wb-nimble")
        else li.write.mode("overwrite").parquet(s"$tmp/wb-parquet")
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-8s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
