package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated re-baseline of the bench's write twin (nimble vs parquet on
  * lineitem) — the exact Bench block in a fresh JVM, for adjudicating a
  * load-flagged write_lineitem sample. Prints per-rep seconds and the
  * warm-min ratio. */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(cpus.toInt).cache()
    li.count()
    val nDir = s"${System.getProperty("java.io.tmpdir")}/graft-writeprobe/nimble"
    val pDir = s"${System.getProperty("java.io.tmpdir")}/graft-writeprobe/parquet"
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (_ <- 0 until 3) li.write.format("nimble").mode("overwrite").save(nDir)
    for (_ <- 0 until 3) li.write.mode("overwrite").parquet(pDir)
    var nMin = Double.MaxValue
    var pMin = Double.MaxValue
    for (i <- 0 until 5) {
      val n = t(li.write.format("nimble").mode("overwrite").save(nDir))
      val p = t(li.write.mode("overwrite").parquet(pDir))
      nMin = math.min(nMin, n); pMin = math.min(pMin, p)
      println(f"write_probe iter=$i nimble=$n%.3f parquet=$p%.3f")
    }
    println(f"write_probe warm_min nimble=$nMin%.3f parquet=$pMin%.3f ratio=${nMin / pMin}%.3f")
    spark.stop()
  }
}
