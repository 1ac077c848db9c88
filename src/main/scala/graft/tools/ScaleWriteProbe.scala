package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated repro of the bench's scale-block write (8M scrambled string keys
  * + composite value columns) to separate real write-path regressions from
  * co-tenant load in the full bench run: times the indexed and unindexed
  * writes twice each (first = JIT warmup). */
object ScaleWriteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scaleDf = spark.range(8000000L).toDF("id")
      .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
      .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double"))
      .repartition(4).cache()
    scaleDf.count()
    val tmp = System.getProperty("java.io.tmpdir")
    // r17 verdict #6: the bench's scale_write_cpu_ms_per_mb spread 58-268
    // across same-code runs — pure co-tenant load. This prints the idle-truth
    // twin (fresh JVM, process-CPU around each write, per MB of encoded
    // output); PROBES.md tracks the 'both' round-2 (JIT-warm) value.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def dirMb(d: String): Double = {
      val fs = new java.io.File(d).listFiles()
      (if (fs == null) 0L else fs.map(_.length).sum).toDouble / (1 << 20)
    }
    for (round <- 1 to 2; idx <- Seq("index", "bloom", "both", "none")) {
      val cpu0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val w = scaleDf.write.format("nimble").option("rowsPerChunk", "16384")
      val w2 = idx match { case "index" => w.option("indexColumns", "skey"); case "bloom" => w.option("bloomFilterColumns", "skey"); case "both" => w.option("indexColumns", "skey").option("bloomFilterColumns", "skey"); case _ => w }
      w2.mode("overwrite").save(s"$tmp/swp-$idx")
      val wall = (System.nanoTime() - t0) / 1e9
      val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
      val mb = dirMb(s"$tmp/swp-$idx")
      println(f"round=$round idx=$idx wall=$wall%.2f s cpu=$cpuSec%.2f s " +
        f"out=$mb%.1f MB cpu_ms_per_mb=${cpuSec * 1000.0 / mb}%.1f")
    }
    spark.stop()
  }
}
