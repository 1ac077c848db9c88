package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated re-baseline of the bench's scale_zorder shape (r15: the judge's
  * idle samples moved 15.8 s (r13) -> 23.9 s (r14) but both BENCH artifacts
  * were load-poisoned, so this fresh-JVM probe separates host noise from a
  * real write-path delta — r14 added per-stripe chunk directories + v14
  * per-chunk stats to exactly this path). Also prints the read/shuffle+write
  * split so a regression, if real, lands on one side. */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("zorder-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val zr = args.lift(1).map(_.toLong).getOrElse(32000000L)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-zprobe"
    val linDir = s"$base/lin"
    val zdf = spark.range(zr).select(
      (col("id") % 512).cast("int").as("a"),
      pmod(hash(col("id")), lit(512)).as("b"),
      (col("id") % 1000003).cast("double").as("v"))
    zdf.repartitionByRange(4, col("a")).sortWithinPartitions("a")
      .write.format("nimble").mode("overwrite")
      .option("sortColumns", "a").option("stripeBytes", (2L << 20).toString)
      .save(linDir)
    var i = 0
    while (i < reps) {
      val zDir = s"$base/zord-$i"
      val t0 = System.nanoTime()
      graft.ops.ZOrder.zorder(spark, linDir, zDir, Seq("a", "b"),
        targetFileBytes = 64L << 20,
        extraOptions = Map("stripeBytes" -> (2L << 20).toString))
      val sec = (System.nanoTime() - t0) / 1e9
      // split: how much of it is just scanning the source?
      val r0 = System.nanoTime()
      spark.read.format("nimble").load(linDir).agg(sum("v")).collect()
      val readSec = (System.nanoTime() - r0) / 1e9
      println(f"zorder_probe iter=$i sec=$sec%.3f scan_only=$readSec%.3f")
      i += 1
    }
    spark.stop()
  }
}
