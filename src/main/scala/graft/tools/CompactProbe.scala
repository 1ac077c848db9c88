package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated re-baseline of the bench's scale_compact shape (r16 verdict #2:
  * four same-code r16 runs spread 14.9–21.5 s and r15's sample hit 34.7 s
  * under load — the only scale metric whose drift could not be adjudicated
  * from artifacts because no fresh-JVM warm-min existed). Builds the exact
  * bench table (8M rows, md5 skey index + bloom, 16K-row chunks, 4 files)
  * and compacts it through the footer-recovered layout repeatedly; the warm
  * minimum is the idle truth BENCH_r{N}'s calibration brackets get compared
  * against. Also prints the source-scan-only split so a real regression,
  * if any, lands on the read or the rewrite side. */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("compact-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val scaleRows = args.lift(1).map(_.toLong).getOrElse(8000000L)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-cprobe"
    val srcDir = s"$base/scale-idx"
    val scaleDf = spark.range(scaleRows).toDF("id")
      .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
      .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double"))
      .repartition(4)
    scaleDf.write.format("nimble").option("indexColumns", "skey")
      .option("bloomFilterColumns", "skey").option("rowsPerChunk", "16384")
      .mode("overwrite").save(srcDir)
    var i = 0
    while (i < reps) {
      val outDir = s"$base/compacted-$i"
      val t0 = System.nanoTime()
      val rep = graft.ops.Compaction.compact(spark, srcDir, outDir, targetFileBytes = 1L << 31)
      val sec = (System.nanoTime() - t0) / 1e9
      assert(rep.rows == scaleRows, s"compaction changed row count: $rep")
      val r0 = System.nanoTime()
      spark.read.format("nimble").load(srcDir).agg(sum("v")).collect()
      val readSec = (System.nanoTime() - r0) / 1e9
      println(f"compact_probe iter=$i sec=$sec%.3f scan_only=$readSec%.3f rows=${rep.rows} " +
        f"raw=${graft.ops.Compaction.lastCompactRaw.get()}")
      i += 1
    }
    spark.stop()
  }
}
