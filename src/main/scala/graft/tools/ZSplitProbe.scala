package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Split the zorder rewrite's shuffleWrite wall into its three costs:
  * (A) rangeExchange+sort+noop  = sampling pass + shuffle + sort
  * (B) hashExchange+sort+noop   = shuffle + sort (no sampling pass)
  * (C) full zorder nimble write = A + encode
  * A-B isolates the RangePartitioner's extra full scan; C-A the encode. */
object ZSplitProbe {
  def main(args: Array[String]): Unit = {
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val zr = args.headOption.map(_.toLong).getOrElse(32000000L)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-zprobe"
    val linDir = s"$base/lin"
    if (!new java.io.File(linDir).isDirectory) {
      val zdf = spark.range(zr).select(
        (col("id") % 512).cast("int").as("a"),
        pmod(hash(col("id")), lit(512)).as("b"),
        (col("id") % 1000003).cast("double").as("v"))
      zdf.repartitionByRange(4, col("a")).sortWithinPartitions("a")
        .write.format("nimble").mode("overwrite")
        .option("sortColumns", "a").option("stripeBytes", (2L << 20).toString)
        .save(linDir)
    }
    val df = spark.read.format("nimble").load(linDir)
    val bytes = graft.format.GraftIO.listGft(linDir).map(_.length).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / (64L << 20)).toInt)
    println(s"input bytes=$bytes nOut=$nOut")
    val keyed = df.withColumn("__zkey",
      graft.ops.ZOrder.zkey(df, Seq("a", "b"), 256, -1L))
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      time("scan+zkey only") {
        keyed.agg(sum("__zkey")).collect()
      }
      time("A range+sort+noop") {
        keyed.repartitionByRange(nOut, col("__zkey")).sortWithinPartitions("__zkey")
          .select(df.schema.fieldNames.map(col).toIndexedSeq: _*)
          .write.format("noop").mode("overwrite").save()
      }
      time("B hash+sort+noop") {
        keyed.repartition(nOut, col("__zkey")).sortWithinPartitions("__zkey")
          .select(df.schema.fieldNames.map(col).toIndexedSeq: _*)
          .write.format("noop").mode("overwrite").save()
      }
      time("C full zorder write") {
        graft.ops.ZOrder.zorder(spark, linDir, s"$base/zsplit-out", Seq("a", "b"),
          targetFileBytes = 64L << 20,
          extraOptions = Map("stripeBytes" -> (2L << 20).toString))
      }
      time("D range32+sort+noop") {
        keyed.repartitionByRange(32, col("__zkey")).sortWithinPartitions("__zkey")
          .select(df.schema.fieldNames.map(col).toIndexedSeq: _*)
          .write.format("noop").mode("overwrite").save()
      }
      time("E range32+sort+nimble") {
        val shaped = keyed.repartitionByRange(32, col("__zkey"))
          .sortWithinPartitions("__zkey")
          .select(df.schema.fieldNames.map(col).toIndexedSeq: _*)
        shaped.write.format("nimble").mode("overwrite")
          .option("stripeBytes", (2L << 20).toString).save(s"$base/zsplit-out32")
      }
      time("F zorder r20 shape") {
        // the pre-r21 two-job plan: repartitionByRange (its own sampling
        // pass) + sort + nimble write, at the same 32-way parallelism the
        // current rewrite uses — the in-JVM baseline for C
        val shaped = keyed.repartitionByRange(32, col("__zkey"))
          .sortWithinPartitions("__zkey")
          .select(df.schema.fieldNames.map(col).toIndexedSeq: _*)
        shaped.write.format("nimble").mode("overwrite")
          .option("stripeBytes", (2L << 20).toString).save(s"$base/zsplit-outF")
        graft.ops.Compaction.compact(spark, s"$base/zsplit-outF",
          s"$base/zsplit-outF2", targetFileBytes = 64L << 20)
      }
    }
    spark.stop()
  }
}
