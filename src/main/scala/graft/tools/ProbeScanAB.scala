package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-JVM A/B for the r21 FSST encoded-domain equality filter on the bench's
  * scale_probe_scan shape (8M rows, skey = md5 hex, 16384 rows/chunk, no
  * index): alternates passes with `graft.fsst.eq.filter` on/off in one
  * process, so co-tenant load bursts hit both variants. Correctness arms:
  * hit/miss/IN/NOT-eq row counts against the generator's ground truth under
  * both settings, plus the Fsst.decodedStrings delta proving the on-path
  * compares without materializing strings. */
object ProbeScanAB {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-bench/probe-scan-ab"
    val rows = 8000000L
    spark.range(rows).toDF("id")
      .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
      .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double"))
      .repartition(4)
      .write.format("nimble").option("rowsPerChunk", "16384")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    def key(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hit = key("k12345"); val hit2 = key("k54321"); val miss = key("nope")

    def setOn(on: Boolean): Unit =
      System.setProperty("graft.fsst.eq.filter", on.toString)

    // correctness under both settings
    for (on <- Seq(true, false)) {
      setOn(on)
      val cHit = nb.filter(col("skey") === hit).count()
      val cMiss = nb.filter(col("skey") === miss).count()
      val cIn = nb.filter(col("skey").isin(hit, hit2, miss)).count()
      val cNot = nb.filter(col("skey") =!= hit).count()
      val cCollect = nb.filter(col("skey") === hit).select("id").collect().map(_.getLong(0)).toSeq
      println(s"on=$on hit=$cHit miss=$cMiss in=$cIn not=$cNot id=$cCollect")
      require(cHit == 1 && cMiss == 0 && cIn == 2 && cNot == rows - 1 &&
        cCollect == Seq(12345L), s"wrong results with fsstEq=$on")
    }

    // decode-volume proof: strings materialized per probe, on vs off
    for (on <- Seq(true, false)) {
      setOn(on)
      val d0 = graft.format.Fsst.decodedStrings.sum()
      nb.filter(col("skey") === hit).count()
      println(s"on=$on fsst_decoded_strings=${graft.format.Fsst.decodedStrings.sum() - d0}")
    }

    def t(body: => Long): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    setOn(true); nb.filter(col("skey") === hit).count() // warm
    setOn(false); nb.filter(col("skey") === hit).count()
    val onT = new Array[Double](passes); val offT = new Array[Double](passes)
    var i = 0
    while (i < passes) {
      setOn(true); onT(i) = t(nb.filter(col("skey") === hit).count())
      setOn(false); offT(i) = t(nb.filter(col("skey") === hit).count())
      println(f"pass $i on=${onT(i)}%.3f s off=${offT(i)}%.3f s")
      i += 1
    }
    java.util.Arrays.sort(onT); java.util.Arrays.sort(offT)
    println(f"min on=${onT(0)}%.3f s off=${offT(0)}%.3f s  median on=${onT(passes / 2)}%.3f off=${offT(passes / 2)}%.3f")
    setOn(true)
    spark.stop()
  }
}
