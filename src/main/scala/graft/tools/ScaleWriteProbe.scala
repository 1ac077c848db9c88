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
    // GRAFT_SCALE_FACTOR multiplies the table like the bench's scale blocks
    // (r20): factor 10 = the sf1-equivalent shape, for adjudicating the 10x
    // run's cpu_ms_per_mb against an isolated measurement
    val factor = math.max(1L, sys.env.getOrElse("GRAFT_SCALE_FACTOR", "1").toLong)
    val scaleDf = spark.range(8000000L * factor).toDF("id")
      .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
      .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double"))
      .repartition(4).cache()
    scaleDf.count()
    val tmp = System.getProperty("java.io.tmpdir")
    // 'fm' arg: the bench's wide-flatmap write shape in isolation (2M rows x
    // 8-of-400 keys), for stack-sampling the 400-stream writer.
    // 'fmstr': same shape with STRING values — exercises the bytes-path
    // nested replay (dict indices / FSST lengths / prefix restarts).
    // 'std': the standard scale-write 'both' shape under the same sampler.
    if (args.contains("fm") || args.contains("fmstr") || args.contains("std")) {
      val valueExpr =
        if (args.contains("fmstr"))
          "transform(sequence(0, 7), i -> concat('v', CAST(pmod(id + i, 1000) AS STRING)))"
        else "transform(sequence(0, 7), i -> CAST(id + i AS DOUBLE))"
      lazy val fmSrc = {
        val d = spark.range(2000000L)
          .selectExpr("id",
            "map_from_arrays(" +
              "transform(sequence(0, 7), i -> concat('f', pmod(id * 7 + i * 50, 400))), " +
              s"$valueExpr) AS m")
          .repartitionByRange(4, org.apache.spark.sql.functions.col("id"))
          .sortWithinPartitions("id").cache()
        d.count()
        d
      }
      // in-process stack sampler (attach is unavailable in some sandboxes):
      // leaf-most graft frame of every executor thread, 5 ms cadence
      val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = false
      val sampler = new Thread(() => {
        while (!Thread.currentThread().isInterrupted) {
          if (sampling) {
            val it = Thread.getAllStackTraces.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              if (e.getKey.getName.startsWith("Executor task launch")) {
                val st = e.getValue
                var i = 0
                var found = false
                while (i < st.length && !found) {
                  if (st(i).getClassName.startsWith("graft.")) {
                    val k = st(i).getClassName + "." + st(i).getMethodName
                    counts.merge(k, 1, (a, b) => a + b)
                    found = true
                  }
                  i += 1
                }
              }
            }
          }
          try Thread.sleep(5) catch { case _: InterruptedException => return }
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      for (round <- 1 to 3) {
        sampling = round >= 2 // skip the JIT-cold round
        val t0 = System.nanoTime()
        if (args.contains("std"))
          scaleDf.write.format("nimble").option("rowsPerChunk", "16384")
            .option("indexColumns", "skey").option("bloomFilterColumns", "skey")
            .mode("overwrite").save(s"$tmp/swp-std")
        else
          fmSrc.write.format("nimble").option("flatMapColumns", "m")
            .option("rowsPerChunk", "16384").option("sortColumns", "id")
            .mode("overwrite").save(s"$tmp/swp-fm")
        println(f"${args.headOption.getOrElse("fm")} round=$round " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      sampler.interrupt()
      val top = scala.jdk.CollectionConverters.MapHasAsScala(counts).asScala.toSeq
        .sortBy(-_._2.intValue).take(25)
      top.foreach { case (k, n) => println(f"  [hot] $n%6d $k") }
      spark.stop(); return
    }
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
