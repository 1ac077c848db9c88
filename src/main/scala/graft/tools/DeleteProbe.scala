package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated re-baseline of the bench's scale_delete / scale_sql_update
  * shape. The metric is BIMODAL across rounds (0.27 s twice in r16,
  * 1.8–3.7 s in five other same-code runs incl. all three r17 min-of-2
  * samples) — this probe separates a warm-FS fast mode from the common
  * mode so BENCH flags adjudicate against a measured distribution, not a
  * best-ever outlier. Builds the exact bench table (8M rows via the
  * catalog, range-clustered on id, sorted layout) fresh per iteration and
  * times the same two disjoint 2M-row retention deletes the bench runs. */
object DeleteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("delete-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.scan.blockCacheBytes",
        sys.env.getOrElse("GRAFT_PROBE_BLOCKCACHE", (256L << 20).toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = args.headOption.filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val scaleRows = 8000000L
    // 'late' arg: replicate the bench's forked-JVM context before the timed
    // deletes — an 8M-row indexed write + a compaction — to test whether the
    // in-bench 2-3 s (vs 0.15 s fresh) is accumulated JVM/session state
    if (args.contains("late")) {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft-dprobe/warm"
      val df = spark.range(scaleRows).toDF("id")
        .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
        .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double"))
        .repartition(4)
      df.write.format("nimble").option("indexColumns", "skey")
        .option("bloomFilterColumns", "skey").option("rowsPerChunk", "16384")
        .mode("overwrite").save(s"$base/idx")
      graft.ops.Compaction.compact(spark, s"$base/idx", s"$base/compacted",
        targetFileBytes = 1L << 31)
      println("delete_probe late-context warmed (8M write + compact)")
    }
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft-dprobe/wh"
    spark.conf.set("spark.sql.catalog.gdprobe", "graft.spark.NimbleCatalog")
    spark.conf.set("spark.sql.catalog.gdprobe.warehouse", wh)
    // 'nimblesrc' arg: source the catalog table from a NIMBLE READ exactly
    // like the bench does (vs the default in-memory range source)
    val src = if (args.contains("nimblesrc")) {
      val nd = s"${System.getProperty("java.io.tmpdir")}/graft-dprobe/noidx"
      spark.range(scaleRows).toDF("id")
        .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
        .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double"))
        .repartition(4).write.format("nimble").option("rowsPerChunk", "16384")
        .mode("overwrite").save(nd)
      spark.read.format("nimble").load(nd)
    } else spark.range(scaleRows).toDF("id")
      .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
      .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double"))
    // 'prescan' arg: run an UNRELATED full nimble scan first, then the
    // normal range-source iterations — isolates "any prior nimble scan
    // poisons later deletes" (global session state) from "the create plan's
    // nimble leaf does" (lineage/plan shape)
    if (args.contains("prescan")) {
      val nd = s"${System.getProperty("java.io.tmpdir")}/graft-dprobe/prescan"
      spark.range(scaleRows).toDF("id")
        .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
        .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double"))
        .repartition(4).write.format("nimble").option("rowsPerChunk", "16384")
        .mode("overwrite").save(nd)
      val cnt = spark.read.format("nimble").load(nd).agg(sum("v")).collect()(0)
      println(s"delete_probe prescan done ($cnt)")
    }
    // 'keep' arg: create once, delete nothing — leaves the table for a
    // fresh-JVM 'deleteonly' run (isolates file-content vs session-state)
    if (args.contains("keep")) {
      spark.sql("DROP TABLE IF EXISTS gdprobe.default.scale_del")
      src.repartitionByRange(8, col("id")).sortWithinPartitions("id")
        .writeTo("gdprobe.default.scale_del")
        .tableProperty("sortColumns", "id").create()
      println(s"delete_probe kept table at $wh/default/scale_del")
      spark.stop(); return
    }
    // 'bigfile' arg (r18 verdict stretch #7): the O(boundary-chunks) claim
    // at ~GB-and-beyond single files. One file, many stripes, same retention
    // cut at two sizes: the SURGERY wall should scale only with raw-copy IO
    // (kept stripes are byte moves), while the forced REWRITE twin — the
    // identical cut expressed through an untranslatable predicate, so it
    // takes the decode+re-encode path on the same bytes — scales with
    // decode+encode CPU. The printed secs and secs/GB pairs are the 100 TB
    // extrapolation evidence (PROBES.md ledger row).
    if (args.contains("bigfile")) {
      for (m <- Seq(8, 24)) {
        val rows = m * 1000000L
        def mk(dir: String): Unit =
          spark.range(rows).toDF("id")
            .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
            .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double"))
            .repartitionByRange(1, col("id")).sortWithinPartitions("id")
            .write.format("nimble").option("sortColumns", "id")
            .option("rowsPerChunk", "16384").mode("overwrite").save(dir)
        val sDir = s"${System.getProperty("java.io.tmpdir")}/graft-dprobe/big-surg-$m"
        val rDir = s"${System.getProperty("java.io.tmpdir")}/graft-dprobe/big-rw-$m"
        mk(sDir); mk(rDir)
        val gb = new java.io.File(sDir).listFiles().map(_.length).sum / 1e9
        val t0 = System.nanoTime()
        val rs = graft.ops.Delete.delete(spark, sDir, col("id") >= rows - 1000L)
        val surgSec = (System.nanoTime() - t0) / 1e9
        assert(rs.rowsDeleted == 1000L, s"bigfile surgery drifted: $rs")
        // pmod(id, MaxValue) == id for every row here, but the predicate is
        // untranslatable -> exactFilters=false -> the full rewrite path
        val t1 = System.nanoTime()
        val rr = graft.ops.Delete.delete(spark, rDir,
          pmod(col("id"), lit(Long.MaxValue)) >= rows - 1000L)
        val rwSec = (System.nanoTime() - t1) / 1e9
        assert(rr.rowsDeleted == 1000L, s"bigfile rewrite twin drifted: $rr")
        println(f"delete_probe bigfile rows=${m}M gb=$gb%.2f " +
          f"surgery=$surgSec%.3f s (${surgSec / gb}%.3f s/GB) " +
          f"rewrite=$rwSec%.3f s (${rwSec / gb}%.3f s/GB) " +
          f"rawChunks=${graft.ops.Surgery.lastRawChunks.get()} " +
          f"rewrittenChunks=${graft.ops.Surgery.lastRewrittenChunks.get()}")
      }
      spark.stop(); return
    }
    // 'indexed' arg (r19 verdict #5): idle truth for scale_delete_indexed —
    // the bench's exact index+bloom-bearing sorted table, same two disjoint
    // quarter-table retention deletes, fresh table per iteration. Pins the
    // warm number the wide under-load dump band (0.08-0.59 s) adjudicates
    // against.
    if (args.contains("indexed")) {
      for (iter <- 0 until reps) {
        spark.sql("DROP TABLE IF EXISTS gdprobe.default.scale_del_idx")
        src.repartitionByRange(8, col("id")).sortWithinPartitions("id")
          .writeTo("gdprobe.default.scale_del_idx")
          .tableProperty("sortColumns", "id")
          .tableProperty("indexColumns", "skey")
          .tableProperty("bloomFilterColumns", "skey").create()
        val dDir = s"$wh/default/scale_del_idx"
        val t0 = System.nanoTime()
        val r1 = graft.ops.Delete.delete(spark, dDir, col("id") >= 6000000L)
        val d1 = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val r2 = graft.ops.Delete.delete(spark, dDir, col("id") >= 4000000L)
        val d2 = (System.nanoTime() - t1) / 1e9
        assert(r1.rowsDeleted == 2000000L && r2.rowsDeleted == 2000000L,
          s"indexed probe drifted: $r1 / $r2")
        assert(r1.filesRewritten <= 1 && r2.filesRewritten <= 1,
          s"indexed retention delete must be ~metadata-only: $r1 / $r2")
        // index streams must survive the surgery
        val f = graft.spark.NimbleSource.listFiles(dDir).head
        val rd = new graft.format.Tablet.Reader(f)
        try assert(rd.footer.streamKeys.exists(_.startsWith("#idx:")),
          "index streams must survive the surgered retention delete")
        finally rd.close()
        println(f"delete_probe indexed iter=$iter d1=$d1%.3f d2=$d2%.3f " +
          f"min=${math.min(d1, d2)}%.3f rewritten=${r1.filesRewritten}/${r2.filesRewritten}")
      }
      spark.stop(); return
    }
    // 'merge' arg (r19 verdict #6): MERGE at boundary scale — the last DML
    // op without a slope row. A narrow upsert delta against a key-sorted
    // 8-file table must rewrite ONLY the boundary file holding the delta's
    // key range, at ~raw-IO s/GB of that one file, at both table sizes.
    if (args.contains("merge")) {
      val mtl = if (args.contains("listener")) {
        val l = new TaskSplitListener; spark.sparkContext.addSparkListener(l); Some(l)
      } else None
      for (m <- Seq(8, 24)) {
        val rows = m * 1000000L
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft-dprobe/merge-$m"
        spark.range(rows).toDF("id")
          .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
          .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double"))
          .repartitionByRange(8, col("id")).sortWithinPartitions("id")
          .write.format("nimble").option("sortColumns", "id")
          .option("rowsPerChunk", "16384").mode("overwrite").save(dir)
        val tableGb = new java.io.File(dir).listFiles().map(_.length).sum / 1e9
        // 1000-row correction delta inside one file's key range + 100 inserts
        val delta = spark.range(rows / 2, rows / 2 + 1000L).toDF("id")
          .union(spark.range(rows, rows + 100L).toDF("id"))
          .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
          .withColumn("v", lit(-1.0))
        mtl.foreach(_.reset())
        val t0 = System.nanoTime()
        val rep = graft.ops.Merge.upsert(spark, dir, delta, Seq("id"))
        val sec = (System.nanoTime() - t0) / 1e9
        mtl.foreach { l => Thread.sleep(300); println(l.report(s"merge-${m}M", sec, 0L)) }
        assert(rep.rowsMatched == 1000L && rep.rowsInserted == 100L,
          s"merge probe drifted: $rep")
        assert(rep.filesRewritten <= 2,
          s"narrow delta must rewrite only boundary files: $rep")
        val perFileGb = tableGb / 8
        println(f"delete_probe merge rows=${m}M tableGb=$tableGb%.2f " +
          f"rewrittenFiles=${rep.filesRewritten} untouched=${rep.filesUntouched} " +
          f"sec=$sec%.3f (${sec / (rep.filesRewritten * perFileGb)}%.3f s/GB-rewritten)")
      }
      spark.stop(); return
    }
    if (args.contains("deleteonly")) {
      val dDir = s"$wh/default/scale_del"
      val t0 = System.nanoTime()
      val rep1 = graft.ops.Delete.delete(spark, dDir, col("id") >= 6000000L)
      val d1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rep2 = graft.ops.Delete.delete(spark, dDir, col("id") >= 4000000L)
      val d2 = (System.nanoTime() - t1) / 1e9
      println(f"delete_probe deleteonly d1=$d1%.3f d2=$d2%.3f " +
        f"rewritten=${rep1.filesRewritten}/${rep2.filesRewritten} rows=${rep1.rowsDeleted}/${rep2.rowsDeleted}")
      spark.stop(); return
    }
    // 'alternate' arg: per-iteration source flips range->nimble->range — if
    // the slow mode follows the source WITHIN one JVM, the cause travels
    // with the create's plan, not with accumulated session state
    val alternate = args.contains("alternate")
    def srcForNimble() = {
      val nd = s"${System.getProperty("java.io.tmpdir")}/graft-dprobe/alt-noidx"
      if (!new java.io.File(nd).exists())
        src.repartition(4).write.format("nimble").option("rowsPerChunk", "16384")
          .mode("overwrite").save(nd)
      spark.read.format("nimble").load(nd)
    }
    def srcFor(iter: Int) =
      if (!alternate) src
      else if (iter % 2 == 1) srcForNimble()
      else src
    // 'rewritecheck' arg: split the slow rewrite phase — pure filtered READ
    // of the boundary file vs the full read+rangeshuffle+sort+WRITE shape
    if (args.contains("rewritecheck")) {
      for (iter <- 0 until reps) {
        spark.sql("DROP TABLE IF EXISTS gdprobe.default.scale_del")
        val source = if (iter % 2 == 1) srcForNimble() else src
        source.repartitionByRange(8, col("id")).sortWithinPartitions("id")
          .writeTo("gdprobe.default.scale_del")
          .tableProperty("sortColumns", "id").create()
        val dDir = s"$wh/default/scale_del"
        // the boundary file: the one whose stats straddle id=6M
        val victim = graft.spark.NimbleSource.listFiles(dDir).find { f =>
          val st = new graft.format.Tablet.Reader(f)
          try { val s0 = st.fileStatsOf("id").get; s0.minLong < 6000000L && s0.maxLong >= 6000000L }
          finally st.close()
        }.get
        val t0 = System.nanoTime()
        spark.read.format("nimble").load(victim)
          .filter(col("id") < 6000000L).agg(count(lit(1))).collect()
        val readSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        spark.read.format("nimble").load(victim)
          .filter(col("id") < 6000000L)
          .repartitionByRange(1, col("id")).sortWithinPartitions("id")
          .write.format("nimble").option("sortColumns", "id").mode("overwrite")
          .save(s"$wh/rewrite-check-$iter")
        val fullSec = (System.nanoTime() - t1) / 1e9
        println(f"delete_probe rewritecheck iter=$iter src=${if (iter % 2 == 1) "nimble" else "range"} " +
          f"read=$readSec%.3f full=$fullSec%.3f")
      }
      spark.stop(); return
    }
    // 'listener' arg: per-task split of every job inside the timed deletes
    // (r17 verdict #1): scheduler delay / deserialize / GC / fetch-wait per
    // stage, per-job walls, and the DRIVER-side time the jobs don't cover —
    // distinguishes "a task stalls" from "the driver stalls between jobs"
    val tl = if (args.contains("listener")) {
      val l = new TaskSplitListener; spark.sparkContext.addSparkListener(l); Some(l)
    } else None
    val gcBeans = scala.jdk.CollectionConverters.ListHasAsScala(
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans).asScala
    def gcMs(): Long = gcBeans.map(_.getCollectionTime).sum
    def timedSplit[A](tag: String)(body: => A): (A, Double) = {
      tl.foreach(_.reset()); val g0 = if (tl.isDefined) gcMs() else 0L
      val t0 = System.nanoTime(); val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      tl.foreach { l => Thread.sleep(300); println(l.report(tag, wall, gcMs() - g0)) }
      (r, wall)
    }
    var i = 0
    while (i < reps) {
      spark.sql("DROP TABLE IF EXISTS gdprobe.default.scale_del")
      srcFor(i).repartitionByRange(8, col("id")).sortWithinPartitions("id")
        .writeTo("gdprobe.default.scale_del")
        .tableProperty("sortColumns", "id").create()
      val dDir = s"$wh/default/scale_del"
      // 'settle' arg: drain OS writeback between create and delete — if the
      // slow mode vanishes, the cost is dirty-page IO from the heavier
      // nimble-sourced create, not the delete itself
      if (args.contains("settle")) {
        new ProcessBuilder("sync").inheritIO().start().waitFor()
        Thread.sleep(5000)
      }
      // 'layout' arg: per-file id ranges before each delete — tests whether
      // the bimodal rewrite cost is simply the KEPT-ROW COUNT of the one
      // mixed file (decided by where create-time range sampling dropped the
      // boundary relative to the delete predicate)
      if (args.contains("layout")) {
        for (f <- graft.spark.NimbleSource.listFiles(dDir).sorted) {
          val r = new graft.format.Tablet.Reader(f)
          try {
            val st = r.fileStatsOf("id").get
            val rows = r.footer.rowCount
            val keep1 = if (st.maxLong < 6000000L) rows
              else if (st.minLong >= 6000000L) 0L
              else -1L // mixed: boundary file
            println(f"  [layout] ${f.substring(f.lastIndexOf('/') + 1)} rows=$rows " +
              f"id=[${st.minLong},${st.maxLong}] keepIfD1=$keep1")
          } finally r.close()
        }
      }
      val (rep1, d1) = timedSplit(s"iter$i-d1")(
        graft.ops.Delete.delete(spark, dDir, col("id") >= 6000000L))
      assert(rep1.rowsDeleted == 2000000L, s"probe delete drifted: $rep1")
      val (rep2, d2) = timedSplit(s"iter$i-d2")(
        graft.ops.Delete.delete(spark, dDir, col("id") >= 4000000L))
      assert(rep2.rowsDeleted == 2000000L, s"probe delete r2 drifted: $rep2")
      val (_, u1) = timedSplit(s"iter$i-upd")(
        spark.sql("UPDATE gdprobe.default.scale_del SET v = 0.0 " +
          "WHERE id >= 1000000 AND id < 1100000"))
      println(f"delete_probe iter=$i d1=$d1%.3f d2=$d2%.3f min=${math.min(d1, d2)}%.3f " +
        f"update=$u1%.3f rewritten=${rep1.filesRewritten}/${rep2.filesRewritten}")
      i += 1
    }
    spark.stop()
  }
}

/** Per-task split of every Spark job inside a timed window: per-stage sums
  * of run / deserialize / GC / shuffle-fetch-wait / scheduler-delay, per-job
  * walls, and the driver-side time no job covers. schedulerDelay is the
  * classic UI derivation: task duration minus every metered component. */
private[tools] class TaskSplitListener extends org.apache.spark.scheduler.SparkListener {
  import org.apache.spark.scheduler._
  import scala.collection.mutable
  private final class StageAgg(val name: String) {
    var tasks = 0
    var run, deser, gc, sched, fetchWait, resultSer, maxDur = 0L
    var firstLaunch = Long.MaxValue
    var lastFinish = 0L
  }
  private val stages = new java.util.concurrent.ConcurrentHashMap[Int, StageAgg]
  private val jobs = mutable.ArrayBuffer[(Int, Long, Long, Seq[Int])]()
  private val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Seq[Int])]

  def reset(): Unit = { stages.clear(); jobs.synchronized(jobs.clear()); jobStarts.clear() }

  override def onJobStart(e: SparkListenerJobStart): Unit =
    jobStarts.put(e.jobId, (e.time, e.stageIds.map(_.toInt)))
  override def onJobEnd(e: SparkListenerJobEnd): Unit = {
    val (t0, sids) = Option(jobStarts.remove(e.jobId)).getOrElse((e.time, Seq.empty[Int]))
    jobs.synchronized(jobs += ((e.jobId, t0, e.time, sids)))
  }
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m == null) return
    val agg = stages.computeIfAbsent(e.stageId, _ => new StageAgg(e.taskType))
    agg.synchronized {
      agg.tasks += 1
      agg.run += m.executorRunTime
      agg.deser += m.executorDeserializeTime
      agg.gc += m.jvmGCTime
      agg.fetchWait += m.shuffleReadMetrics.fetchWaitTime
      agg.resultSer += m.resultSerializationTime
      val dur = e.taskInfo.duration
      agg.sched += math.max(0L, dur - m.executorRunTime -
        m.executorDeserializeTime - m.resultSerializationTime -
        e.taskInfo.gettingResultTime)
      agg.maxDur = math.max(agg.maxDur, dur)
      agg.firstLaunch = math.min(agg.firstLaunch, e.taskInfo.launchTime)
      agg.lastFinish = math.max(agg.lastFinish, e.taskInfo.finishTime)
    }
  }

  /** One multi-line report for the window: jobs sorted by start, each with
    * its stages' task splits; then the wall seconds NOT covered by any job
    * interval (pure driver time) and the window's JVM GC delta. */
  def report(tag: String, wallSec: Double, gcDeltaMs: Long): String = {
    val js = jobs.synchronized(jobs.sortBy(_._2).toVector)
    val sb = new StringBuilder
    sb.append(f"[task-split] $tag wall=$wallSec%.3f s jobs=${js.length} jvmGcDelta=${gcDeltaMs}ms\n")
    for ((jid, t0, t1, sids) <- js) {
      sb.append(f"  job $jid wall=${(t1 - t0) / 1e3}%.3f s\n")
      for (sid <- sids; agg <- Option(stages.get(sid))) agg.synchronized {
        val launchGap = if (agg.firstLaunch == Long.MaxValue) 0L else agg.firstLaunch - t0
        sb.append(f"    stage $sid (${agg.name}) tasks=${agg.tasks} " +
          f"run=${agg.run}ms deser=${agg.deser}ms gc=${agg.gc}ms sched=${agg.sched}ms " +
          f"fetchWait=${agg.fetchWait}ms resultSer=${agg.resultSer}ms " +
          f"maxTask=${agg.maxDur}ms launchGap=${launchGap}ms " +
          f"span=${if (agg.lastFinish > 0) agg.lastFinish - (if (agg.firstLaunch == Long.MaxValue) agg.lastFinish else agg.firstLaunch) else 0}ms\n")
      }
    }
    // driver-side time: wall minus the union of job intervals
    val ivs = js.map(j => (j._2, j._3)).sortBy(_._1)
    var covered = 0L; var cursor = Long.MinValue
    for ((a, b) <- ivs) {
      val s = math.max(a, cursor)
      if (b > s) { covered += b - s; cursor = b } else cursor = math.max(cursor, b)
    }
    sb.append(f"  driver-uncovered=${math.max(0.0, wallSec - covered / 1e3)}%.3f s of $wallSec%.3f s")
    sb.toString
  }
}
