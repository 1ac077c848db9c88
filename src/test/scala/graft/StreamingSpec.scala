package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}

/** Structured Streaming integration (SURVEY.md §1.4/§7: the format is an
  * append-only file sink; watermarked windows and arbitrary state come from
  * Spark): events pipeline -> windowed counts -> nimble streaming sink;
  * sessionization via mapGroupsWithState. */
class StreamingSpec extends SparkTestBase {
  import org.apache.spark.sql.Encoders

  test("watermarked windowed aggregation into the nimble streaming sink") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val out = tmpDir("stream-sink")
    val q = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_v"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"), col("sum_v"))
      .writeStream
      .format("nimble")
      .option("path", out)
      .option("checkpointLocation", tmpDir("stream-ckpt"))
      .outputMode("append")
      .start()

    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((ts(1, 5), "click", 1.0), (ts(1, 20), "click", 2.0), (ts(1, 30), "view", 5.0))
    input.addData((ts(3, 0), "click", 4.0)) // advances watermark past hour 1
    q.processAllAvailable()
    q.stop()

    val res = spark.read.format("nimble").load(out)
    // hour-1 windows are final once watermark passed
    val rows = res.collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows.contains(("click", 2L, 3.0)), s"got ${rows.mkString(";")}")
    assert(rows.contains(("view", 1L, 5.0)))
  }

  test("streaming sink honors writer options: epoch files carry the hash index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)](spark)
    val out = tmpDir("stream-idx")
    val q = input.toDF().toDF("id", "tag")
      .writeStream.format("nimble")
      .option("path", out)
      .option("checkpointLocation", tmpDir("stream-idx-ckpt"))
      .option("indexColumns", "id")
      .option("bloomFilterColumns", "id")
      .outputMode("append")
      .start()
    input.addData((1L to 500L).map(i => (i * 37 % 1000, s"t$i")): _*)
    q.processAllAvailable()
    q.stop()
    // the epoch files are probe-able exactly like batch-written ones
    val (rows, m) = graft.format.Lookup.pointLookupMetered(out, "id", 37L)
    assert(rows.nonEmpty && rows.forall(_("id") == 37L))
    assert(m.indexProbes > 0, "streaming-written file has no usable hash index")
  }

  test("readStream from nimble dir: micro-batches track appended files") {
    import spark.implicits._
    val dir = tmpDir("stream-src")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("nimble").mode("append").save(dir)
    val q = spark.readStream.format("nimble").load(dir)
      .writeStream.format("memory").queryName("nimble_src")
      .option("checkpointLocation", tmpDir("src-ckpt"))
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.sql("SELECT count(1) FROM nimble_src").collect()(0).getLong(0) == 2)
    Seq((3L, "c")).toDF("id", "v").write.format("nimble").mode("append").save(dir)
    q.processAllAvailable()
    q.stop()
    assert(spark.sql("SELECT count(1) FROM nimble_src").collect()(0).getLong(0) == 3)
    assert(spark.sql("SELECT sum(id) FROM nimble_src").collect()(0).getLong(0) == 6)
  }

  test("maxFilesPerTrigger rate-limits ingestion but drains everything") {
    import spark.implicits._
    val dir = tmpDir("stream-rate")
    for (i <- 0 until 6)
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
        .write.format("nimble").mode("append").save(dir)
    var batches = 0
    val q = spark.readStream.format("nimble").option("maxFilesPerTrigger", "2").load(dir)
      .writeStream.format("memory").queryName("nimble_rate")
      .option("checkpointLocation", tmpDir("rate-ckpt"))
      .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => { batches += 1; () })
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 3, s"6 files at 2/trigger should take >= 3 batches, got $batches")
  }

  test("maxBytesPerTrigger rate-limits by file bytes; jumbo first file still admits") {
    import spark.implicits._
    val dir = tmpDir("stream-bytes")
    for (i <- 0 until 6)
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
        .write.format("nimble").mode("append").save(dir)
    val oneFile = graft.format.GraftIO.listGft(dir).map(_.length).max
    var batches = 0
    var rows = 0L
    val q = spark.readStream.format("nimble")
      .option("maxBytesPerTrigger", oneFile.toString) // budget ~ one file per batch
      .load(dir)
      .writeStream.format("memory").queryName("nimble_bytes")
      .option("checkpointLocation", tmpDir("bytes-ckpt"))
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        batches += 1; rows += b.count(); () })
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(rows == 6, s"every row must drain: $rows")
    assert(batches >= 4, s"6 one-row files at ~1 file of byte budget should take several batches, got $batches")
  }

  test("stateful sessionization with mapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)](spark) // (user, ts-seconds)
    val counts = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + events.size
          state.update(n)
          (user, n)
      }
    val q = counts.writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    input.addData((1L, 10L), (1L, 20L), (2L, 30L))
    q.processAllAvailable()
    input.addData((1L, 40L))
    q.processAllAvailable()
    q.stop()
    val m = spark.sql("SELECT * FROM sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    assert(m(1L) == 3L && m(2L) == 1L, m.toString)
  }

  test("streaming exact dedup drops repeats within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q = graft.ops.Dedup.streamingDedup(
      input.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    input.addData((1L, ts(0), "Hello world"), (2L, ts(1), "hello  WORLD"), (3L, ts(2), "other"))
    q.processAllAvailable()
    input.addData((4L, ts(5), "HELLO world"), (5L, ts(6), "fresh text")) // 4 repeats across batches
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT doc_id FROM sdedup").collect().map(_.getLong(0)).sorted
    // normalization makes 1/2/4 one fingerprint: only the first survives
    assert(ids.sameElements(Array(1L, 3L, 5L)), ids.mkString(","))
  }

  test("annotating streaming dedup routes duplicates and expires state by event-time TTL") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q = graft.ops.Dedup.streamingDedupAnnotate(
      input.toDF().toDF("doc_id", "ts", "text"),
      "doc_id", "text", "ts", watermarkDelay = "0 seconds",
      ttl = java.time.Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("sdedup_ann").outputMode("append").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // batch 1: in-batch duplicate pair + a singleton
    input.addData((1L, ts(10, 0), "dup text"), (2L, ts(10, 1), "dup  TEXT"), (3L, ts(10, 2), "only"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate while state is live
    input.addData((4L, ts(10, 10), "dup text"))
    q.processAllAvailable()
    // batch 3: advance the watermark far past lastSeen + ttl -> state expires
    input.addData((9L, ts(13, 0), "unrelated"))
    q.processAllAvailable()
    // batch 4: same fingerprint after expiry is a fresh original again
    input.addData((10L, ts(13, 1), "dup text"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM sdedup_ann").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(rows(1L) == ((false, 1L)), s"first-seen is the keeper: $rows")
    assert(rows(2L) == ((true, 1L)), "in-batch duplicate annotated, not dropped")
    assert(rows(3L) == ((false, 3L)))
    assert(rows(4L) == ((true, 1L)), "cross-batch duplicate while state lives")
    assert(rows(10L) == ((false, 10L)), s"after TTL expiry the fingerprint restarts: $rows")
  }

  test("autoCompactEvery: sink merges prior epochs' small files; current epoch left for replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)](spark)
    val out = tmpDir("stream-ac")
    val q = input.toDF().toDF("id", "tag")
      .writeStream.format("nimble")
      .option("path", out)
      .option("checkpointLocation", tmpDir("stream-ac-ckpt"))
      .option("autoCompactEvery", "2")
      .option("autoCompactMinFileBytes", (1L << 20).toString)
      .option("autoCompactTargetBytes", (1L << 30).toString)
      .outputMode("append")
      .start()
    for (e <- 0 until 6) {
      input.addData((0 until 200).map(i => ((e * 1000 + i).toLong, s"e$e-$i")): _*)
      q.processAllAvailable()
    }
    q.stop()
    val files = graft.format.GraftIO.listGft(out).map(_.path)
    // 6 epochs x 4 task files each would be ~24 files unmanaged; auto-compact
    // at epochs 2 and 4 folds everything before them. The LAST trigger's
    // epoch files must still exist uncompacted (exactly-once replay window).
    assert(files.length < 24, s"auto-compact never ran: ${files.length} files")
    val lastEpoch = files.flatMap { f =>
      "epoch-(\\d+)-".r.findFirstMatchIn(f.substring(f.lastIndexOf('/') + 1))
        .map(_.group(1).toLong)
    }
    assert(lastEpoch.nonEmpty, "the replay-window epoch files must survive compaction")
    // every row of every epoch survives, exactly once
    val got = spark.read.format("nimble").load(out)
    assert(got.count() == 1200)
    assert(got.select(countDistinct(col("id"))).head().getLong(0) == 1200)
  }
}
