package graft

import org.apache.spark.sql.functions._
import graft.ops.{Delete, Surgery}

/** Chunk-granular delete surgery (ops/Surgery.scala): the boundary-file fix
  * for retention deletes. Pins (1) result parity with the full-rewrite path,
  * (2) the O(boundary-chunks) contract via the raw/dropped/rewritten chunk
  * counters, (3) answer-grade stats on the surgered file (aggregate pushdown
  * must stay exact), (4) sorted-layout survival, (5) SQL null semantics of
  * the keep mask, and (6) the conservative fallback for ineligible files. */
class SurgerySpec extends SparkTestBase {
  import spark.implicits._

  private def writeSorted(dir: String, rows: Long = 100000L): Unit =
    spark.range(rows).toDF("id")
      .withColumn("s", md5(concat(lit("k"), col("id").cast("string"))))
      .withColumn("v", (col("id") % 97).cast("double"))
      .repartitionByRange(2, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("rowsPerChunk", "4096").mode("overwrite").save(dir)

  test("retention delete rewrites O(boundary chunks): raw-copies the kept bulk, result exact") {
    val dir = tmpDir("surg-basic")
    writeSorted(dir)
    val expected = spark.read.format("nimble").load(dir)
      .filter(col("id") < 70000L)
      .agg(count(lit(1)), sum("v"), sum(length(col("s")))).collect()(0)

    val rep = Delete.delete(spark, dir, col("id") >= 70000L)
    assert(rep.rowsDeleted == 30000L, s"wrong delete count: $rep")

    // chunk economics: at 4096 rows/chunk one file straddles 70000 — almost
    // all of its kept chunks must raw-copy; exactly one chunk row-rewrites
    assert(Surgery.lastRewrittenChunks.get() == 1L,
      s"exactly the boundary chunk rewrites, got ${Surgery.lastRewrittenChunks.get()}")
    assert(Surgery.lastRawChunks.get() >= 3L,
      s"kept bulk must raw-copy, got ${Surgery.lastRawChunks.get()}")

    val got = spark.read.format("nimble").load(dir)
      .agg(count(lit(1)), sum("v"), sum(length(col("s")))).collect()(0)
    assert(got == expected, s"surgered table drifted: $got vs $expected")
  }

  test("surgered file keeps answer-grade stats: agg pushdown == full decode") {
    val dir = tmpDir("surg-stats")
    writeSorted(dir)
    Delete.delete(spark, dir, col("id") >= 70000L)
    assert(Surgery.lastRawChunks.get() > 0, "surgery must have run")
    val df = spark.read.format("nimble").load(dir)
    // min/max/count/sum answer from stripe stats when they are exact — and
    // parquet twin data computed row-wise must agree
    val pushed = df.agg(min("id"), max("id"), count(lit(1)), count(col("v")), sum("id")).collect()(0)
    assert(pushed.getLong(0) == 0L && pushed.getLong(1) == 69999L)
    assert(pushed.getLong(2) == 70000L && pushed.getLong(3) == 70000L)
    assert(pushed.getLong(4) == 69999L * 70000L / 2)
    // decode-forcing twin (group by a non-stats expression)
    val full = df.groupBy(lit(1)).agg(min("id"), max("id"), count(lit(1)), sum("id")).collect()(0)
    assert(full.getLong(1) == 0L && full.getLong(2) == 69999L && full.getLong(4) == 69999L * 70000L / 2)
  }

  test("sorted layout survives surgery: footer order intact, stripe pruning still proves ranges") {
    val dir = tmpDir("surg-sort")
    writeSorted(dir)
    Delete.delete(spark, dir, col("id") >= 70000L)
    assert(Surgery.lastRawChunks.get() > 0, "surgery must have run")
    for (f <- graft.spark.NimbleSource.listFiles(dir)) {
      val r = new graft.format.Tablet.Reader(f)
      try assert(r.footer.sortColumns == Seq("id"), s"sortColumns lost on $f")
      finally r.close()
    }
    // a later delete classifies the surgered file from its (exact) stats:
    // everything >= 70000 is already gone, so this is provably none-match
    val rep2 = Delete.delete(spark, dir, col("id") >= 90000L)
    assert(rep2.rowsDeleted == 0L && rep2.filesRewritten == 0 && rep2.filesDeleted == 0,
      s"stats on the surgered file must prove none-match: $rep2")
    // row order inside the surgered file: monotone id
    val mono = spark.read.format("nimble").load(dir)
      .select(col("id"), org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .withColumn("rn", monotonically_increasing_id())
    val viol = mono.groupBy("p").agg((max("id") - min("id")).as("span"), count(lit(1)).as("n"))
      .filter(col("span") =!= col("n") - 1).count()
    assert(viol == 0L, "ids within each file must stay contiguous ascending after surgery")
  }

  test("null semantics: rows where the predicate is NULL are kept") {
    val dir = tmpDir("surg-null")
    (0L until 20000L).map(i => (i, if (i % 7 == 0) None else Some(i % 100)))
      .toDF("id", "grade")
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("rowsPerChunk", "1024").mode("overwrite").save(dir)
    // grade >= 50 is NULL on the multiples of 7 — SQL DELETE keeps those
    val rep = Delete.delete(spark, dir, col("grade") >= 50L)
    val left = spark.read.format("nimble").load(dir)
    assert(left.filter(col("grade").isNull).count() == (0L until 20000L).count(_ % 7 == 0),
      "NULL-predicate rows must survive the delete")
    assert(left.filter(col("grade") >= 50L).count() == 0L)
    assert(rep.rowsDeleted == (0L until 20000L).count(i => i % 7 != 0 && i % 100 >= 50))
  }

  test("ineligible files fall back to the rewrite job (blooms present), same result") {
    val dir = tmpDir("surg-bloom")
    spark.range(50000L).toDF("id")
      .withColumn("s", md5(concat(lit("k"), col("id").cast("string"))))
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("bloomFilterColumns", "s").option("rowsPerChunk", "4096")
      .mode("overwrite").save(dir)
    val rep = Delete.delete(spark, dir, col("id") >= 30000L)
    assert(rep.rowsDeleted == 20000L, s"fallback path drifted: $rep")
    assert(Surgery.lastRawChunks.get() == 0L && Surgery.lastRewrittenChunks.get() == 0L,
      "a bloom-bearing file must not take the surgery path")
    assert(spark.read.format("nimble").load(dir).count() == 30000L)
  }

  test("multi-stripe file: fully-kept stripes copy as whole stripe regions, result exact") {
    val dir = tmpDir("surg-stripes")
    spark.range(200000L).toDF("id")
      .withColumn("s", md5(concat(lit("k"), col("id").cast("string"))))
      .withColumn("v", (col("id") % 97).cast("double"))
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("stripeBytes", (512L << 10).toString)
      .option("rowsPerChunk", "4096").mode("overwrite").save(dir)
    val file = graft.spark.NimbleSource.listFiles(dir).head
    val nStripes = {
      val r = new graft.format.Tablet.Reader(file)
      try r.footer.stripes.length finally r.close()
    }
    assert(nStripes >= 4, s"fixture needs several stripes, got $nStripes")
    val expected = spark.read.format("nimble").load(dir)
      .filter(col("id") < 150000L)
      .agg(count(lit(1)), sum("v"), sum(length(col("s")))).collect()(0)
    val rep = Delete.delete(spark, dir, col("id") >= 150000L)
    assert(rep.rowsDeleted == 50000L, s"multi-stripe delete drifted: $rep")
    assert(Surgery.lastRewrittenChunks.get() == 1L,
      s"one boundary chunk rewrites, got ${Surgery.lastRewrittenChunks.get()}")
    // reading the replacement exercises the rebased stripe offsets, the
    // per-stream checksums recomputed at flush, and the copied chunk dirs
    val got = spark.read.format("nimble").load(dir)
      .agg(count(lit(1)), sum("v"), sum(length(col("s")))).collect()(0)
    assert(got == expected, s"multi-stripe surgery drifted: $got vs $expected")
    // stats on the surgered file still prove later classifications
    val rep2 = Delete.delete(spark, dir, col("id") >= 150000L)
    assert(rep2.rowsDeleted == 0L && rep2.filesRewritten == 0, s"stats lost: $rep2")
  }

  test("nanos-split retention delete: chunk classification scales micros stats, mask recombines") {
    val dir = tmpDir("surg-nanos")
    // ns-domain longs stored as the TimestampMicroNano split — the canonical
    // event-table retention shape; values NOT multiples of 1000 so the
    // remainder stream actually matters to the mask
    val rows = 80000L
    spark.range(rows).toDF("id")
      .withColumn("ts", col("id") * 1000000L + (col("id") % 997L))
      .withColumn("v", (col("id") % 61).cast("double"))
      .repartitionByRange(2, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("timestampNanosColumns", "ts")
      .option("rowsPerChunk", "4096").mode("overwrite").save(dir)
    // sanity: the split actually engaged
    locally {
      val r = new graft.format.Tablet.Reader(graft.spark.NimbleSource.listFiles(dir).head)
      try assert(r.keyId("ts#nanos") >= 0, "fixture must store ts as the nanos split")
      finally r.close()
    }
    val cutoff = 60000L * 1000000L + 123L // mid-chunk, sub-microsecond part set
    val expected = spark.read.format("nimble").load(dir)
      .filter(col("ts") < cutoff).agg(count(lit(1)), sum("v")).collect()(0)
    val rep = Delete.delete(spark, dir, col("ts") >= cutoff)
    assert(rep.rowsDeleted == rows - expected.getLong(0), s"nanos delete drifted: $rep")
    // surgery must have engaged (ts ascends with id, so the micros-domain
    // chunk stats prune almost everything) and rewritten ~1 boundary chunk
    assert(Surgery.lastRawChunks.get() > 0, "nanos-split filter must not disqualify surgery")
    assert(Surgery.lastRewrittenChunks.get() <= 2,
      s"boundary-chunk economics lost: ${Surgery.lastRewrittenChunks.get()} rewritten")
    val got = spark.read.format("nimble").load(dir)
      .agg(count(lit(1)), sum("v")).collect()(0)
    assert(got == expected, s"nanos-split surgery drifted: $got vs $expected")
    // the sub-microsecond boundary: rows at exactly cutoff-1 ns survive
    assert(spark.read.format("nimble").load(dir)
      .agg(max("ts")).collect()(0).getLong(0) < cutoff)
  }

  test("literal UPDATE surgery: only the assigned column's touched chunks re-encode") {
    val dir = tmpDir("surg-upd")
    writeSorted(dir)
    val before = spark.read.format("nimble").load(dir)
      .agg(sum(length(col("s"))), count(lit(1))).collect()(0)
    val rep = Delete.update(spark, dir,
      col("id") >= 40000L && col("id") < 41000L, Map("v" -> lit(-1.0)))
    assert(rep.rowsDeleted == 0L && rep.rowsRemaining == 100000L, s"update drifted: $rep")
    // chunk economics: the keyhole touches ~1 chunk per boundary — the bulk
    // raw-copies; a rewritten chunk re-encodes ONLY column v (counters are
    // per chunk-range, so just pin the rewrite count is tiny)
    assert(Surgery.lastRewrittenChunks.get() >= 1L &&
      Surgery.lastRewrittenChunks.get() <= 2L,
      s"keyhole update must touch ~1 chunk, got ${Surgery.lastRewrittenChunks.get()}")
    assert(Surgery.lastRawChunks.get() >= 10L, "the bulk must raw-copy")
    val after = spark.read.format("nimble").load(dir)
    assert(after.filter(col("id") >= 40000L && col("id") < 41000L)
      .filter(col("v") =!= -1.0).count() == 0L, "matched rows must carry the literal")
    assert(after.filter(col("v") === -1.0).count() == 1000L, "only matched rows change")
    // untouched column s survives byte-identically; stats stay answer-grade
    val got = after.agg(sum(length(col("s"))), count(lit(1))).collect()(0)
    assert(got == before, s"unassigned column drifted: $got vs $before")
    assert(after.agg(min("v")).collect()(0).getDouble(0) == -1.0,
      "assigned stream's stripe stats must reflect the new values")
  }

  test("UPDATE surgery: null literal sets nulls; non-literal assignment falls back") {
    val dir = tmpDir("surg-updnull")
    writeSorted(dir, rows = 30000L)
    Delete.update(spark, dir, col("id") < 100L,
      Map("s" -> lit(null).cast("string")))
    val after = spark.read.format("nimble").load(dir)
    assert(after.filter(col("s").isNull).count() == 100L)
    assert(after.filter(col("id") >= 100L && col("s").isNull).count() == 0L)
    // non-literal (expression) assignment: same result through the rewrite job
    Surgery.resetCounters()
    Delete.update(spark, dir, col("id") < 50L, Map("v" -> (col("v") + 1000.0)))
    assert(Surgery.lastRawChunks.get() == 0L && Surgery.lastRewrittenChunks.get() == 0L,
      "expression assignments must not take the surgery path")
    assert(spark.read.format("nimble").load(dir)
      .filter(col("v") >= 1000.0).count() == 50L)
  }

  test("string-predicate surgery: FSST/dict chunks round-trip the keep mask") {
    val dir = tmpDir("surg-str")
    (0L until 30000L).map(i => (i, if (i % 3 == 0) s"drop-$i" else s"keep-$i"))
      .toDF("id", "tag")
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("rowsPerChunk", "2048").mode("overwrite").save(dir)
    val rep = Delete.delete(spark, dir, col("tag").startsWith("drop-"))
    assert(rep.rowsDeleted == 10000L, s"string delete drifted: $rep")
    val left = spark.read.format("nimble").load(dir).select("tag").as[String].collect()
    assert(left.length == 20000 && left.forall(_.startsWith("keep-")))
  }
}
