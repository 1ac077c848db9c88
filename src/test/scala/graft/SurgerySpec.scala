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

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bloom+index delete surgery: blooms adopted, index positions remapped, lookups exact") {
    val dir = tmpDir("surg-idx")
    spark.range(100000L).toDF("id")
      .withColumn("s", md5(concat(lit("k"), col("id").cast("string"))))
      .withColumn("v", (col("id") % 97).cast("double"))
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("indexColumns", "s").option("bloomFilterColumns", "s")
      .option("rowsPerChunk", "4096").mode("overwrite").save(dir)
    // tail retention delete, then a HEAD delete: head-dropped chunks shift
    // every later chunk's ordinal and the head boundary chunk's kept rows
    // take non-zero ranks — both axes of the index position remap
    val rep1 = Delete.delete(spark, dir, col("id") >= 70000L)
    assert(rep1.rowsDeleted == 30000L, s"tail delete drifted: $rep1")
    assert(Surgery.lastRawChunks.get() > 0,
      "an index+bloom-bearing file must take the surgery path now")
    assert(Surgery.lastRewrittenChunks.get() == 1L)
    val rep2 = Delete.delete(spark, dir, col("id") < 20000L)
    assert(rep2.rowsDeleted == 20000L, s"head delete drifted: $rep2")
    assert(Surgery.lastRewrittenChunks.get() <= 1L)
    // blooms survived into the replacement stripes (adopted supersets)
    locally {
      val f = graft.spark.NimbleSource.listFiles(dir).head
      val r = new graft.format.Tablet.Reader(f)
      try {
        val sid = r.keyId("s")
        assert((0 until r.footer.stripes.length).exists(s => r.streamBloom(s, sid).nonEmpty),
          "stripe blooms must survive delete surgery")
        assert(r.footer.streamKeys.exists(_.startsWith("#idx:")), "hash index stream lost")
        assert(r.footer.streamKeys.exists(_.startsWith("#sidx:")), "sorted index stream lost")
      } finally r.close()
    }
    // point lookups through the remapped index: the head-boundary chunk's
    // kept rows (rank-shifted), a mid raw chunk (ordinal-shifted), the last
    // kept row, and two deleted keys (bloom may pass; verification must not)
    for (id <- Seq(20000L, 20479L, 50000L, 69999L)) {
      val (rows, m) = graft.format.Lookup.pointLookupMetered(dir, "s", md5hex(s"k$id"))
      assert(rows.length == 1, s"lookup k$id found ${rows.length} rows")
      assert(rows.head("id") == id && rows.head("v") == (id % 97).toDouble,
        s"lookup k$id returned wrong row ${rows.head} — index positions misremapped")
      assert(m.indexProbes > 0, s"lookup k$id did not use the index")
      assert(m.rowsDecoded <= 8192, s"lookup k$id decoded ${m.rowsDecoded} rows — index not used")
    }
    for (id <- Seq(10000L, 75000L)) {
      val (rows, _) = graft.format.Lookup.pointLookupMetered(dir, "s", md5hex(s"k$id"))
      assert(rows.isEmpty, s"deleted key k$id still resolves: $rows")
    }
  }

  test("composite-index delete surgery: #cidx entries remap, composite lookups exact") {
    val dir = tmpDir("surg-cidx")
    spark.range(60000L).toDF("id")
      .withColumn("cat", concat(lit("c"), (col("id") % 7).cast("string")))
      .withColumn("v", (col("id") % 89).cast("double"))
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("indexColumns", "cat+id")
      .option("rowsPerChunk", "4096").mode("overwrite").save(dir)
    val rep = Delete.delete(spark, dir, col("id") >= 40000L)
    assert(rep.rowsDeleted == 20000L, s"composite delete drifted: $rep")
    assert(Surgery.lastRawChunks.get() > 0, "cidx-bearing file must take surgery")
    for (id <- Seq(5L, 20003L, 39999L)) {
      val rows = graft.format.Lookup.compositeLookup(dir, Seq("cat", "id"),
        Seq(s"c${id % 7}", id))
      assert(rows.length == 1 && rows.head("v") == (id % 89).toDouble,
        s"composite lookup ($id) wrong after remap: $rows")
    }
    assert(graft.format.Lookup.compositeLookup(dir, Seq("cat", "id"),
      Seq(s"c${45000 % 7}", 45000L)).isEmpty, "deleted composite key still resolves")
  }

  test("scattered-mask delete on an indexed table: non-prefix kept-ranks remap exactly") {
    val dir = tmpDir("surg-scatter")
    spark.range(30000L).toDF("id")
      .withColumn("s", md5(concat(lit("k"), col("id").cast("string"))))
      .withColumn("v", (col("id") % 97).cast("double"))
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("indexColumns", "s")
      .option("rowsPerChunk", "2048").mode("overwrite").save(dir)
    // v == 13 scatters through the first chunks: masks with interior holes,
    // so kept rows map to STRICTLY SMALLER in-chunk ranks
    val rep = Delete.delete(spark, dir, col("v") === 13.0 && col("id") < 8192L)
    assert(rep.rowsDeleted > 0 && Surgery.lastRewrittenChunks.get() > 0,
      s"scattered delete must rewrite mixed chunks: $rep")
    for (id <- Seq(500L, 5000L, 8191L, 20000L) if id % 97 != 13) {
      val (rows, _) = graft.format.Lookup.pointLookupMetered(dir, "s", md5hex(s"k$id"))
      assert(rows.length == 1 && rows.head("id") == id,
        s"kept key k$id misresolved after scattered remap: $rows")
    }
    assert(graft.format.Lookup.pointLookup(dir, "s", md5hex(s"k${13L}")).isEmpty,
      "deleted scattered key must not resolve")
  }

  test("UPDATE surgery on an indexed+bloomed table: index copied verbatim, lookups see new values") {
    val dir = tmpDir("surg-updidx")
    spark.range(50000L).toDF("id")
      .withColumn("s", md5(concat(lit("k"), col("id").cast("string"))))
      .withColumn("v", (col("id") % 97).cast("double"))
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("indexColumns", "s").option("bloomFilterColumns", "s")
      .option("rowsPerChunk", "4096").mode("overwrite").save(dir)
    val rep = Delete.update(spark, dir,
      col("id") >= 30000L && col("id") < 30500L, Map("v" -> lit(-5.0)))
    assert(rep.rowsRemaining == 50000L, s"update drifted: $rep")
    assert(Surgery.lastRawChunks.get() > 0 && Surgery.lastRewrittenChunks.get() >= 1L,
      "indexed file must take the UPDATE surgery path")
    // rows never moved: the verbatim-copied index must resolve keys inside
    // AND outside the keyhole, with the keyhole rows showing the literal
    for ((id, want) <- Seq(30200L -> -5.0, 10000L -> (10000L % 97).toDouble)) {
      val (rows, m) = graft.format.Lookup.pointLookupMetered(dir, "s", md5hex(s"k$id"))
      assert(rows.length == 1 && rows.head("v") == want,
        s"post-update lookup k$id wrong: $rows")
      assert(m.indexProbes > 0, s"post-update lookup k$id did not use the index")
    }
    // blooms survived on the unassigned key column
    locally {
      val f = graft.spark.NimbleSource.listFiles(dir).head
      val r = new graft.format.Tablet.Reader(f)
      try {
        val sid = r.keyId("s")
        assert((0 until r.footer.stripes.length).exists(s => r.streamBloom(s, sid).nonEmpty),
          "unassigned column's blooms must survive update surgery")
      } finally r.close()
    }
  }

  test("UPDATE surgery literals: date / timestamp / decimal store their physical reprs") {
    val dir = tmpDir("surg-dtdec")
    spark.range(40000L).toDF("id")
      .withColumn("d", date_add(lit("2020-01-01").cast("date"), (col("id") % 100).cast("int")))
      .withColumn("ts", timestamp_micros(col("id") * 1000000L + col("id") % 997L))
      .withColumn("m", (col("id") % 1000).cast("decimal(12,2)"))
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("rowsPerChunk", "4096").mode("overwrite").save(dir)
    val d0 = java.sql.Date.valueOf("1999-12-31")
    val t0 = java.sql.Timestamp.valueOf("2001-02-03 04:05:06.789")
    Surgery.resetCounters()
    val rep = Delete.update(spark, dir,
      col("id") >= 10000L && col("id") < 10100L,
      Map("d" -> lit(d0), "ts" -> lit(t0), "m" -> lit(new java.math.BigDecimal("12.34"))))
    assert(rep.rowsRemaining == 40000L, s"typed-literal update drifted: $rep")
    assert(Surgery.lastRewrittenChunks.get() >= 1L && Surgery.lastRawChunks.get() > 0,
      "date/timestamp/decimal literals must take the surgery path (r18 verdict #5)")
    val after = spark.read.format("nimble").load(dir)
    val hit = after.filter(col("id") === 10050L).collect()(0)
    assert(hit.getAs[java.sql.Date]("d").toString == "1999-12-31", s"date literal wrong: $hit")
    assert(hit.getAs[java.sql.Timestamp]("ts") == t0, s"timestamp literal wrong: $hit")
    assert(hit.getAs[java.math.BigDecimal]("m").compareTo(new java.math.BigDecimal("12.34")) == 0,
      s"decimal literal wrong: $hit")
    // untouched rows keep their original typed values
    val miss = after.filter(col("id") === 20000L).collect()(0)
    assert(miss.getAs[java.sql.Date]("d").toString == "2020-01-01", s"untouched date drifted: $miss")
    assert(miss.getAs[java.math.BigDecimal]("m")
      .compareTo(new java.math.BigDecimal(20000 % 1000).setScale(2)) == 0)
    // a scale-mismatched decimal literal is a real cast — must fall back
    Surgery.resetCounters()
    Delete.update(spark, dir, col("id") < 50L,
      Map("m" -> lit(new java.math.BigDecimal("7"))))
    assert(Surgery.lastRewrittenChunks.get() == 0L,
      "scale-mismatched decimal must not take the literal-surgery path")
    assert(spark.read.format("nimble").load(dir)
      .filter(col("id") < 50L && col("m") =!= new java.math.BigDecimal("7.00")).count() == 0L)
  }

  test("big-stripe surgery: footer-dropped chunk stats recover from inline frame headers") {
    val dir = tmpDir("surg-bigstripe")
    // 313 chunks in one stripe (rowsPerChunk 64): beyond MaxDirStatsFrames
    // (256) the footer drops the per-chunk stats block — the shape every
    // multi-GB single file hits at the default 16K-row chunks, which
    // silently forced O(file) rewrites until r19
    spark.range(20000L).toDF("id")
      .withColumn("v", (col("id") % 97).cast("double"))
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("rowsPerChunk", "64").mode("overwrite").save(dir)
    locally { // fixture sanity: the footer really dropped the chunk stats
      val r = new graft.format.Tablet.Reader(graft.spark.NimbleSource.listFiles(dir).head)
      try assert(r.chunkDirOf(0, r.keyId("id")).exists(c => c.isData && c.stats == null),
        "fixture must exceed MaxDirStatsFrames")
      finally r.close()
    }
    val expected = spark.read.format("nimble").load(dir)
      .filter(col("id") < 15000L).agg(count(lit(1)), sum("v")).collect()(0)
    val rep = Delete.delete(spark, dir, col("id") >= 15000L)
    assert(rep.rowsDeleted == 5000L, s"big-stripe delete drifted: $rep")
    assert(Surgery.lastRawChunks.get() > 200L,
      s"recovered-stats classification must raw-copy the kept bulk, got ${Surgery.lastRawChunks.get()}")
    assert(Surgery.lastRewrittenChunks.get() <= 1L,
      s"boundary economics lost: ${Surgery.lastRewrittenChunks.get()} rewritten")
    val got = spark.read.format("nimble").load(dir)
      .agg(count(lit(1)), sum("v")).collect()(0)
    assert(got == expected, s"big-stripe surgery drifted: $got vs $expected")
    // recovered stats folded exactly: pushdown still answer-grade
    assert(spark.read.format("nimble").load(dir)
      .agg(min("id"), max("id")).collect()(0).toSeq == Seq(0L, 14999L))
  }

  test("flatmap delete surgery: value-stream masks project through the in-map, result exact") {
    val dir = tmpDir("surg-fm")
    // 60K rows x 6-of-40 keys: the reference's flagship layout; values ride
    // id so every chunk is distinguishable, and key presence is scattered
    // so mixed-chunk value masks have interior holes
    spark.range(60000L).toDF("id")
      .selectExpr("id",
        "map_from_arrays(" +
          "transform(sequence(0, 5), i -> concat('f', pmod(id * 7 + i * 11, 40))), " +
          "transform(sequence(0, 5), i -> CAST(id * 10 + i AS DOUBLE))) AS m",
        "CAST(id % 97 AS DOUBLE) AS v")
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("flatMapColumns", "m").option("rowsPerChunk", "4096")
      .mode("overwrite").save(dir)
    val table = spark.read.format("nimble").load(dir)
    val expected = table.filter(col("id") < 40000L)
      .selectExpr("id", "v", "aggregate(map_values(m), CAST(0 AS DOUBLE), (a, x) -> a + x) AS ms")
      .agg(count(lit(1)), sum("v"), sum("ms")).collect()(0)
    val rep = Delete.delete(spark, dir, col("id") >= 40000L)
    assert(rep.rowsDeleted == 20000L, s"flatmap delete drifted: $rep")
    // counters are per row-range: 15 ranges, 9 kept whole, 1 straddles
    assert(Surgery.lastRawChunks.get() >= 8L,
      s"flatmap file must take surgery now (raw=${Surgery.lastRawChunks.get()}, refusal='${Surgery.lastRefusal}')")
    assert(Surgery.lastRewrittenChunks.get() <= 2L,
      s"boundary economics lost: ${Surgery.lastRewrittenChunks.get()} rewritten")
    val got = spark.read.format("nimble").load(dir)
      .selectExpr("id", "v", "aggregate(map_values(m), CAST(0 AS DOUBLE), (a, x) -> a + x) AS ms")
      .agg(count(lit(1)), sum("v"), sum("ms")).collect()(0)
    assert(got == expected, s"flatmap surgery drifted: $got vs $expected")
    // per-key feature projection still prunes + answers exactly
    val fmt = spark.read.format("nimble").option("flatMapStruct.m", "f3").load(dir)
    val exp3 = table.filter(col("id") < 40000L)
      .select(element_at(col("m"), "f3").as("f3")).agg(sum("f3")).collect()(0)
    assert(fmt.select(col("m.f3").as("f3")).agg(sum("f3")).collect()(0) == exp3,
      "per-key projection drifted after flatmap surgery")
  }

  test("flatmap delete surgery: scattered predicate, per-key chunks keep in-map alignment") {
    val dir = tmpDir("surg-fm-scatter")
    spark.range(30000L).toDF("id")
      .selectExpr("id",
        "map_from_arrays(" +
          "transform(sequence(0, 3), i -> concat('k', pmod(id + i * 5, 20))), " +
          "transform(sequence(0, 3), i -> CAST(id + i AS DOUBLE))) AS m",
        "CAST(id % 61 AS DOUBLE) AS v")
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("flatMapColumns", "m").option("rowsPerChunk", "2048")
      .mode("overwrite").save(dir)
    val table = spark.read.format("nimble").load(dir)
    // v == 13 scatters: every touched chunk's keep-mask has interior holes,
    // and each key's value mask is a DIFFERENT projection of it
    val cond = col("v") === 13.0 && col("id") < 10000L
    val expected = table.filter(coalesce(not(cond), lit(true)))
      .selectExpr("id", "v", "aggregate(map_values(m), CAST(0 AS DOUBLE), (a, x) -> a + x) AS ms")
      .collect().map(_.toString).sorted
    val rep = Delete.delete(spark, dir, cond)
    assert(rep.rowsDeleted > 0 && Surgery.lastRewrittenChunks.get() > 0,
      s"scattered flatmap delete must engage surgery: $rep (refusal='${Surgery.lastRefusal}')")
    val got = spark.read.format("nimble").load(dir)
      .selectExpr("id", "v", "aggregate(map_values(m), CAST(0 AS DOUBLE), (a, x) -> a + x) AS ms")
      .collect().map(_.toString).sorted
    assert(got.sameElements(expected), "scattered flatmap surgery drifted")
  }

  test("UPDATE surgery on a flatmap table: map streams raw-copy, assigned column rewrites") {
    val dir = tmpDir("surg-fm-upd")
    spark.range(40000L).toDF("id")
      .selectExpr("id",
        "map_from_arrays(" +
          "transform(sequence(0, 2), i -> concat('g', pmod(id + i * 3, 10))), " +
          "transform(sequence(0, 2), i -> CAST(id + i AS DOUBLE))) AS m",
        "CAST(id % 89 AS DOUBLE) AS v")
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("flatMapColumns", "m").option("rowsPerChunk", "4096")
      .mode("overwrite").save(dir)
    val mapSumBefore = spark.read.format("nimble").load(dir)
      .selectExpr("aggregate(map_values(m), CAST(0 AS DOUBLE), (a, x) -> a + x) AS ms")
      .agg(sum("ms")).collect()(0)
    val rep = Delete.update(spark, dir,
      col("id") >= 20000L && col("id") < 20500L, Map("v" -> lit(-3.0)))
    assert(rep.rowsRemaining == 40000L, s"flatmap update drifted: $rep")
    assert(Surgery.lastRawChunks.get() > 0 && Surgery.lastRewrittenChunks.get() >= 1L,
      s"flatmap UPDATE must take surgery (refusal='${Surgery.lastRefusal}')")
    val after = spark.read.format("nimble").load(dir)
    assert(after.filter(col("v") === -3.0).count() == 500L)
    assert(after.selectExpr(
      "aggregate(map_values(m), CAST(0 AS DOUBLE), (a, x) -> a + x) AS ms")
      .agg(sum("ms")).collect()(0) == mapSumBefore,
      "map streams must survive UPDATE surgery byte-copied")
  }

  test("UPDATE surgery on a nanos-split column: one assignment writes both streams") {
    val dir = tmpDir("surg-upd-nanos")
    val rows = 50000L
    spark.range(rows).toDF("id")
      .withColumn("ts", col("id") * 1000000L + (col("id") % 997L))
      .withColumn("v", (col("id") % 61).cast("double"))
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("timestampNanosColumns", "ts")
      .option("rowsPerChunk", "4096").mode("overwrite").save(dir)
    // literal with a non-zero sub-microsecond part: floorDiv/floorMod must
    // land in the micros and remainder streams exactly as TsNanosW would
    val redacted = 123456789012L * 1000L + 789L
    Surgery.resetCounters()
    val rep = Delete.update(spark, dir,
      col("id") >= 30000L && col("id") < 30200L, Map("ts" -> lit(redacted)))
    assert(rep.rowsRemaining == rows, s"nanos update drifted: $rep")
    assert(Surgery.lastRewrittenChunks.get() >= 1L && Surgery.lastRawChunks.get() > 0,
      s"nanos-split literal must take surgery (refusal='${Surgery.lastRefusal}')")
    val after = spark.read.format("nimble").load(dir)
    assert(after.filter(col("ts") === redacted).count() == 200L,
      "redacted rows must carry the exact nanos literal")
    assert(after.filter(col("id") === 10000L).collect()(0).getLong(1) ==
      10000L * 1000000L + (10000L % 997L), "untouched rows drifted")
    // NULL redaction (the retention shape): nullability widens, both split
    // streams' null bits agree
    Surgery.resetCounters()
    Delete.update(spark, dir, col("id") < 100L, Map("ts" -> lit(null).cast("long")))
    assert(Surgery.lastRewrittenChunks.get() >= 1L,
      s"nanos NULL literal must take surgery (refusal='${Surgery.lastRefusal}')")
    val af2 = spark.read.format("nimble").load(dir)
    assert(af2.filter(col("ts").isNull).count() == 100L)
    assert(af2.filter(col("id") >= 100L && col("ts").isNull).count() == 0L)
  }

  test("nested-schema delete surgery: struct children + array elements mask through lens") {
    val dir = tmpDir("surg-nested")
    // struct of atomics (row-aligned children), variable-length array
    // (element stream masks through the #len chain), plain map (key/value
    // element streams share the #len chain)
    spark.range(20000L).toDF("id")
      .withColumn("st", struct((col("id") % 7).as("a"),
        md5(col("id").cast("string")).as("b")))
      .withColumn("arr", sequence(lit(0L), pmod(col("id"), lit(4L))))
      .selectExpr("id", "st", "arr",
        "map_from_arrays(array('x'), array(CAST(id AS DOUBLE))) AS mp")
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("rowsPerChunk", "2048").mode("overwrite").save(dir)
    val table = spark.read.format("nimble").load(dir)
    val fp = Seq("id", "st.a AS sa", "st.b AS sb",
      "aggregate(arr, CAST(0 AS LONG), (x, y) -> x + y) AS arrsum", "size(arr) AS arrn",
      "element_at(mp, 'x') AS mx")
    val expected = table.filter(col("id") < 15000L)
      .selectExpr(fp: _*).collect().map(_.toString).sorted
    Surgery.resetCounters()
    val rep = Delete.delete(spark, dir, col("id") >= 15000L)
    assert(rep.rowsDeleted == 5000L, s"nested delete drifted: $rep")
    assert(Surgery.lastRawChunks.get() > 0L && Surgery.lastRewrittenChunks.get() >= 1L,
      s"nested schemas must take surgery now (refusal='${Surgery.lastRefusal}')")
    val got = spark.read.format("nimble").load(dir)
      .selectExpr(fp: _*).collect().map(_.toString).sorted
    assert(got.sameElements(expected), "nested-schema surgery drifted")
  }

  test("dedup layouts: dict-array / sliding-window-map chunk-scoped stores survive surgery") {
    val dir = tmpDir("surg-dedup")
    // runs of identical arrays/maps: the dedup layouts store each unique
    // once per chunk; kept/mixed chunks raw-copy the store (orphans fine),
    // dropped chunks drop it (chunk-scoped, no cross-references)
    spark.range(30000L).toDF("id")
      .withColumn("g", (col("id") / 50L).cast("long")) // 50-row runs
      .selectExpr("id",
        "array(g, g + 1, g + 2) AS da",
        "map_from_arrays(array('k'), array(g)) AS dm",
        "CAST(id % 43 AS DOUBLE) AS v")
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("dictionaryArrayColumns", "da").option("deduplicatedMapColumns", "dm")
      .option("rowsPerChunk", "2048").mode("overwrite").save(dir)
    locally { // fixture sanity: the dedup layouts actually engaged
      val r = new graft.format.Tablet.Reader(graft.spark.NimbleSource.listFiles(dir).head)
      try {
        assert(r.keyId("da#idx") >= 0, "dict-array layout must engage")
        assert(r.keyId("dm#idx") >= 0, "dedup-map layout must engage")
      } finally r.close()
    }
    val table = spark.read.format("nimble").load(dir)
    val fp = Seq("id", "v", "aggregate(da, CAST(0 AS LONG), (x, y) -> x + y) AS das",
      "element_at(dm, 'k') AS dmk")
    val expected = table.filter(col("id") < 21000L)
      .selectExpr(fp: _*).collect().map(_.toString).sorted
    Surgery.resetCounters()
    val rep = Delete.delete(spark, dir, col("id") >= 21000L)
    assert(rep.rowsDeleted == 9000L, s"dedup-layout delete drifted: $rep")
    assert(Surgery.lastRawChunks.get() > 0L,
      s"dedup layouts must take surgery (refusal='${Surgery.lastRefusal}')")
    val got = spark.read.format("nimble").load(dir)
      .selectExpr(fp: _*).collect().map(_.toString).sorted
    assert(got.sameElements(expected), "dedup-layout surgery drifted")
  }

  test("v15 '#'-bearing flatmap keys take chunk surgery; values and keys survive") {
    // r20 (r19 verdict #3): the v15 "##" escape makes the stream grammar
    // total on flatmap schemas — a '#'-bearing key is no longer ambiguous,
    // so the delete goes through chunk surgery instead of the rewrite.
    val dir = tmpDir("surg-hashkey")
    spark.range(20000L).toDF("id")
      .selectExpr("id",
        "map_from_arrays(array(concat('a#', CAST(pmod(id, 5) AS STRING))), " +
          "array(CAST(id AS DOUBLE))) AS m")
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("flatMapColumns", "m").option("rowsPerChunk", "4096")
      .mode("overwrite").save(dir)
    Surgery.resetCounters()
    val rep = Delete.delete(spark, dir, col("id") >= 15000L)
    assert(rep.rowsDeleted == 5000L, s"delete drifted: $rep")
    assert(Surgery.lastRawChunks.get() > 0L,
      s"'#'-bearing keys must take surgery on v15 files (refusal='${Surgery.lastRefusal}')")
    val back = spark.read.format("nimble").load(dir)
    assert(back.count() == 15000L)
    // the unescaped LOGICAL key round-trips through the surgered file
    assert(back.selectExpr("m['a#3'] AS v").where(col("v").isNotNull).count() == 3000L)
  }

  test("legacy (v14) '#'-bearing flatmap keys still refuse surgery (conservative)") {
    // byte-faithful legacy synthesis: raw (unescaped) stream keys; the
    // minimum-required version stamp then lands on 14 by itself (no "##"
    // anywhere) — exactly what the r19 writer produced for this shape
    val dir = tmpDir("surg-hashkey-legacy")
    graft.format.Fields.testLegacyFmKeys = true
    try {
      spark.range(20000L).toDF("id")
        .selectExpr("id",
          "map_from_arrays(array(concat('a#', CAST(pmod(id, 5) AS STRING))), " +
            "array(CAST(id AS DOUBLE))) AS m")
        .repartitionByRange(1, col("id")).sortWithinPartitions("id")
        .write.format("nimble").option("sortColumns", "id")
        .option("flatMapColumns", "m").option("rowsPerChunk", "4096")
        .mode("overwrite").save(dir)
    } finally graft.format.Fields.testLegacyFmKeys = false
    assert(graft.spark.NimbleSource.footerOf(
      graft.spark.NimbleSource.listFiles(dir).head).version == 14,
      "raw-key synthesis must land on the v14 minimum-required stamp")
    // sanity: the synthesized file reads back with raw keys intact
    assert(spark.read.format("nimble").load(dir)
      .selectExpr("m['a#3'] AS v").where(col("v").isNotNull).count() == 4000L)
    Surgery.resetCounters()
    val rep = Delete.delete(spark, dir, col("id") >= 15000L)
    assert(rep.rowsDeleted == 5000L, s"fallback path drifted: $rep")
    assert(Surgery.lastRawChunks.get() == 0L && Surgery.lastRewrittenChunks.get() == 0L,
      "a raw '#'-bearing key in a legacy file is ambiguous — must fall back to the rewrite")
    assert(spark.read.format("nimble").load(dir).count() == 15000L)
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
