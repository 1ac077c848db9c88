package graft

import org.apache.spark.sql.functions._
import graft.ops.Compaction
import graft.format.Tablet
import graft.spark.NimbleSource

/** OPTIMIZE/compaction: small files merge into few, every footer-declared
  * layout property survives the rewrite (sort order, indexes, blooms, bucket
  * spec, nanos split), data is value-identical, and conflicting layouts are
  * rejected rather than silently dropped. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag")

  private def assertSameData(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("plain table: 16 small files coalesce to 1, values identical, no shuffle") {
    val dir = tmpDir("cmp-plain"); val out = tmpDir("cmp-plain-out")
    li.repartition(16).write.format("nimble").mode("overwrite").save(dir)
    val rep = Compaction.compact(spark, dir, out, targetFileBytes = 1L << 30)
    assert(rep.filesBefore == 16 && rep.filesAfter == 1, rep)
    assert(rep.rows == li.count())
    assert(Compaction.lastCompactRaw.get(),
      "layout-identical plain files must take the raw stripe-concat path")
    assertSameData(spark.read.format("nimble").load(out), li)
  }

  test("raw concat falls back when it cannot prove the contract") {
    val dir = tmpDir("cmp-raw-fb"); val out1 = tmpDir("cmp-raw-fb-o1")
    // overlapping sorted ranges: two appends covering the same key range —
    // concat would break the global order the rewrite re-establishes
    li.repartitionByRange(2, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.format("nimble").option("sortColumns", "l_orderkey")
      .mode("overwrite").save(dir)
    li.limit(500).repartitionByRange(1, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.format("nimble").option("sortColumns", "l_orderkey")
      .mode("append").save(dir)
    val rep = Compaction.compact(spark, dir, out1, targetFileBytes = 1L << 30)
    assert(!Compaction.lastCompactRaw.get(),
      "overlapping sorted file ranges must take the rewrite path")
    assert(rep.rows == li.count() + 500)
    // extra options could change the physical layout: always rewrite
    val out2 = tmpDir("cmp-raw-fb-o2")
    Compaction.compact(spark, out1, out2,
      extraOptions = Map("rowsPerChunk" -> "2048"))
    assert(!Compaction.lastCompactRaw.get(),
      "extraOptions must force the rewrite path")
  }

  test("sorted+indexed table: sort metadata, index streams and probes survive") {
    val dir = tmpDir("cmp-sorted"); val out = tmpDir("cmp-sorted-out")
    li.repartitionByRange(8, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.format("nimble").mode("overwrite")
      .option("sortColumns", "l_orderkey")
      .option("indexColumns", "l_orderkey")
      .option("bloomFilterColumns", "l_returnflag")
      .mode("overwrite").save(dir)
    val rep = Compaction.compact(spark, dir, out, targetFileBytes = 1L << 30)
    assert(rep.filesBefore == 8 && rep.filesAfter == 1, rep)
    assert(Compaction.lastCompactRaw.get(),
      "range-disjoint sorted+indexed files must take the raw stripe-concat path")
    assert(rep.writerOptions("sortColumns") == "l_orderkey")
    assert(rep.writerOptions("indexColumns") == "l_orderkey")
    assert(rep.writerOptions("bloomFilterColumns") == "l_returnflag")
    val files = NimbleSource.listFiles(out)
    val footer = NimbleSource.footerOf(files.head)
    assert(footer.sortColumns == Seq("l_orderkey"))
    assert(footer.streamKeys.contains("#idx:l_orderkey"))
    assert(footer.streamKeys.contains("#sidx:l_orderkey"))
    // the rebuilt index still answers point probes with the scan untouched
    val k = li.agg(max("l_orderkey")).collect()(0).getLong(0)
    val got = spark.read.format("nimble").load(out)
      .filter(col("l_orderkey") === k).count()
    assert(got == li.filter(col("l_orderkey") === k).count())
    assertSameData(spark.read.format("nimble").load(out), li)
  }

  test("bucketed table: bucket spec survives and bucket count is unchanged") {
    val dir = tmpDir("cmp-bucket"); val out = tmpDir("cmp-bucket-out")
    li.write.format("nimble")
      .option("bucketColumns", "l_orderkey").option("numBuckets", "4")
      .mode("overwrite").save(dir)
    val rep = Compaction.compact(spark, dir, out)
    assert(rep.writerOptions("numBuckets") == "4")
    val spec = NimbleSource.bucketSpecOf(NimbleSource.listFiles(out))
    assert(spec.contains((Seq("l_orderkey"), 4)), spec)
    assertSameData(spark.read.format("nimble").load(out), li)
  }

  test("nanos-split events table round-trips through compaction") {
    val dir = tmpDir("cmp-ns"); val out = tmpDir("cmp-ns-out")
    val ev = Tables.parquet(spark, sf(), "events").select("event_id", "ts", "user_id")
    ev.repartition(6).write.format("nimble")
      .option("timestampNanosColumns", "ts").mode("overwrite").save(dir)
    val rep = Compaction.compact(spark, dir, out, targetFileBytes = 1L << 30)
    assert(rep.writerOptions("timestampNanosColumns") == "ts")
    assert(rep.filesAfter == 1)
    val files = NimbleSource.listFiles(out)
    assert(NimbleSource.footerOf(files.head).streamKeys.contains("ts#nanos"))
    assertSameData(spark.read.format("nimble").load(out), ev)
  }

  test("flatmap layout is recovered and re-shredded") {
    val dir = tmpDir("cmp-fm"); val out = tmpDir("cmp-fm-out")
    val df = Seq(
      (1L, Map("a" -> 1.0, "b" -> 2.0)),
      (2L, Map("a" -> 3.0)),
      (3L, Map("c" -> 4.0))).toDF("id", "feat")
    df.repartition(3).write.format("nimble")
      .option("flatMapColumns", "feat").mode("overwrite").save(dir)
    val rep = Compaction.compact(spark, dir, out, targetFileBytes = 1L << 30)
    assert(rep.writerOptions("flatMapColumns") == "feat")
    val keys = NimbleSource.footerOf(NimbleSource.listFiles(out).head).streamKeys
    assert(keys.exists(_.startsWith("feat#in:")), keys.mkString(","))
    // set ops reject MapType: compare on entry arrays in key order instead
    def flat(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), array_sort(map_entries(col("feat"))).as("e"))
    assertSameData(flat(spark.read.format("nimble").load(out)), flat(df))
  }

  test("nested dict-array layout (s.a) recovers by full stream path") {
    val dir = tmpDir("cmp-nested"); val out = tmpDir("cmp-nested-out")
    val df = Seq(
      (1L, (Seq(1, 2), "x")), (2L, (Seq(1, 2), "y")), (3L, (Seq(3), "z"))
    ).toDF("id", "s").selectExpr("id", "named_struct('a', s._1, 'tag', s._2) AS s")
    df.repartition(2).write.format("nimble")
      .option("dictionaryArrayColumns", "s.a").mode("overwrite").save(dir)
    val rep = Compaction.compact(spark, dir, out, targetFileBytes = 1L << 30)
    assert(rep.writerOptions("dictionaryArrayColumns") == "s.a", rep.writerOptions)
    val keys = NimbleSource.footerOf(NimbleSource.listFiles(out).head).streamKeys
    assert(keys.contains("s.a#idx"), keys.mkString(","))
    assertSameData(spark.read.format("nimble").load(out), df)
  }

  test("in-place compaction (outDir == dir) is rejected — the truncate would race the scan") {
    val dir = tmpDir("cmp-inplace")
    li.limit(10).coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, dir, dir)
    }
    assert(e.getMessage.contains("outDir"))
  }

  test("fuzz: random schemas x random layouts survive compaction value-identically (seeded)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(8114)
    for (trial <- 0 until 5) {
      val schema = StructType(Seq(
        StructField("row_id", LongType, nullable = false),
        StructField("ts", LongType, nullable = true),
        StructField("tag", StringType, nullable = true),
        StructField("arr", ArrayType(IntegerType, containsNull = true), nullable = true),
        StructField("m", MapType(StringType, DoubleType, valueContainsNull = true), nullable = true)))
      val n = 200 + rnd.nextInt(400)
      val rows = (0 until n).map { i =>
        Row(i.toLong,
          if (rnd.nextInt(10) == 0) null else rnd.nextLong() % 1_000_000_000_000L,
          Seq("a", "b", "c", null)(rnd.nextInt(4)),
          if (rnd.nextInt(8) == 0) Seq(1, 2) else Seq.fill(rnd.nextInt(3))(rnd.nextInt()),
          (0 until rnd.nextInt(3)).map(k => s"k$k" -> rnd.nextDouble()).toMap)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3 + rnd.nextInt(3)), schema)
      // random layout subset — every recovered option must survive the rewrite
      var opts = Map.empty[String, String]
      if (rnd.nextBoolean()) opts += "timestampNanosColumns" -> "ts"
      if (rnd.nextBoolean()) opts += "indexColumns" -> "row_id"
      if (rnd.nextBoolean()) opts += "bloomFilterColumns" -> "tag"
      if (rnd.nextBoolean()) opts += "dictionaryArrayColumns" -> "arr"
      if (rnd.nextBoolean()) opts += "deduplicatedMapColumns" -> "m"
      val dir = tmpDir(s"cmp-fuzz$trial"); val out = tmpDir(s"cmp-fuzz$trial-out")
      var w = df.write.format("nimble").mode("overwrite")
      opts.foreach { case (k, v) => w = w.option(k, v) }
      w.save(dir)
      val rep = Compaction.compact(spark, dir, out, targetFileBytes = 1L << 30)
      assert(rep.filesAfter == 1, s"trial $trial: $rep")
      opts.foreach { case (k, v) =>
        assert(rep.writerOptions.get(k).contains(v), s"trial $trial: $k lost: ${rep.writerOptions}")
      }
      // re-recovery over the compacted dir must see the same layout
      val again = Compaction.recoverLayout(out).filter { case (k, _) => opts.contains(k) }
      assert(again == opts, s"trial $trial: recovered $again from compacted, wrote $opts")
      val want = df.toJSON.collect().sorted
      val got = spark.read.format("nimble").load(out).toJSON.collect().sorted
      assert(want.length == got.length, s"trial $trial")
      for (i <- want.indices if want(i) != got(i))
        fail(s"trial $trial row $i:\n  want ${want(i)}\n  got  ${got(i)}")
    }
  }

  test("conflicting sort declarations across files are rejected loudly") {
    val dir = tmpDir("cmp-mixed")
    li.limit(100).sort("l_orderkey").coalesce(1).write.format("nimble")
      .option("sortColumns", "l_orderkey").mode("overwrite").save(dir)
    li.limit(100).coalesce(1).write.format("nimble").mode("append").save(dir)
    val e = intercept[IllegalArgumentException] {
      Compaction.recoverLayout(dir)
    }
    assert(e.getMessage.contains("conflicting"))
  }

  test("compactSmall: merges only the small-file tail; big files never touched") {
    val dir = tmpDir("cmps-tail")
    // big file first (one partition, all rows), then a 12-file small tail
    li.limit(40000).coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val big = graft.format.GraftIO.listGft(dir)
    assert(big.length == 1)
    val bigPath = big.head.path
    val bigLen = big.head.length
    val bigMtime = new java.io.File(bigPath).lastModified()
    li.limit(2400).repartition(12).write.format("nimble").mode("append").save(dir)
    assert(graft.format.GraftIO.listGft(dir).length == 13)

    val rep = Compaction.compactSmall(spark, dir,
      minFileBytes = bigLen, targetFileBytes = 1L << 30)
    assert(rep.filesBefore == 13 && rep.filesAfter == 2, rep)
    // the big file is bit-untouched: same path, length and mtime
    val f = new java.io.File(bigPath)
    assert(f.exists() && f.length() == bigLen && f.lastModified() == bigMtime,
      "compactSmall must not rewrite or touch well-sized files")
    val want = li.limit(40000).unionAll(li.limit(2400))
    assertSameData(spark.read.format("nimble").load(dir), want)
  }

  test("compactSmall: sorted table keeps per-file sort + index; no-op under 2 victims") {
    val dir = tmpDir("cmps-sorted")
    val src = li.repartitionByRange(10, col("l_orderkey")).sortWithinPartitions("l_orderkey")
    src.write.format("nimble").mode("overwrite")
      .option("sortColumns", "l_orderkey").option("indexColumns", "l_orderkey")
      .save(dir)
    assert(graft.format.GraftIO.listGft(dir).length == 10)
    val rep = Compaction.compactSmall(spark, dir,
      minFileBytes = 1L << 30, targetFileBytes = 1L << 30) // everything is "small"
    assert(rep.filesAfter == 1, rep)
    val layout = Compaction.recoverLayout(dir)
    assert(layout.get("sortColumns").contains("l_orderkey"), layout)
    assert(layout.get("indexColumns").contains("l_orderkey"), layout)
    assertSameData(spark.read.format("nimble").load(dir), li)
    // indexed point probe still answers on the swapped-in file
    val k = li.select(min("l_orderkey")).head().getLong(0)
    assert(spark.read.format("nimble").load(dir).filter(col("l_orderkey") === k).count() ==
      li.filter(col("l_orderkey") === k).count())

    // a single small file: no-op, nothing rewritten
    val one = tmpDir("cmps-noop")
    li.limit(100).coalesce(1).write.format("nimble").mode("overwrite").save(one)
    val p0 = graft.format.GraftIO.listGft(one).head
    val m0 = new java.io.File(p0.path).lastModified()
    val rep2 = Compaction.compactSmall(spark, one)
    assert(rep2.filesBefore == 1 && rep2.filesAfter == 1)
    assert(new java.io.File(p0.path).lastModified() == m0)
  }

  test("compaction of an unsigned-widened table stays in the stored domain") {
    import spark.implicits._
    // compact never sees the unsignedColumns read option — it reads and
    // rewrites the raw stored values (or byte-moves stripes), so the
    // physical domain is preserved by construction; pin it: high-half
    // (stored-negative) values survive value-identically through compact,
    // and the widened read of the output matches the input's
    val dir = tmpDir("cmp-unsigned"); val out = tmpDir("cmp-unsigned-out")
    spark.range(30000L)
      .selectExpr("id", "CAST(CASE WHEN id % 3 = 0 THEN -(id % 100) - 1 ELSE id % 100 END AS SHORT) AS u")
      .repartition(6).write.format("nimble").mode("overwrite").save(dir)
    val before = spark.read.format("nimble").option("unsignedColumns", "u").load(dir)
      .select("id", "u").as[(Long, Long)].collect().sorted.toSeq
    Compaction.compact(spark, dir, out, targetFileBytes = 1L << 31)
    val storedType = org.apache.spark.sql.types.DataType
      .fromJson(NimbleSource.footerOf(NimbleSource.listFiles(out).head).schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]("u").dataType
    assert(storedType == org.apache.spark.sql.types.ShortType, "stored domain must survive")
    val after = spark.read.format("nimble").option("unsignedColumns", "u").load(out)
      .select("id", "u").as[(Long, Long)].collect().sorted.toSeq
    assert(after == before)
    assert(after.exists(_._2 > 65000L), "high-half (stored-negative) values present")
  }

  test("legacy raw '##' flatmap keys never raw-concat into a v15 stamp (r20 review)") {
    import spark.implicits._
    // a pre-v15 writer stored logical key "x##y" RAW as "m#in:x##y"; raw
    // concat copies stream names verbatim into a current writer whose
    // minimum-required stamp would read "##" as v15-escaped — the compacted
    // file would silently rename the key to "x#y". Such sources must take
    // the shuffle rewrite, which decodes logical keys under the source's
    // own convention and re-writes them correctly escaped.
    val dir = tmpDir("cmp-legacy-hash"); val out = tmpDir("cmp-legacy-hash-out")
    graft.format.Fields.testLegacyFmKeys = true
    try {
      spark.range(6000L)
        .selectExpr("id", "map('x##y', CAST(id AS DOUBLE)) AS m")
        .repartition(3).write.format("nimble")
        .option("flatMapColumns", "m").mode("overwrite").save(dir)
    } finally graft.format.Fields.testLegacyFmKeys = false
    val srcFooter = NimbleSource.footerOf(NimbleSource.listFiles(dir).head)
    assert(srcFooter.version == 14 && srcFooter.streamKeys.contains("m#in:x##y"),
      s"legacy synthesis drifted: v${srcFooter.version} ${srcFooter.streamKeys.mkString(",")}")
    Compaction.compact(spark, dir, out, targetFileBytes = 1L << 31)
    assert(!Compaction.lastCompactRaw.get(),
      "legacy '##' keys must NOT take the raw stripe-concat path")
    // the rewritten output is v15-escaped and the LOGICAL key survives
    val outFooter = NimbleSource.footerOf(NimbleSource.listFiles(out).head)
    assert(outFooter.version == 15 && outFooter.streamKeys.contains("m#in:x####y"),
      s"rewrite must re-escape: v${outFooter.version} ${outFooter.streamKeys.mkString(",")}")
    val got = spark.read.format("nimble").load(out)
      .selectExpr("sum(m['x##y'])").collect()(0).getDouble(0)
    assert(got == (0L until 6000L).sum.toDouble, s"logical key drifted: $got")
  }

  test("compactSmall refuses bucketed tables") {
    val dir = tmpDir("cmps-bucketed")
    li.write.format("nimble").mode("overwrite")
      .option("bucketColumns", "l_orderkey").option("numBuckets", "4").save(dir)
    val e = intercept[IllegalArgumentException] {
      Compaction.compactSmall(spark, dir)
    }
    assert(e.getMessage.contains("bucket"))
  }
}
