package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** End-to-end connector round-trips + pushdown equivalence on the driver
  * testdata (FIXTURES.md F2/F3/F5; reference test idiom `writeAndVerify`,
  * dwio/nimble/velox/tests/VeloxReaderTest.cpp:805). */
class ConnectorSpec extends SparkTestBase {

  private def assertSameData(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema.map(f => (f.name, f.dataType)) == b.schema.map(f => (f.name, f.dataType)),
      s"schema mismatch:\n${a.schema}\n${b.schema}")
    val ac = a.collect()
    val bc = b.collect()
    assert(ac.length == bc.length, s"row count ${ac.length} vs ${bc.length}")
    val as = ac.map(_.toString).sorted
    val bs = bc.map(_.toString).sorted
    var i = 0
    while (i < as.length) {
      assert(as(i) == bs(i), s"row $i differs: ${as(i)} vs ${bs(i)}")
      i += 1
    }
  }

  private def roundTrip(df: DataFrame, name: String): DataFrame = {
    val dir = tmpDir(name)
    df.write.format("nimble").mode("overwrite").save(dir)
    spark.read.format("nimble").load(dir)
  }

  test("lineitem full round-trip sf0.001") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    assertSameData(pq, roundTrip(pq, "li"))
  }

  test("all tables round-trip sf0.001") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders", "events", "documents")) {
      val pq = spark.read.parquet(s"${sf()}/$t.parquet")
      assertSameData(pq, roundTrip(pq, t))
    }
  }

  test("embeddings (array<float>) round-trip") {
    val pq = spark.read.parquet(s"${sf()}/embeddings.parquet")
    assertSameData(pq, roundTrip(pq, "emb"))
  }

  test("append mode accumulates files; job-tagged names cannot collide") {
    import spark.implicits._
    val dir = tmpDir("append")
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val b = Seq((3L, "c"), (4L, "d")).toDF("id", "s")
    a.coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    b.coalesce(1).write.format("nimble").mode("append").save(dir)
    val files = graft.spark.NimbleSource.listFiles(dir)
    assert(files.length == 2, s"expected 2 files, got $files")
    val got = spark.read.format("nimble").load(dir).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L))
  }

  test("compression codecs: lz4 and none round-trip, zstd is the default") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    for (codec <- Seq("lz4", "none")) {
      val dir = tmpDir(s"comp-$codec")
      pq.write.format("nimble").option("compression", codec).mode("overwrite").save(dir)
      assertSameData(pq, spark.read.format("nimble").load(dir))
    }
  }

  test("projection pushdown reads only selected columns") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val nb = roundTrip(pq, "proj").select("l_orderkey", "l_quantity")
    assertSameData(pq.select("l_orderkey", "l_quantity"), nb)
    val plan = nb.queryExecution.executedPlan.toString
    assert(plan.contains("l_orderkey"), plan)
  }

  test("filter pushdown equivalence (numeric, string, in-set, between)") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val dir = tmpDir("filt")
    pq.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    def check(f: DataFrame => DataFrame): Unit = assertSameData(f(pq), f(nb))
    check(_.filter(col("l_quantity") > 45))
    check(_.filter(col("l_quantity") >= 45 && col("l_discount") < 0.05))
    check(_.filter(col("l_returnflag") === "A"))
    check(_.filter(col("l_returnflag").isin("A", "N")))
    check(_.filter(col("l_returnflag") =!= "A"))
    check(_.filter(col("l_shipdate").between("1994-01-01", "1994-12-31")))
    check(_.filter(col("l_orderkey") % 2 === 0)) // residual (not pushable)
    check(_.filter(col("l_returnflag").startsWith("A")))
    check(_.filter(col("l_quantity") > 100)) // selects nothing
    check(_.filter(col("l_quantity").isNotNull))
    check(_.select(count(lit(1)))) // zero-column projection
    check(_.filter(col("l_quantity") > 30).select(count(lit(1))))
  }

  test("nulls round-trip") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 1.5), (null, null, null), (3L, "", 0.0), (null, "d", null)
    ).toDF("l", "s", "d")
    assertSameData(df, roundTrip(df, "nulls"))
    val nb = roundTrip(df, "nulls2")
    assertSameData(df.filter(col("l").isNull), nb.filter(col("l").isNull))
    assertSameData(df.filter(col("s").isNotNull), nb.filter(col("s").isNotNull))
  }

  test("nested struct/array/map round-trip (F3)") {
    import spark.implicits._
    val df = spark.sql("""
      SELECT id,
        CASE WHEN id % 7 = 0 THEN NULL ELSE array(concat('tag', id % 5), 'x') END AS tags,
        array(cast(id AS double) / 3.0, 2.5) AS scores,
        CASE WHEN id % 11 = 0 THEN NULL ELSE map(concat('k', id % 3), concat('v', id)) END AS attrs,
        named_struct('city', concat('city', id % 10), 'zip', cast(id % 99999 AS int),
                     'geo', named_struct('lat', cast(id AS double) / 100, 'lon', -cast(id AS double))) AS addr,
        array(array(cast(id AS int), 2), array(3)) AS matrix,
        map(cast(id % 5 AS int), array(concat('s', id))) AS maplist
      FROM range(1000)
    """)
    assertSameData(df, roundTrip(df, "nested"))
  }

  test("nested with pushed filter on atomic column") {
    val df = spark.sql("""
      SELECT id, named_struct('a', id * 2, 'b', concat('x', id)) AS st, array(id, id + 1) AS ar
      FROM range(5000)
    """)
    val nb = roundTrip(df, "nestedf")
    assertSameData(df.filter(col("id") > 4500), nb.filter(col("id") > 4500))
    assertSameData(df.filter(col("id") === 17), nb.filter(col("id") === 17))
  }

  test("nested schema pruning: only requested struct fields are read") {
    val df = spark.sql("""
      SELECT id, named_struct('a', id, 'b', concat('big_', repeat('x', 100)),
                              'c', id * 2) AS st
      FROM range(2000)""")
    val dir = tmpDir("nestprune")
    df.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val sel = nb.select(col("id"), col("st.a"))
    assertSameData(df.select(col("id"), col("st.a")), sel)
    // the pruned scan schema must not mention the heavy field b
    val scanLine = sel.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("read=")).getOrElse("")
    assert(scanLine.contains("st:struct<a:bigint>"), s"nested pruning missing: $scanLine")
    assert(!scanLine.contains("b:string"), s"nested pruning leaked field b: $scanLine")
  }

  test("bloomFilterColumns validates loudly: typos and unsupported types refuse") {
    import spark.implicits._
    val df = Seq((1L, 1.5)).toDF("id", "d")
    val e1 = intercept[Exception] {
      df.write.format("nimble").option("bloomFilterColumns", "nope")
        .mode("overwrite").save(tmpDir("bloom-typo"))
    }
    assert(e1.getMessage.contains("no such column"), e1.getMessage)
    val e2 = intercept[Exception] {
      df.write.format("nimble").option("bloomFilterColumns", "d")
        .mode("overwrite").save(tmpDir("bloom-double"))
    }
    assert(e2.getMessage.contains("blooms support"), e2.getMessage)
    // valid columns (incl. a struct leaf) still write
    val ok = tmpDir("bloom-ok")
    Seq((1L, "x")).toDF("id", "s")
      .selectExpr("id", "named_struct('b', s) AS st")
      .write.format("nimble").option("bloomFilterColumns", "id,st.b")
      .mode("overwrite").save(ok)
    assert(spark.read.format("nimble").load(ok).count() == 1)
  }

  test("multi-path load unions directories read-only (parquet parity)") {
    import spark.implicits._
    val dirA = tmpDir("multi-a"); val dirB = tmpDir("multi-b")
    spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).sortWithinPartitions("id")
      .write.format("nimble").mode("overwrite").save(dirA)
    spark.range(1000, 2500).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).sortWithinPartitions("id")
      .write.format("nimble").mode("overwrite").save(dirB)

    val both = spark.read.format("nimble").load(dirA, dirB)
    assert(both.count() == 2500)
    assert(both.agg(min("id"), max("id")).collect()(0).toSeq == Seq(0L, 2499L))
    // pushdown prunes across BOTH roots: a probe into dirB's range reads
    // no stripes from dirA
    assert(both.filter(col("id") === 1700L).count() == 1)
    // duplicate roots dedup instead of double-counting
    assert(spark.read.format("nimble").load(dirA, dirA).count() == 1000)

    // read-only: mutations on a multi-path table refuse with a clear error
    val tbl = new graft.spark.NimbleTable(s"$dirA\u0000$dirB", both.schema)
    val e = intercept[IllegalArgumentException] { tbl.truncateTable() }
    assert(e.getMessage.contains("multi-path"), e.getMessage)
    assert(!tbl.canDeleteWhere(Array[org.apache.spark.sql.sources.Filter](org.apache.spark.sql.sources.EqualTo("id", 1L))))
  }

  test("stripe pruning via footer stats") {
    // ids 0..99999 sorted -> multiple chunks; filter to a narrow range
    val df = spark.range(100000).toDF("id").withColumn("v", col("id") * 2)
    val dir = tmpDir("prune")
    df.coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    assert(nb.filter(col("id") === 54321L).count() == 1)
    assert(nb.filter(col("id") < 0).count() == 0)
    assert(nb.count() == 100000)
  }

  test("timestamps and dates") {
    val df = spark.sql("""
      SELECT timestamp'2024-01-15 10:30:00.123456' + make_interval(0,0,0,0,0,0,id) AS ts,
             date_add(date'2020-01-01', cast(id AS int)) AS d
      FROM range(100)
    """)
    assertSameData(df, roundTrip(df, "ts"))
  }

  test("nanosecond timestamps: TimestampMicroNano split round-trips losslessly") {
    // epoch-nanos longs incl. sub-microsecond remainders, pre-1970 values
    // and nulls — the shapes the micros/remainder split must keep exact
    val df = spark.sql("""
      SELECT id,
        CASE WHEN id % 11 = 0 THEN CAST(NULL AS BIGINT)
             ELSE 1705312200123456789 + id * 1234567 - CASE WHEN id % 3 = 0 THEN 1705312210000000000 ELSE 0 END
        END AS ts
      FROM range(5000)""")
    val dir = tmpDir("tsnanos")
    df.write.format("nimble").option("timestampNanosColumns", "ts").mode("overwrite").save(dir)
    val back = spark.read.format("nimble").load(dir)
    assertSameData(df, back)
    // the sibling remainder stream exists; the logical schema does not show it
    val footer = graft.spark.NimbleSource.footerOf(graft.spark.NimbleSource.listFiles(dir).head)
    assert(footer.streamKeys.contains("ts#nanos"))
    assert(back.schema.fieldNames.toSeq == Seq("id", "ts"))
    // range filters on the combined value stay correct through the scaled
    // micros-stream stats (stripe pruning + chunk skipping paths)
    val cut = 1705312200123456789L + 2500L * 1234567L
    assert(back.filter(col("ts") > cut).count() ==
      df.filter(col("ts") > cut).count())
    assert(back.filter(col("ts").isNull).count() == df.filter(col("ts").isNull).count())
    // min/max refuse the stats shortcut (micros stats are not the value):
    // answer must come from data and still be exact
    val Array(gotMin, gotMax) = back.agg(min("ts"), max("ts")).collect()(0).toSeq.toArray
    val Array(expMin, expMax) = df.agg(min("ts"), max("ts")).collect()(0).toSeq.toArray
    assert(gotMin == expMin && gotMax == expMax)
  }

  test("write options: sortColumns recorded, multi-stripe files readable") {
    val df = spark.range(50000).toDF("id").withColumn("k", col("id") / 100)
    val dir = tmpDir("sorted")
    df.coalesce(1).sortWithinPartitions("id").write.format("nimble")
      .option("sortColumns", "id").mode("overwrite").save(dir)
    val files = graft.spark.NimbleSource.listFiles(dir)
    assert(files.nonEmpty)
    val footer = graft.spark.NimbleSource.footerOf(files.head)
    assert(footer.sortColumns == Seq("id"))
    assert(spark.read.format("nimble").load(dir).count() == 50000)
  }

  test("stripeBytes write option controls stripe granularity (split + memory knob)") {
    // hash-shaped strings resist compression, so encoded size tracks raw and
    // the stripe count is predictable: ~340 KB encoded / 32 KB per stripe
    // (stripes flush at chunk boundaries, so chunks must be finer than stripes)
    val dir = tmpDir("stripebytes")
    spark.range(20000).selectExpr("id", "md5(CAST(id AS STRING)) AS s")
      .coalesce(1).write.format("nimble")
      .option("stripeBytes", "32768").option("rowsPerChunk", "2048")
      .mode("overwrite").save(dir)
    val f = graft.spark.NimbleSource.listFiles(dir).head
    val stripes = graft.spark.NimbleSource.footerOf(f).stripes.length
    assert(stripes >= 5, s"expected many small stripes, got $stripes")
    val nb = spark.read.format("nimble").load(dir)
    assert(nb.count() == 20000L)
    assert(nb.filter(col("id") === 4321L).count() == 1L)
    // default (96 MB) stays one stripe at this size
    val dir2 = tmpDir("stripebytes_dflt")
    spark.range(20000).selectExpr("id", "md5(CAST(id AS STRING)) AS s")
      .coalesce(1).write.format("nimble").mode("overwrite").save(dir2)
    val f2 = graft.spark.NimbleSource.listFiles(dir2).head
    assert(graft.spark.NimbleSource.footerOf(f2).stripes.length == 1)
  }

  test("unsignedColumns widens u8/u16/u32/u64 like the parquet reader (SURVEY §1.2)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // stored two's-complement bit patterns of unsigned sources: -1 is the
    // max of each unsigned width, MinValue is 2^(w-1)
    val df = Seq(
      (1L, (-1).toByte, (-1).toShort, -1, -1L),
      (2L, Byte.MinValue, Short.MinValue, Int.MinValue, Long.MinValue),
      (3L, 7.toByte, 7.toShort, 7, 7L)
    ).toDF("id", "u8", "u16", "u32", "u64")
    val dir = tmpDir("unsigned")
    df.coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble")
      .option("unsignedColumns", "u8,u16,u32,u64").load(dir)
    assert(nb.schema("u8").dataType == ShortType)
    assert(nb.schema("u16").dataType == IntegerType)
    assert(nb.schema("u32").dataType == LongType)
    assert(nb.schema("u64").dataType == DecimalType(20, 0))
    val rows = nb.orderBy("id").collect()
    assert(rows(0).getShort(1) == 255 && rows(0).getInt(2) == 65535)
    assert(rows(0).getLong(3) == 4294967295L)
    assert(rows(0).getDecimal(4) == new java.math.BigDecimal("18446744073709551615"))
    assert(rows(1).getShort(1) == 128 && rows(1).getInt(2) == 32768)
    assert(rows(1).getLong(3) == 2147483648L)
    assert(rows(1).getDecimal(4) == new java.math.BigDecimal("9223372036854775808"))
    assert(rows(2).getShort(1) == 7 && rows(2).getInt(2) == 7 &&
      rows(2).getLong(3) == 7L && rows(2).getDecimal(4) == new java.math.BigDecimal(7))
    // filters on unsigned columns evaluate on the WIDENED values (they stay
    // residuals; r20 adds stored-domain PRUNING twins, but the row-level
    // answer always comes from Spark's widened re-evaluation)
    assert(nb.filter(col("u8") === 255).count() == 1L)
    assert(nb.filter(col("u64") > new java.math.BigDecimal("9223372036854775807")).count() == 2L)
    // aggregates compute on widened values too (pushdown refused)
    val agg = nb.agg(min("u8"), max("u64")).collect()(0)
    assert(agg.getShort(0) == 7)
    assert(agg.getDecimal(1) == new java.math.BigDecimal("18446744073709551615"))
    // unknown column and non-integral type are rejected loudly
    intercept[Exception] {
      spark.read.format("nimble").option("unsignedColumns", "nope").load(dir).schema
    }
  }

  test("unsigned predicates prune via stored-domain twins; results stay widened-exact") {
    import spark.implicits._
    // r20 (r19 verdict #7): selective scans on unsigned columns used to read
    // everything (signed stats fenced). The translated stored-domain twin in
    // the stats-only channel prunes stripes/chunks — with the results still
    // computed on the widened values Spark re-evaluates.
    // Two stripes: stored 0..4999 (widened same) and stored -5000..-1
    // (widened 2^32-5000 .. 2^32-1). Sorted by id so each file is one range.
    val dir = tmpDir("unsigned-prune")
    spark.range(10000L)
      .selectExpr("id", "CAST(CASE WHEN id < 5000 THEN id ELSE id - 10000 END AS INT) AS u32")
      .repartitionByRange(2, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").option("unsignedColumns", "u32").load(dir)
    // high-half probe: widened > 2^32 - 100 -> only the stored-negative file
    val hi = nb.filter(col("u32") > (4294967296L - 100L)).agg(count(lit(1))).head().getLong(0)
    assert(hi == 99L, s"high-half count drifted: $hi")
    val st = graft.spark.NimbleSource.lastPlanStats(dir).get
    assert(st.stripesPruned > 0,
      s"stored-domain twin must prune the low-half stripes: $st")
    // straddling range: everything except widened [100, 2^32-200] -> both
    // halves partially survive, values exact across the sign boundary
    val both = nb.filter(col("u32") < 100L || col("u32") > (4294967296L - 200L))
      .select("u32").as[Long].collect().toSet
    val expect = (0L until 100L).toSet ++ (4294967097L to 4294967295L).toSet
    assert(both == expect, s"diff=${(both diff expect).take(5)} / ${(expect diff both).take(5)}")
  }

  test("footer cache stays bounded under many files (approximate LRU eviction)") {
    // a 100 TB table has 10^5-10^6 files; the driver-side footer cache must
    // evict rather than grow without bound — and evicted footers must simply
    // re-read, never error
    val dir = tmpDir("footer_cap")
    val schema = """{"type":"struct","fields":[
      {"name":"id","type":"long","nullable":false,"metadata":{}}]}"""
    val files = (0 until 96).map { i =>
      val f = new java.io.File(dir, f"cap-$i%03d.gft").getAbsolutePath
      val w = new graft.format.Tablet.Writer(f, schema, Array("id"))
      w.writeChunk(w.ensureStream("id"),
        graft.format.LongsCol(Array.tabulate(16)(j => (i * 16 + j).toLong), graft.format.PhysType.I64, null))
      w.addRows(16)
      w.close()
      f
    }
    graft.spark.NimbleSource.setFooterCacheCapForTest(32)
    try {
      for (f <- files) graft.spark.NimbleSource.footerOf(f)
      assert(graft.spark.NimbleSource.footerCacheSize <= 32,
        s"cache grew past the cap: ${graft.spark.NimbleSource.footerCacheSize}")
      // evicted footers re-read transparently, rows intact
      val total = files.map(f => graft.spark.NimbleSource.footerOf(f).rowCount).sum
      assert(total == 96L * 16L)
      assert(graft.spark.NimbleSource.footerCacheSize <= 32)
    } finally graft.spark.NimbleSource.setFooterCacheCapForTest(65536)
  }
}
