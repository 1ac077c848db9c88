package graft

import graft.format.{ByteSink, KeyCodec, Lookup}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Order-preserving composite key encoding + composite sorted index
  * (reference: dwio/nimble/index/KeyEncoding.h:30-44, index/SortedIndex.h:48,
  * index/IndexLookup.h:55-65). */
class CompositeIndexSpec extends SparkTestBase {

  private def enc(vs: Any*): Array[Byte] = KeyCodec.encode(vs)
  private def cmp(a: Array[Byte], b: Array[Byte]): Int =
    KeyCodec.compare(a, 0, a.length, b, 0, b.length)

  test("KeyCodec: encoded byte order equals tuple order (property, seeded)") {
    val rnd = new scala.util.Random(42)
    def randString(): String = {
      val n = rnd.nextInt(6)
      new String(Array.fill(n)((rnd.nextInt(4) match {
        case 0 => 0 // embedded NULs exercise the escape
        case 1 => 'a'.toInt
        case 2 => 'b'.toInt
        case _ => 0xff
      }).toChar))
    }
    val tuples = IndexedSeq.fill(500)((rnd.nextLong() % 100, randString(), rnd.nextLong()))
    val ord = implicitly[Ordering[(Long, String, Long)]]
    for (_ <- 0 until 2000) {
      val a = tuples(rnd.nextInt(tuples.length))
      val b = tuples(rnd.nextInt(tuples.length))
      val want = math.signum(ord.compare(a, b))
      val got = math.signum(cmp(enc(a._1, a._2, a._3), enc(b._1, b._2, b._3)))
      assert(got == want, s"$a vs $b: byte order $got, tuple order $want")
    }
  }

  test("KeyCodec: component encodings are prefix-free; prefixSuccessor brackets prefixes") {
    // "a" vs "ab": neither encoding is a prefix of the other
    val ea = enc("a"); val eab = enc("ab")
    assert(!ea.zip(eab).forall { case (x, y) => x == y } || ea.length == eab.length)
    // any key starting with enc("O") sorts inside [enc("O"), succ(enc("O")))
    val p = enc("O")
    val succ = KeyCodec.prefixSuccessor(p)
    for (k <- Seq(enc("O", 1L), enc("O", Long.MaxValue), enc("O", ""))) {
      assert(cmp(k, p) >= 0 && cmp(k, succ) < 0, k.mkString(","))
    }
    assert(cmp(enc("N", Long.MaxValue), p) < 0)
    assert(cmp(enc("P", Long.MinValue), succ) >= 0)
    // longs: sign boundary
    assert(cmp(enc(-1L), enc(0L)) < 0 && cmp(enc(Long.MinValue), enc(Long.MaxValue)) < 0)
    // doubles: total order incl. negatives
    val ds = new ByteSink(8); KeyCodec.putDouble(ds, -2.5)
    val ds2 = new ByteSink(8); KeyCodec.putDouble(ds2, -1.5)
    assert(cmp(ds.toArray, ds2.toArray) < 0)
  }

  test("composite index: prefix-equality + range probe decodes only candidate chunks") {
    val sparkDf = spark.read.parquet(s"${sf()}/orders.parquet")
    val dir = tmpDir("cidx")
    // sorted by custkey so the (status, custkey) index is genuinely needed
    // small chunks: candidates bracket a few chunks, the rest must skip
    sparkDf.coalesce(1).sortWithinPartitions("o_custkey").write.format("nimble")
      .option("indexColumns", "o_orderstatus+o_custkey")
      .option("rowsPerChunk", "64")
      .mode("overwrite").save(dir)

    import org.apache.spark.sql.functions.col
    val expect = sparkDf
      .filter(col("o_orderstatus") === "O" && col("o_custkey").between(100L, 104L))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val (got, m) = Lookup.compositeLookupMetered(dir, Seq("o_orderstatus", "o_custkey"),
      Seq("O"), Some((100L, 104L)))
    assert(got.map(_("o_orderkey").asInstanceOf[Long]).sorted == expect)
    assert(m.indexProbes > 0, "composite index not probed")
    assert(m.rowsDecoded < m.stripeRows, s"decoded ${m.rowsDecoded} of ${m.stripeRows} stripe rows")

    // full-tuple equality probe
    val one = expect.head
    val full = sparkDf.filter(col("o_orderkey") === one).collect().head
    val (eqRows, m2) = Lookup.compositeLookupMetered(dir, Seq("o_orderstatus", "o_custkey"),
      Seq(full.getAs[String]("o_orderstatus"), full.getAs[Long]("o_custkey")), None)
    assert(eqRows.map(_("o_orderkey").asInstanceOf[Long]).contains(one))
    assert(m2.indexProbes > 0)

    // miss outside the key domain: stats prune everything, zero decode
    val (miss, m3) = Lookup.compositeLookupMetered(dir, Seq("o_orderstatus", "o_custkey"),
      Seq("ZZ"), Some((0L, 10L)))
    assert(miss.isEmpty && m3.rowsDecoded == 0, s"miss decoded ${m3.rowsDecoded}")
  }

  test("composite index: prefix probe returns rows with null TRAILING members via the index") {
    // regression: the writer once skipped rows with any null member, so a
    // probe constraining only a prefix silently dropped (k1=v, k2=null) rows
    val schema = StructType(Seq(
      StructField("k1", StringType, nullable = false),
      StructField("k2", LongType, nullable = true),
      StructField("v", LongType, nullable = false)))
    val rows = (0 until 2000).map { i =>
      Row(s"p${i % 4}", if (i % 5 == 0) null else (i % 40).toLong, i.toLong)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    val dir = tmpDir("cidx_prefix_null")
    df.write.format("nimble").option("indexColumns", "k1+k2")
      .option("rowsPerChunk", "256").mode("overwrite").save(dir)

    // equality on k1 alone: rows with k2 null MUST be returned
    val (got, m) = Lookup.compositeLookupMetered(dir, Seq("k1", "k2"), Seq("p2"), None)
    val expect = rows.filter(_.getString(0) == "p2").map(_.getLong(2)).sorted
    assert(got.map(_("v").asInstanceOf[Long]).sorted == expect,
      s"${got.length} rows returned, want ${expect.length} (null-k2 rows must be included)")
    assert(m.indexProbes > 0, "prefix probe did not use the index")
    // the same via SQL (in-scan candidate selection must not drop them)
    val nb = spark.read.format("nimble").load(dir)
    import org.apache.spark.sql.functions.col
    assert(nb.filter(col("k1") === "p2").count() == expect.length)
    // constraining k2 still excludes its nulls (SQL equality semantics)
    val (rangeGot, _) = Lookup.compositeLookupMetered(dir, Seq("k1", "k2"), Seq("p2"), Some((10L, 12L)))
    val expectR = rows.filter(r => r.getString(0) == "p2" && !r.isNullAt(1) &&
      r.getLong(1) >= 10 && r.getLong(1) <= 12).map(_.getLong(2)).sorted
    assert(rangeGot.map(_("v").asInstanceOf[Long]).sorted == expectR)
  }

  test("composite index: rows with a null member are excluded when that member is constrained") {
    val schema = StructType(Seq(
      StructField("k1", StringType, nullable = true),
      StructField("k2", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val rows = (0 until 1000).map { i =>
      Row(if (i % 7 == 0) null else s"g${i % 3}", (i % 50).toLong, i.toLong)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    val dir = tmpDir("cidx_null")
    df.write.format("nimble").option("indexColumns", "k1+k2")
      .mode("overwrite").save(dir)

    val (got, m) = Lookup.compositeLookupMetered(dir, Seq("k1", "k2"), Seq("g1"), Some((10L, 12L)))
    val expect = rows.filter(r => r.get(0) == "g1" && r.getLong(1) >= 10 && r.getLong(1) <= 12)
      .map(_.getLong(2)).sorted
    assert(got.map(_("v").asInstanceOf[Long]).sorted == expect)
    assert(m.indexProbes > 0)

    // the fallback scan (no index stream for a different column pair) agrees
    val (scan, mScan) = Lookup.compositeLookupMetered(dir, Seq("k2", "k1"), Seq(11L), Some(("g1", "g1")))
    assert(scan.map(_("v").asInstanceOf[Long]).sorted ==
      rows.filter(r => r.getLong(1) == 11 && r.get(0) == "g1").map(_.getLong(2)).sorted)
    assert(mScan.indexProbes == 0, "no index exists for the reversed column order")
  }

  test("composite index assists plain SQL: eq-prefix + range skips non-candidate chunks") {
    import org.apache.spark.sql.functions.col
    val sparkDf = spark.read.parquet(s"${sf()}/orders.parquet")
    val dir = tmpDir("cidx_sql")
    sparkDf.coalesce(1).sortWithinPartitions("o_orderdate").write.format("nimble")
      .option("indexColumns", "o_orderstatus+o_custkey")
      .option("rowsPerChunk", "64")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val expect = sparkDf
      .filter(col("o_orderstatus") === "F" && col("o_custkey").between(50L, 54L))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val probes0 = graft.spark.NimbleSource.indexScanProbes.get()
    val skipped0 = graft.spark.NimbleSource.chunksSkipped.get()
    val got = nb.filter(col("o_orderstatus") === "F" && col("o_custkey").between(50L, 54L))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == expect.toSeq)
    assert(graft.spark.NimbleSource.indexScanProbes.get() > probes0,
      "SQL scan did not consult the composite index")
    assert(graft.spark.NimbleSource.chunksSkipped.get() > skipped0,
      "composite candidates did not skip any chunk")

    // equality on the leading member alone uses the composite prefix
    val expectEq = sparkDf.filter(col("o_orderstatus") === "P").count()
    assert(nb.filter(col("o_orderstatus") === "P").count() == expectEq)
  }

  test("composite keys with embedded NULs and unicode survive the write+probe loop") {
    val schema = StructType(Seq(
      StructField("k1", StringType, nullable = false),
      StructField("k2", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    // keys chosen to stress the memcomparable escape: embedded NUL (the
    // escaped byte), a key that is a strict prefix of another, 0xFF-heavy
    // unicode, and the empty string
    val keys = Seq("a", "a\u0000b", "a\u0000", "", "日本語🚀", "zzÿ")
    val rows = (0 until 600).map(i => Row(keys(i % keys.length), (i % 10).toLong, i.toLong))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    val dir = tmpDir("cidx_nul")
    df.write.format("nimble").option("indexColumns", "k1+k2")
      .option("rowsPerChunk", "64").mode("overwrite").save(dir)
    for (k <- keys) {
      val (got, m) = Lookup.compositeLookupMetered(dir, Seq("k1", "k2"), Seq(k), Some((2L, 5L)))
      val want = rows.filter(r => r.getString(0) == k && r.getLong(1) >= 2 && r.getLong(1) <= 5)
        .map(_.getLong(2)).sorted
      assert(got.map(_("v").asInstanceOf[Long]).sorted == want, s"key ${k.getBytes("UTF-8").mkString(",")}")
      assert(m.indexProbes > 0)
    }
  }

  test("composite indexColumns validation rejects bad specs at write time") {
    val df = spark.read.parquet(s"${sf()}/orders.parquet")
    def chain(t: Throwable): List[Throwable] = if (t == null) Nil else t :: chain(t.getCause)
    val e = intercept[org.apache.spark.SparkException] {
      df.coalesce(1).write.format("nimble")
        .option("indexColumns", "o_orderstatus+o_orderstatus")
        .mode("overwrite").save(tmpDir("cidx_dup"))
    }
    assert(chain(e).exists(m => m.getMessage != null && m.getMessage.contains("distinct")), s"got $e")
    val e2 = intercept[org.apache.spark.SparkException] {
      df.coalesce(1).write.format("nimble")
        .option("indexColumns", "o_orderstatus+nope")
        .mode("overwrite").save(tmpDir("cidx_badcol"))
    }
    assert(chain(e2).exists(m => m.getMessage != null && m.getMessage.contains("no such column")), s"got $e2")
  }

  test("a column literally named with '+' still gets a single hash index") {
    import spark.implicits._
    val dir = tmpDir("plus_name")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("a+b", "s")
      .coalesce(1).write.format("nimble").option("indexColumns", "a+b")
      .option("rowsPerChunk", "1").mode("overwrite").save(dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gft")).head
    val ft = graft.spark.NimbleSource.footerOf(f.getPath)
    assert(ft.streamKeys.contains(graft.format.Tablet.indexStreamKey("a+b")),
      s"expected single hash index stream, got ${ft.streamKeys.mkString(",")}")
    assert(!ft.streamKeys.exists(_.startsWith("#cidx:")),
      "a real '+' column name must not parse as a composite spec")
    val got = spark.read.format("nimble").load(dir)
      .filter(org.apache.spark.sql.functions.col("`a+b`") === 2L)
      .select("s").collect().map(_.getString(0)).toSeq
    assert(got == Seq("b"))
  }

  test("Stats.merge: a trailing empty-stats stripe does not clobber the accumulated kind") {
    val a = new graft.format.Tablet.Stats()
    a.mergeColumn(graft.format.LongsCol(Array(5L, 9L), graft.format.PhysType.I64))
    val kind0 = a.kind
    assert(a.hasMinMax && a.minLong == 5L && a.maxLong == 9L)
    val empty = new graft.format.Tablet.Stats() // default: no min/max, default kind
    a.merge(empty)
    assert(a.kind == kind0, "empty merge must not overwrite kind")
    assert(a.hasMinMax && a.minLong == 5L && a.maxLong == 9L)
  }
}
