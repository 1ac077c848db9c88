package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F5: randomized filter-pushdown equivalence — `scan(pushdown=F)` must equal
  * `scan(no-pushdown) then filter(F)` for random filter sets (reference:
  * dwio/nimble/velox/selective/tests/E2EFilterTest.cpp). Also F7: footer
  * stats must equal Spark-computed aggregates. */
class E2EFilterSpec extends SparkTestBase {
  private val rnd = new scala.util.Random(1234)

  test("random filter sets: pushdown == post-filter (lineitem sf0.001)") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val dir = tmpDir("e2e")
    pq.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    val numCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val dblCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val strCols = Seq("l_returnflag", "l_linestatus")

    def randomPredicate(): org.apache.spark.sql.Column = {
      rnd.nextInt(6) match {
        case 0 =>
          val c = numCols(rnd.nextInt(numCols.length))
          col(c) > lit(rnd.nextInt(10000))
        case 1 =>
          val c = dblCols(rnd.nextInt(dblCols.length))
          col(c) <= lit(rnd.nextDouble() * 100)
        case 2 =>
          val c = strCols(rnd.nextInt(strCols.length))
          col(c) === lit(if (rnd.nextBoolean()) "A" else "N")
        case 3 =>
          val c = strCols(rnd.nextInt(strCols.length))
          col(c).isin("A", "R")
        case 4 =>
          val c = numCols(rnd.nextInt(numCols.length))
          col(c).between(lit(rnd.nextInt(500)), lit(500 + rnd.nextInt(10000)))
        case _ =>
          val c = dblCols(rnd.nextInt(dblCols.length))
          !(col(c) < lit(rnd.nextDouble() * 50))
      }
    }

    for (trial <- 0 until 25) {
      var pred = randomPredicate()
      for (_ <- 0 until rnd.nextInt(3))
        pred = if (rnd.nextBoolean()) pred && randomPredicate() else pred || randomPredicate()
      val expected = pq.filter(pred).count()
      val got = nb.filter(pred).count()
      assert(got == expected, s"trial $trial: $pred -> $got vs $expected")
    }
  }

  test("options x predicates x projections fuzz: collect parity against parquet (r15)") {
    // integration fuzz over the FULL read stack — sparse candidate fetch
    // (index + v14 dir stats), deferred projected-stream IO, the cascade
    // with string point reads, lazy string fills — by randomizing the WRITE
    // options and comparing projected collect() (the batch/vector path, not
    // the fold that count() routes through) row-wise against parquet
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val allCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_linestatus", "l_shipdate")
    val r = new scala.util.Random(77)
    def pred(): org.apache.spark.sql.Column = r.nextInt(5) match {
      case 0 => col("l_orderkey") === lit(1 + r.nextInt(60000))
      case 1 => col("l_partkey").between(lit(r.nextInt(500)), lit(500 + r.nextInt(2000)))
      case 2 => col("l_returnflag") === lit(if (r.nextBoolean()) "A" else "N")
      case 3 => col("l_linestatus") === lit("F") && col("l_quantity") > lit(25)
      case _ => col("l_returnflag").isin("A", "R") && col("l_suppkey") < lit(r.nextInt(400))
    }
    for (trial <- 0 until 5) {
      val dir = tmpDir(s"e2e_opt$trial")
      val base = pq.repartition(1 + r.nextInt(2))
      val sorted = r.nextBoolean()
      var w = (if (sorted) base.sortWithinPartitions("l_orderkey") else base)
        .write.format("nimble")
        .option("rowsPerChunk", Seq("512", "2048", "16384")(r.nextInt(3)))
        .option("compression", Seq("none", "lz4", "zstd")(r.nextInt(3)))
      if (sorted) w = w.option("sortColumns", "l_orderkey")
      if (r.nextBoolean()) w = w.option("indexColumns", "l_orderkey")
      if (r.nextBoolean()) w = w.option("bloomFilterColumns", "l_partkey")
      w.mode("overwrite").save(dir)
      val nb = spark.read.format("nimble").load(dir)
      for (q <- 0 until 4) {
        val p = pred()
        val proj = r.shuffle(allCols).take(1 + r.nextInt(4))
        def rows(df: DataFrame): Seq[String] =
          df.filter(p).select(proj.map(col): _*).collect().map(_.toString).sorted.toSeq
        val want = rows(pq)
        val got = rows(nb)
        assert(got == want,
          s"trial $trial q$q sorted=$sorted proj=$proj pred=$p: ${got.length} vs ${want.length} rows")
      }
    }
  }

  test("random filters over NaN-pocketed doubles: pruning never drops NaN rows") {
    // NaN sorts greatest and equals itself in Spark; stripe/chunk stats
    // exclude NaN from min/max, so every max-based prune must consult
    // hasNaN — this fuzz pins that (found by review: d > huge dropped NaN)
    val gen = spark.sql("""
      SELECT id,
        CASE WHEN id % 500 = 77 THEN CAST('NaN' AS DOUBLE)
             WHEN id % 17 = 0 THEN CAST(NULL AS DOUBLE)
             ELSE CAST(id AS DOUBLE) / 3 END AS d,
        md5(CAST(id AS STRING)) AS pad
      FROM range(30000)""")
    // reference side reads PARQUET, not .cache(): Spark's InMemoryRelation
    // batch pruning is itself NaN-unsound (= NaN returns 0 rows against a
    // cached frame while parquet and SQL literals both return the NaN rows)
    // — the parquet scan carries the semantics this engine must match
    val pqDir = tmpDir("e2enan-pq")
    gen.coalesce(1).sortWithinPartitions("id").write.mode("overwrite").parquet(pqDir)
    val src = spark.read.parquet(pqDir)
    val dir = tmpDir("e2enan")
    src.coalesce(1).sortWithinPartitions("id").write.format("nimble")
      .option("stripeBytes", "32768").option("rowsPerChunk", "2048")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    def p(): org.apache.spark.sql.Column = rnd.nextInt(5) match {
      case 0 => col("d") > lit(rnd.nextDouble() * 12000)
      case 1 => col("d") >= lit(rnd.nextDouble() * 12000)
      case 2 => col("d") < lit(rnd.nextDouble() * 100)
      case 3 => col("d") === lit(Double.NaN)
      case _ => col("d").isNotNull && col("d") <= lit(rnd.nextDouble() * 9000)
    }
    for (t <- 0 until 20) {
      val pred = p()
      assert(nb.filter(pred).count() == src.filter(pred).count(), s"trial $t: $pred")
    }
  }

  test("nanos-split fuzz: pushed range filters == post-filter through scaled stats") {
    // epoch-nanos values spanning pre-1970, sub-µs remainders, and nulls;
    // small chunks so the scaled-stats chunk-skip path actually prunes
    val df = spark.sql("""
      SELECT id,
        CASE WHEN id % 13 = 0 THEN CAST(NULL AS BIGINT)
             ELSE (id - 2500) * 987654321 + id % 1000
        END AS ts,
        CAST(id % 97 AS BIGINT) AS k
      FROM range(5000)""")
    val dir = tmpDir("nanosfuzz")
    df.write.format("nimble").option("timestampNanosColumns", "ts")
      .option("rowsPerChunk", "256").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    for (trial <- 0 until 20) {
      val bound = (rnd.nextLong() % (2500L * 987654321L))
      val pred = rnd.nextInt(5) match {
        case 0 => col("ts") > lit(bound)
        case 1 => col("ts") <= lit(bound)
        case 2 => col("ts").between(lit(-math.abs(bound)), lit(math.abs(bound)))
        case 3 => col("ts").isNull
        case _ => col("ts") > lit(bound) && col("k") < lit(50L)
      }
      val expected = df.filter(pred).count()
      val got = nb.filter(pred).count()
      assert(got == expected, s"trial $trial: $pred -> $got vs $expected")
    }
  }

  test("lazy FSST materialization: selective scan decodes ~survivors, not ~rows") {
    // high-distinct repeated-substring strings select FSST (not DICT/shared);
    // the filter is on a different column, so the projected string column's
    // decode cost is pure materialization — the lazy path's target
    val df = spark.range(20000).toDF("id")
      .selectExpr("id",
        "concat('prefix_common_payload_', id, '_the_quick_brown_fox_jumps_over_', id * 7) AS s")
    val dir = tmpDir("lazyfsst")
    df.coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    // confirm the string stream actually chose FSST (else this test is vacuous)
    val file = graft.spark.NimbleSource.listFiles(dir).head
    val r = new graft.format.Tablet.Reader(file)
    val codec = try {
      val cur = new graft.format.Tablet.ChunkCursor(r.readStreamBytes(0, r.streamId("s")))
      cur.peekCodec()
    } finally r.close()
    assert(codec == graft.format.Codecs.FSST, s"expected FSST string chunks, got codec $codec")
    val before = graft.format.Fsst.decodedStrings.sum()
    // pushable range predicate -> the selective reader builds a survivor
    // selection (a non-pushable filter would scan-all and decode-all)
    val got = nb.filter(col("id").between(5000, 5019)).select("s").collect()
    val decoded = graft.format.Fsst.decodedStrings.sum() - before
    assert(got.length == 20)
    assert(got.map(_.getString(0)).sorted.head.startsWith("prefix_common_payload_5000_"))
    // survivors-only contract: 20 of 20000 rows pass; eager decode would
    // register ~20000 (every chunk fully decoded before the fill)
    assert(decoded < 20000 / 4,
      s"decoded $decoded strings for 20 survivors — lazy materialization regressed")
  }

  test("writer-options matrix: documents round-trip + filters under every codec combo") {
    // documents.text is the stream most likely to engage FSST; the matrix
    // crosses compression codecs with bloom/sort options so every new codec
    // path runs under the connector, not just unit round-trips
    val pq = spark.read.parquet(s"${sf()}/documents.parquet")
    val expected = pq.count()
    val expFiltered = pq.filter(col("n_chars") > 200).count()
    for (comp <- Seq("zstd", "lz4", "none"); extras <- Seq(true, false)) {
      val dir = tmpDir(s"matrix-$comp-$extras")
      var w = pq.repartition(2).write.format("nimble").option("compression", comp)
      if (extras) w = w.option("bloomFilterColumns", "doc_id").option("sortColumns", "doc_id")
      w.mode("overwrite").save(dir)
      val nb = spark.read.format("nimble").load(dir)
      assert(nb.count() == expected, s"$comp/$extras count")
      assert(nb.filter(col("n_chars") > 200).count() == expFiltered, s"$comp/$extras filter")
      val gotText = nb.select("doc_id", "text").orderBy("doc_id").collect()
      val expText = pq.select("doc_id", "text").orderBy("doc_id").collect()
      assert(gotText.sameElements(expText), s"$comp/$extras text round-trip")
    }
  }

  test("FSST inside Nullable: big repeated-substring strings with nulls") {
    import spark.implicits._
    val rnd2 = new scala.util.Random(77)
    val rows = (0L until 3000L).map { i =>
      val s = if (i % 7 == 0) null
        else s"https://corpus.example.org/doc/${rnd2.nextInt(100000)}/rev/${rnd2.nextLong()}"
      (i, s)
    }
    val df = rows.toDF("id", "url")
    val dir = tmpDir("fsstnull")
    df.coalesce(1).write.format("nimble").option("compression", "none").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val got = nb.orderBy("id").collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(got.toSeq == rows)
    assert(nb.filter(col("url").isNull).count() == rows.count(_._2 == null))
    assert(nb.filter(col("url").startsWith("https://corpus")).count() == rows.count(_._2 != null))
  }

  test("footer stats equal Spark-computed aggregates (F7)") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val dir = tmpDir("stats")
    pq.coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val files = graft.spark.NimbleSource.listFiles(dir)
    val footer = graft.spark.NimbleSource.footerOf(files.head)
    val keyIdx = footer.streamKeys.zipWithIndex.toMap
    val exp = pq.agg(
      count(lit(1)), min("l_orderkey"), max("l_orderkey"),
      min("l_quantity"), max("l_quantity"),
      min("l_returnflag"), max("l_returnflag")).collect()(0)
    assert(footer.rowCount == exp.getLong(0))
    val okStats = footer.fileStats(keyIdx("l_orderkey"))
    assert(okStats.valueCount == exp.getLong(0) && okStats.nullCount == 0)
    assert(okStats.minLong == exp.getLong(1) && okStats.maxLong == exp.getLong(2))
    val qStats = footer.fileStats(keyIdx("l_quantity"))
    assert(qStats.minDouble == exp.getDouble(3) && qStats.maxDouble == exp.getDouble(4))
    val rfStats = footer.fileStats(keyIdx("l_returnflag"))
    assert(new String(rfStats.minBytes, "UTF-8") == exp.getString(5))
    assert(new String(rfStats.maxBytes, "UTF-8") == exp.getString(6))
  }

  test("In filter containing null literal (three-valued logic)") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (3L, "c")).toDF("id", "s")
    val dir = tmpDir("innull")
    df.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    // isin with null: null never matches
    val got = nb.filter(col("id").isin(1L, null)).collect().map(_.getLong(0)).toSet
    val exp = df.filter(col("id").isin(1L, null)).collect().map(_.getLong(0)).toSet
    assert(got == exp && got == Set(1L))
  }

  test("bloom filters prune equality lookups on unsorted keys") {
    // values hashed by range partition -> each file holds a disjoint UNSORTED
    // value set; min/max overlap but blooms separate them
    val df = spark.range(100000).toDF("id")
      .withColumn("k", concat(lit("user_"), (col("id") * 2654435761L % 99991).cast("string")))
    val dir = tmpDir("bloom")
    df.repartition(8, col("k"))
      .write.format("nimble").option("bloomFilterColumns", "k").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    nb.rdd.getNumPartitions // plan with no filters
    val all = graft.spark.NimbleSource.lastPlanStats(dir).get.stripesPlanned
    val probe = nb.filter(col("k") === "user_12345")
    probe.rdd.getNumPartitions
    val kept = graft.spark.NimbleSource.lastPlanStats(dir).get.stripesPlanned
    assert(kept < all, s"bloom should prune: $kept of $all stripes")
    val expected = df.filter(col("k") === "user_12345").count()
    assert(probe.count() == expected)
    // negative lookup prunes everything
    assert(nb.filter(col("k") === "no_such_user").rdd.getNumPartitions == 0)
    assert(nb.filter(col("k") === "no_such_user").count() == 0)
  }

  test("v12 checksums verify with late-registering flatmap streams") {
    import org.apache.spark.sql.functions.{col => c, lit, map, when}
    // key k2 appears only in later rows: its shredded streams REGISTER
    // after stripe 0 flushed, and close() back-fills zero-length locs —
    // exactly the shape that desyncs a checksum counting empty streams
    // xxhash64 values: incompressible 8B/row so chunks actually reach the
    // stripe flush threshold (delta-coded ids alone encode to ~nothing)
    val df = spark.range(20000).select(c("id"),
      when(c("id") < 10000, map(lit("k1"), org.apache.spark.sql.functions.xxhash64(c("id"))))
        .otherwise(map(lit("k1"), org.apache.spark.sql.functions.xxhash64(c("id")),
          lit("k2"), org.apache.spark.sql.functions.xxhash64(c("id"), lit(7)))).as("m"))
    val dir = tmpDir("cksum-late")
    df.coalesce(1).write.format("nimble")
      .option("flatMapColumns", "m")
      .option("rowsPerChunk", "2048") // stripe flush checks at chunk bounds
      .option("stripeBytes", "4096") // force several stripes
      .mode("overwrite").save(dir)
    val file = graft.spark.NimbleSource.listFiles(dir).head
    val r = new graft.format.Tablet.Reader(file)
    try {
      val ft = r.footer
      assert(ft.version >= 12 && ft.stripes.length >= 2, s"fixture: v${ft.version}, ${ft.stripes.length} stripes")
      val raf = new java.io.RandomAccessFile(file, "r")
      for (si <- ft.stripes.indices) {
        // the NimbleDump v12 rule: per-stream hashes, empty streams excluded
        val hashes = scala.collection.mutable.ArrayBuffer[Long]()
        for (k <- ft.streamKeys.indices) {
          val loc = r.streamLoc(si, k)
          if (loc.length > 0) {
            val sb = new Array[Byte](loc.length.toInt)
            raf.seek(loc.offset); raf.readFully(sb)
            hashes += graft.format.Tablet.xxh3(sb, 0, sb.length)
          }
        }
        assert(graft.format.Tablet.combineStreamHashes(hashes.toArray) ==
          ft.stripes(si).checksum, s"stripe $si must verify despite late streams")
      }
      raf.close()
    } finally r.close()
  }

  test("stripe checksums verify; corruption detected") {
    val df = spark.range(10000).toDF("id")
    val dir = tmpDir("cksum")
    df.coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val file = graft.spark.NimbleSource.listFiles(dir).head
    val footer = graft.spark.NimbleSource.footerOf(file)
    val raf = new java.io.RandomAccessFile(file, "rw")
    val s0 = footer.stripes(0)
    val rd = new graft.format.Tablet.Reader(file, footer)
    val lens = try Array.tabulate(footer.streamKeys.length)(k => rd.streamLoc(0, k).length)
      finally rd.close()
    val buf = new Array[Byte](s0.length.toInt)
    raf.seek(s0.offset); raf.readFully(buf)
    assert(graft.format.Tablet.stripeChecksumOf(footer.version, buf, lens) == s0.checksum)
    // flip a byte -> checksum must mismatch
    raf.seek(s0.offset + 10)
    val orig = buf(10)
    raf.write(~orig & 0xff)
    raf.seek(s0.offset); raf.readFully(buf)
    assert(graft.format.Tablet.stripeChecksumOf(footer.version, buf, lens) != s0.checksum)
    raf.seek(s0.offset + 10); raf.write(orig) // restore
    raf.close()
  }

  test("limit pushdown stops decoding early, counts stay correct") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val dir = tmpDir("limit")
    pq.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    assert(nb.limit(5).collect().length == 5)
    assert(nb.filter(col("l_quantity") > 45).limit(7).collect().length == 7)
    assert(nb.select(col("l_orderkey")).limit(10000).count() == 6000) // fewer rows than limit
  }

  test("StartsWith prunes stripes and chunks on a sorted string key") {
    import spark.implicits._
    val df = (0 until 100000).map(i => (i.toLong, f"key_$i%06d")).toDF("id", "k")
    val dir = tmpDir("prefixprune")
    df.coalesce(1).sortWithinPartitions("k").write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val before = graft.spark.NimbleSource.chunksSkipped.get()
    val got = nb.filter(col("k").startsWith("key_0777")).count()
    assert(got == df.filter(col("k").startsWith("key_0777")).count())
    val skipped = graft.spark.NimbleSource.chunksSkipped.get() - before
    assert(skipped >= 4, s"prefix filter should skip most chunks, got $skipped")
    // no-match prefix past the max: everything pruned, zero rows
    assert(nb.filter(col("k").startsWith("zzz")).count() == 0)
  }

  test("chunk-frame stats skip non-matching chunks inside a stripe") {
    // one file, one stripe, ~12 chunks (16K rows each): a point predicate on
    // the sorted column must skip most chunks without decoding them
    val df = spark.range(200000).toDF("id").withColumn("v", col("id") * 3)
    val dir = tmpDir("chunkskip")
    df.coalesce(1).sortWithinPartitions("id").write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val before = graft.spark.NimbleSource.chunksSkipped.get()
    val rows = nb.filter(col("id") === 123456L).collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 123456L * 3)
    val skipped = graft.spark.NimbleSource.chunksSkipped.get() - before
    assert(skipped >= 8, s"expected most of ~12 chunks skipped, got $skipped")
    // range predicate spanning two chunks: correct rows, still skips the rest
    val cnt = nb.filter(col("id").between(16000L, 17000L)).count()
    assert(cnt == 1001)
  }

  test("sorted file + range predicate prunes stripes (F6 / Q9 metrics)") {
    // many small stripes via tiny stripe threshold: use multiple files instead
    val df = spark.range(200000).toDF("id").withColumn("payload", expr("repeat('x', 20)"))
    val dir = tmpDir("prunemetrics")
    df.repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    nb.rdd.getNumPartitions // plan with no filters
    val all = graft.spark.NimbleSource.lastPlanStats(dir).get.stripesPlanned
    val pruned = nb.filter(col("id") === 123456L)
    pruned.rdd.getNumPartitions
    val stats = graft.spark.NimbleSource.lastPlanStats(dir).get
    assert(stats.stripesPlanned < all,
      s"pruning: ${stats.stripesPlanned} of $all stripes (${stats.stripesPruned} pruned)")
    assert(stats.stripesPruned > 0)
    assert(pruned.count() == 1)
  }

  test("hash index assists the DSv2 scan: equality probes skip non-candidate chunks") {
    // keys deliberately NOT sorted (hash-scrambled) so neither stripe stats
    // nor chunk stats can prune — only the per-stripe hash index can
    val df = spark.range(50000).toDF("seq")
      .withColumn("id", expr("xxhash64(seq) % 1000000"))
      .withColumn("payload", expr("concat('p', seq)"))
    val dir = tmpDir("idxscan")
    df.coalesce(1).write.format("nimble")
      .option("indexColumns", "id")
      .option("rowsPerChunk", "2048")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val probe = df.select("id").collect()(12345).getLong(0)
    val expect = df.filter(col("id") === probe).select("seq").collect().map(_.getLong(0)).sorted

    val probes0 = graft.spark.NimbleSource.indexScanProbes.get()
    val skipped0 = graft.spark.NimbleSource.chunksSkipped.get()
    val got = nb.filter(col("id") === probe).select("seq").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == expect.toSeq)
    assert(graft.spark.NimbleSource.indexScanProbes.get() > probes0,
      "scan did not consult the hash index")
    assert(graft.spark.NimbleSource.chunksSkipped.get() - skipped0 >= 20,
      s"expected most of the ~24 chunks skipped, got ${graft.spark.NimbleSource.chunksSkipped.get() - skipped0}")

    // In-filter probes union candidates; results stay exact
    val probes = df.select("id").collect().slice(100, 103).map(_.getLong(0))
    val expectIn = df.filter(col("id").isin(probes: _*)).select("seq")
      .collect().map(_.getLong(0)).sorted
    val gotIn = nb.filter(col("id").isin(probes: _*)).select("seq")
      .collect().map(_.getLong(0)).sorted
    assert(gotIn.toSeq == expectIn.toSeq)

    // a filter on a non-indexed column takes the normal path and stays exact
    val gotPlain = nb.filter(col("payload") === "p777").select("seq").collect()
    assert(gotPlain.map(_.getLong(0)).toSeq == Seq(777L))

    // narrow RANGE probes use the sorted index (keys hash-scrambled: stats
    // are blind, only #sidx can restrict chunks); results exact
    val probes1 = graft.spark.NimbleSource.indexScanProbes.get()
    val expectR = df.filter(col("id") >= 1000L && col("id") <= 1400L).select("seq")
      .collect().map(_.getLong(0)).sorted
    val gotR = nb.filter(col("id") >= 1000L && col("id") <= 1400L).select("seq")
      .collect().map(_.getLong(0)).sorted
    assert(gotR.toSeq == expectR.toSeq)
    assert(graft.spark.NimbleSource.indexScanProbes.get() > probes1,
      "range scan did not consult the sorted index")

    // wide range: the selectivity gate refuses the probe, scan stays exact
    val expectW = df.filter(col("id") > 0L).count()
    assert(nb.filter(col("id") > 0L).count() == expectW)
  }
}
