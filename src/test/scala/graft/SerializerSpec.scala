package graft

import graft.format.Serializer
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** Row-batch serializer round-trip (reference: dwio/nimble/serializer/). */
class SerializerSpec extends SparkTestBase {

  test("schema-tagged blob round-trips rows incl. nested types") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType),
      StructField("tags", ArrayType(StringType), nullable = true),
      StructField("loc", StructType(Seq(
        StructField("lat", DoubleType), StructField("lon", DoubleType))), nullable = true)))
    val rows = (0 until 500).map { i =>
      Row(i.toLong,
        if (i % 7 == 0) null else s"name$i",
        i / 3.0,
        if (i % 5 == 0) null else Seq(s"t${i % 3}", "x"),
        if (i % 11 == 0) null else Row(i * 0.5, -i * 0.25))
    }
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
    val internal = rows.map(r => enc(r).copy())
    val blob = Serializer.serialize(schema, internal.iterator)
    val (schema2, back) = Serializer.deserialize(blob)
    assert(schema2 == schema)
    assert(back.length == rows.length)
    val dec = ExpressionEncoder(RowEncoder.encoderFor(schema)).resolveAndBind().createDeserializer()
    val backRows = back.map(dec(_))
    rows.zip(backRows).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i: $a vs $b")
    }
  }

  test("projector: subset decode without touching other streams") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType), StructField("c", DoubleType)))
    val rows = (0 until 100).map(i => Row(i.toLong, s"s$i", i * 0.5))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
    val blob = Serializer.serialize(schema, rows.map(r => enc(r).copy()).iterator)
    val (projSchema, back) = Serializer.deserializeProjected(blob, Set("a", "c"))
    assert(projSchema.fieldNames.toSeq == Seq("a", "c"))
    assert(back.length == 100)
    assert(back(7).getLong(0) == 7L && back(7).getDouble(1) == 3.5)
  }

  test("point lookup bypasses Spark (index-reader analog)") {
    val sparkDf = spark.read.parquet(s"${sf()}/orders.parquet")
    val dir = tmpDir("lookup")
    sparkDf.coalesce(1).sortWithinPartitions("o_custkey").write.format("nimble")
      .option("sortColumns", "o_custkey")
      .option("bloomFilterColumns", "o_orderkey").mode("overwrite").save(dir)
    val expected = sparkDf.filter(org.apache.spark.sql.functions.col("o_orderkey") === 42L)
      .collect()
    val got = graft.format.Lookup.pointLookup(dir, "o_orderkey", 42L)
    assert(got.length == expected.length)
    if (expected.nonEmpty) {
      assert(got.head("o_custkey") == expected.head.getAs[Long]("o_custkey"))
      assert(got.head("o_orderstatus") == expected.head.getAs[String]("o_orderstatus"))
    }
    assert(graft.format.Lookup.pointLookup(dir, "o_orderkey", -999L).isEmpty)
  }

  test("hash index: point lookup decodes ~a chunk, not the stripe") {
    val sparkDf = spark.read.parquet(s"${sf()}/orders.parquet")
    val dir = tmpDir("lookup_idx")
    // small chunks force many chunks per stripe so the decode-cost gap between
    // indexed (one chunk) and scan (all chunks) is structural, not accidental
    sparkDf.coalesce(1).write.format("nimble")
      .option("indexColumns", "o_orderkey,o_orderstatus")
      .option("rowsPerChunk", "64").mode("overwrite").save(dir)
    val expected = sparkDf.filter(org.apache.spark.sql.functions.col("o_orderkey") === 42L).collect()
    val (got, m) = graft.format.Lookup.pointLookupMetered(dir, "o_orderkey", 42L)
    assert(got.length == expected.length)
    if (expected.nonEmpty)
      assert(got.head("o_custkey") == expected.head.getAs[Long]("o_custkey"))
    assert(m.indexProbes > 0, "index stream must be used")
    assert(m.stripeRows > 0)
    // the verdict-#9 bar: rows decoded << stripe row count (index reads the
    // candidate chunks only; a full scan decodes every chunk of every column)
    assert(m.rowsDecoded < m.stripeRows,
      s"rowsDecoded=${m.rowsDecoded} should be well under stripeRows=${m.stripeRows}")
    // r15: verification + sibling materialization decode the hit POSITIONS
    // when the codec seeks (strings included) — pre-r15 every hit chunk
    // range-decoded up to rowsPerChunk (64) rows PER COLUMN (~576 here);
    // codecs that decline point reads may still add a bounded window each
    assert(m.rowsDecoded < 200,
      s"rowsDecoded=${m.rowsDecoded}: positional materialization regressed to range windows")
    val (_, mScan) = graft.format.Lookup.pointLookupMetered(dir, "o_custkey", 42L)
    assert(mScan.indexProbes == 0, "non-indexed column takes the scan path")
    assert(m.rowsDecoded < mScan.rowsDecoded / 2,
      s"indexed decode ${m.rowsDecoded} vs scan decode ${mScan.rowsDecoded}")
    // string-key probe through the same index machinery
    val (gotStr, mStr) = graft.format.Lookup.pointLookupMetered(dir, "o_orderstatus", "F")
    val expStr = sparkDf.filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F").count()
    assert(gotStr.length == expStr.toInt)
    assert(mStr.indexProbes > 0)
    // miss probes decode nothing
    val (miss, mMiss) = graft.format.Lookup.pointLookupMetered(dir, "o_orderkey", -999L)
    assert(miss.isEmpty && mMiss.rowsDecoded == 0)
    // the hidden #idx: streams must be invisible to the Spark scan path
    val back = spark.read.format("nimble").load(dir)
    assert(back.count() == sparkDf.count())
    assert(back.schema.fieldNames.toSet == sparkDf.schema.fieldNames.toSet)
    assert(back.filter(org.apache.spark.sql.functions.col("o_orderkey") === 42L).count() ==
      expected.length.toLong)
  }

  test("shared-dict sibling columns window under indexed lookup (string nextRange consumer)") {
    // shared-dict strings decline positional reads by design, so sibling
    // materialization takes the nextRange fallback — which must expand a
    // WINDOW, not the whole chunk (r16: decodeSharedRange). Low-card string
    // over many small chunks per stripe engages stripe-shared coding.
    val df = spark.range(4096).selectExpr("id AS k", "concat('cat_', id % 8) AS cat")
    val dir = tmpDir("lookup_shared")
    df.coalesce(1).write.format("nimble")
      .option("indexColumns", "k").option("rowsPerChunk", "256")
      .mode("overwrite").save(dir)
    // the premise must hold or the test silently weakens: the cat stream is
    // actually shared-dict coded (otherwise DICT positional reads would pass
    // the decode bound without exercising the window path)
    val r = new graft.format.Tablet.Reader(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gft")).head.getPath)
    try {
      val cur = new graft.format.Tablet.ChunkCursor(r.readStreamBytes(0, r.keyId("cat")))
      assert(cur.peekCodec() == graft.format.Codecs.SHAREDDICT,
        "premise: cat must be stripe-shared-dict coded")
    } finally r.close()
    val (got, m) = graft.format.Lookup.pointLookupMetered(dir, "k", 1234L)
    assert(got.length == 1 && got.head("cat") == s"cat_${1234 % 8}")
    // one hit row: k verifies positionally (~1), cat windows (~1) — the
    // pre-fix whole-chunk expand cost 256 rows for the sibling alone
    assert(m.rowsDecoded < 64,
      s"rowsDecoded=${m.rowsDecoded}: shared-dict sibling regressed to whole-chunk expand")
  }

  test("Huffman checkpoints: point lookup decodes a bounded window of the chunk") {
    import graft.format._
    val n = 16384
    val rnd = new scala.util.Random(5)
    // Zipf-ish skew over 64 values (the shape CodecsSpec pins as a HUFFMAN
    // selection): entropy ~2-3 bits vs DICT's 6-bit indices
    val skew = Array.fill(n) {
      val r = rnd.nextDouble()
      val v = if (r < 0.5) 0 else if (r < 0.75) 1 else if (r < 0.875) 2 else rnd.nextInt(64)
      v.toLong * 1000
    }
    val probe = new ByteSink()
    Codecs.encodeColumn(LongsCol(skew, PhysType.I64), probe)
    assert(probe.toArray(0) == Codecs.HUFFMAN, s"fixture must select Huffman, got id=${probe.toArray(0)}")

    // direct range-decode equality against the full decode, across
    // checkpoint boundaries and edges
    val full = Codecs.decodeColumn(new ByteCursor(probe.toArray)).asInstanceOf[LongsCol].values
    assert(full.toSeq == skew.toSeq)
    for ((f, u) <- Seq((0, 10), (255, 257), (256, 512), (12345, 12346), (n - 1, n), (n, n))) {
      val (col, start) = Codecs.decodeValuesRange(new ByteCursor(probe.toArray), f, u)
      assert(start <= f && start % Huffman.CheckpointStride == 0, s"[$f,$u) start=$start")
      assert(col.len < n || u - f > n - Huffman.CheckpointStride, s"[$f,$u) decoded whole chunk")
      for (r <- f until u)
        assert(col.asInstanceOf[LongsCol].values(r - start) == skew(r), s"row $r of [$f,$u)")
    }

    // end-to-end: indexed point lookup must decode the Huffman sibling as a
    // bounded window (key chunk still decodes whole — it is delta-coded)
    import spark.implicits._
    val df = (0 until n).map(i => (i.toLong, skew(i))).toDF("id", "h")
    val dir = tmpDir("huff_ra")
    df.coalesce(1).write.format("nimble")
      .option("indexColumns", "id").option("rowsPerChunk", n.toString)
      .mode("overwrite").save(dir)
    val (got, m) = graft.format.Lookup.pointLookupMetered(dir, "id", 12345L)
    assert(got.length == 1 && got.head("h") == skew(12345))
    // without checkpoints this is 2n (key chunk + whole Huffman chunk); the
    // bounded window keeps the sibling's share at <= stride + 256 slack
    assert(m.rowsDecoded < n + Huffman.CheckpointStride + 256,
      s"rowsDecoded=${m.rowsDecoded}, expected key chunk ($n) + a bounded window")
  }

  test("sorted index: range lookup decodes bracketed chunks, not the stripe") {
    import org.apache.spark.sql.functions.col
    val sparkDf = spark.read.parquet(s"${sf()}/orders.parquet")
    val dir = tmpDir("range_idx")
    // small chunks: the decode-cost gap between a bracketed range probe and
    // a full stripe scan must be structural (reference:
    // dwio/nimble/index/SortedIndex.h:48, IndexLookup.h:55-65)
    sparkDf.coalesce(1).write.format("nimble")
      .option("indexColumns", "o_orderkey,o_orderstatus")
      .option("rowsPerChunk", "64").mode("overwrite").save(dir)
    val expected = sparkDf.filter(col("o_orderkey").between(100L, 140L)).collect()
    assert(expected.nonEmpty)
    val (got, m) = graft.format.Lookup.rangeLookupMetered(dir, "o_orderkey", 100L, 140L)
    assert(got.length == expected.length)
    val expByKey = expected.map(r =>
      r.getAs[Long]("o_orderkey") -> r.getAs[Long]("o_custkey")).toMap
    for (row <- got)
      assert(expByKey(row("o_orderkey").asInstanceOf[Long]) == row("o_custkey"))
    assert(m.indexProbes > 0, "sorted index stream must be used")
    assert(m.rowsDecoded < m.stripeRows,
      s"rowsDecoded=${m.rowsDecoded} should be well under stripeRows=${m.stripeRows}")
    // unindexed column: falls back to decoding the key column per stripe
    val (gotScan, mScan) = graft.format.Lookup.rangeLookupMetered(dir, "o_custkey", 100L, 140L)
    assert(mScan.indexProbes == 0, "non-indexed column takes the scan path")
    assert(gotScan.length == sparkDf.filter(col("o_custkey").between(100L, 140L)).count().toInt)
    assert(m.rowsDecoded < mScan.rowsDecoded / 2,
      s"indexed decode ${m.rowsDecoded} vs scan decode ${mScan.rowsDecoded}")
    // string range through the order-preserving prefix keys
    val (gotStr, mStr) = graft.format.Lookup.rangeLookupMetered(dir, "o_orderstatus", "F", "O")
    val expStr = sparkDf.filter(col("o_orderstatus") >= "F" && col("o_orderstatus") <= "O").count()
    assert(gotStr.length == expStr.toInt)
    assert(mStr.indexProbes > 0)
    // miss range: stats prune every stripe, zero rows decode
    val (miss, mMiss) = graft.format.Lookup.rangeLookupMetered(dir, "o_orderkey", -500L, -100L)
    assert(miss.isEmpty && mMiss.rowsDecoded == 0, s"miss decoded ${mMiss.rowsDecoded} rows")
    // inverted range is empty, not an error
    assert(graft.format.Lookup.rangeLookup(dir, "o_orderkey", 140L, 100L).isEmpty)
    // the hidden #sidx: streams stay invisible to the Spark scan path
    val back = spark.read.format("nimble").load(dir)
    assert(back.count() == sparkDf.count())
    assert(back.schema.fieldNames.toSet == sparkDf.schema.fieldNames.toSet)
  }

  test("indexColumns on an unsupported or unknown column is rejected at write time") {
    val sparkDf = spark.read.parquet(s"${sf()}/orders.parquet")
    // double column: the hash index can't probe it — a silent empty index
    // would shadow the scan fallback, so the write must fail loudly
    val eType = intercept[org.apache.spark.SparkException] {
      sparkDf.coalesce(1).write.format("nimble")
        .option("indexColumns", "o_totalprice")
        .mode("overwrite").save(tmpDir("idx_badtype"))
    }
    assert(exceptionChain(eType).exists(_.getMessage != null) &&
      exceptionChain(eType).exists(m => m.getMessage != null &&
        m.getMessage.contains("unsupported type")), s"got: $eType")
    val eName = intercept[org.apache.spark.SparkException] {
      sparkDf.coalesce(1).write.format("nimble")
        .option("indexColumns", "no_such_col")
        .mode("overwrite").save(tmpDir("idx_badname"))
    }
    assert(exceptionChain(eName).exists(m => m.getMessage != null &&
      m.getMessage.contains("no such column")), s"got: $eName")
  }

  test("indexColumns on a nanos-split column is rejected (micros keys are unprobeable)") {
    val df = spark.sql("SELECT id, id * 1000000 AS ts FROM range(100)")
    val e = intercept[Exception] {
      df.coalesce(1).write.format("nimble")
        .option("timestampNanosColumns", "ts")
        .option("indexColumns", "ts")
        .mode("overwrite").save(tmpDir("idx_nanos"))
    }
    assert(exceptionChain(e).exists(m => m.getMessage != null &&
      m.getMessage.contains("timestampNanosColumns")), s"got: $e")
  }

  test("indexColumns resolves case-insensitively like Spark column resolution") {
    val sparkDf = spark.read.parquet(s"${sf()}/orders.parquet")
    val dir = tmpDir("idx_case")
    sparkDf.coalesce(1).write.format("nimble")
      .option("indexColumns", "O_ORDERKEY") // schema spells it o_orderkey
      .mode("overwrite").save(dir)
    // the index stream materialized under the canonical (schema) spelling
    val (rows, m) = graft.format.Lookup.pointLookupMetered(dir, "o_orderkey", 42L)
    assert(rows.nonEmpty && rows.head("o_orderkey") == 42L)
    assert(m.indexProbes > 0, "canonicalized index column was not probed")
  }

  private def exceptionChain(t: Throwable): List[Throwable] =
    if (t == null) Nil else t :: exceptionChain(t.getCause)

  test("point lookup on nanos-split tables reports and matches logical values") {
    import org.apache.spark.sql.functions.col
    val df = spark.sql(
      "SELECT id, id * 1234567891 + id % 1000 AS ts FROM range(2000)")
    val dir = tmpDir("lookup_nanos")
    df.coalesce(1).write.format("nimble")
      .option("timestampNanosColumns", "ts").mode("overwrite").save(dir)
    // sibling-column materialization: ts must come back recombined, not as
    // the raw micros stream value
    val byId = graft.format.Lookup.pointLookup(dir, "id", 42L)
    assert(byId.length == 1)
    assert(byId.head("ts") == 42L * 1234567891L + 42L)
    // probing the split column itself: scan path with scaled stats; the
    // epoch-nanos probe must find its row (micros-scale stats would prune
    // every stripe and silently return nothing)
    val probe = 77L * 1234567891L + 77L
    val byTs = graft.format.Lookup.pointLookup(dir, "ts", probe)
    assert(byTs.length == 1, s"split-column probe found ${byTs.length} rows")
    assert(byTs.head("id") == 77L)
    assert(graft.format.Lookup.pointLookup(dir, "ts", probe + 1).isEmpty)
  }

  test("empty batch") {
    val schema = StructType(Seq(StructField("x", IntegerType)))
    val blob = Serializer.serialize(schema, Iterator.empty)
    val (s2, rows) = Serializer.deserialize(blob)
    assert(s2 == schema && rows.isEmpty)
  }

  test("v1 blobs (no stream directory) still deserialize during mixed-version rollout") {
    import graft.format.{ByteCursor, ByteSink}
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val rows = (0 until 40).map(i => Row(i.toLong, s"s$i"))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
    val blob2 = Serializer.serialize(schema, rows.map(r => enc(r).copy()).iterator)
    // rebuild the v1 layout ([schema block][rowcount][chunks in streamKeys
    // order], no version tag / name table) from the v2 bytes: for an atomic
    // schema the v2 directory order IS streamKeys order
    val cur = new ByteCursor(blob2)
    assert(cur.readVarint() == 2L)
    val sj = cur.readBlock()
    val schemaBytes = sj.readBytes(sj.remaining)
    val n = cur.readVarint()
    val count = cur.readVarint().toInt
    val v1 = new ByteSink()
    v1.writeBlock(schemaBytes)
    v1.writeVarint(n)
    for (_ <- 0 until count) {
      cur.readBlock() // name — absent in v1
      val cb = cur.readBlock()
      v1.writeBlock(cb.readBytes(cb.remaining))
    }
    val (s1, back) = Serializer.deserialize(v1.toArray)
    assert(s1 == schema && back.length == 40)
    assert(back(7).getLong(0) == 7L && back(7).getUTF8String(1).toString == "s7")
  }

  test("map columns round-trip, regular and FlatMap layout (Serializer.h FlatMap parity)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("m", MapType(StringType, DoubleType), nullable = true)))
    val rows = (0 until 300).map { i =>
      Row(i.toLong,
        if (i % 13 == 0) null
        else Map((s"f${i % 4}" -> i * 0.5) +: (if (i % 2 == 0) Seq("common" -> 1.0) else Nil): _*))
    }
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
    val internal = rows.map(r => enc(r).copy())
    val dec = ExpressionEncoder(RowEncoder.encoderFor(schema)).resolveAndBind().createDeserializer()
    def norm(r: Row): (Long, Map[String, Double]) =
      (r.getLong(0), Option(r.getMap[String, Double](1)).map(_.toMap).orNull)

    // regular map layout (#len/#key/#val)
    val blob = Serializer.serialize(schema, internal.iterator)
    val (s2, back) = Serializer.deserialize(blob)
    assert(s2 == schema)
    rows.zip(back.map(dec(_))).foreach { case (a, b) => assert(norm(a) == norm(b), s"$a vs $b") }

    // FlatMap layout: per-feature #in:/#fm: streams, discovered from the
    // blob's embedded stream directory on read
    val fmBlob = Serializer.serialize(schema, internal.iterator,
      graft.format.Fields.WriteOptions(flatMap = Set("m")))
    val (s3, fmBack) = Serializer.deserialize(fmBlob)
    assert(s3 == schema)
    rows.zip(fmBack.map(dec(_))).foreach { case (a, b) => assert(norm(a) == norm(b), s"$a vs $b") }
    // the layouts genuinely differ on the wire
    assert(new String(fmBlob, "ISO-8859-1").contains("m#in:f0"))
    assert(!new String(blob, "ISO-8859-1").contains("m#in:f0"))

    // v15 escape parity: '#'-bearing logical keys ride the serializer's
    // FlatMap layout too — stream names escape, the read unescapes
    val hashRows = (0 until 200).map { i =>
      Row(i.toLong, Map(s"a#${i % 3}" -> i * 0.5, "x##y" -> i * 1.5))
    }
    val hashInternal = hashRows.map(r => enc(r).copy())
    val hBlob = Serializer.serialize(schema, hashInternal.iterator,
      graft.format.Fields.WriteOptions(flatMap = Set("m")))
    val (s4, hBack) = Serializer.deserialize(hBlob)
    assert(s4 == schema)
    hashRows.zip(hBack.map(dec(_))).foreach { case (a, b) =>
      assert(norm(a) == norm(b), s"$a vs $b") }
    assert(new String(hBlob, "ISO-8859-1").contains("m#in:a##0"), "escaped stream name")
  }

  test("projector fuzz: random nested/flatmap schemas x random projections x v1/v2 blobs") {
    // writeAndVerify idiom (reference: velox/tests/VeloxReaderTest.cpp:805):
    // seeded random schemas + data, round-tripped through random projections
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260813L)
    val rnd = new scala.util.Random(seed)
    import graft.format.{ByteCursor, ByteSink, Fields}

    def randType(depth: Int): DataType = rnd.nextInt(if (depth > 0) 9 else 6) match {
      case 0 => LongType
      case 1 => IntegerType
      case 2 => DoubleType
      case 3 => StringType
      case 4 => BooleanType
      case 5 => ArrayType(if (rnd.nextBoolean()) StringType else LongType)
      case 6 => MapType(StringType, if (rnd.nextBoolean()) DoubleType else LongType)
      case 7 => StructType(Seq(StructField("s0", LongType),
        StructField("s1", StringType, nullable = true)))
      case 8 => StructType(Seq(StructField("n0", randType(depth - 1), nullable = true),
        StructField("n1", DoubleType)))
    }
    def randValue(dt: DataType, i: Int): Any = dt match {
      case LongType => i.toLong * 3 - 11
      case IntegerType => i - 7
      case DoubleType => i * 0.25 - 3
      case StringType => if (i % 9 == 0) "" else s"v${i % 37}"
      case BooleanType => i % 3 == 0
      case ArrayType(et, _) => (0 until i % 4).map(j => randValue(et, i + j))
      case MapType(_, vt, _) =>
        // key pool includes '#'/"##" shapes so flatmap trials cross the v15
        // stream-name escape (identity for the plain keys)
        (0 until i % 3).map { j =>
          val keys = Seq("k0", "k1", "k2", "k#3", "k##4")
          keys((i + j) % 5) -> randValue(vt, i + j)
        }.toMap
      case st: StructType => Row(st.fields.map(f => valueOrNull(f, i + 1)).toSeq: _*)
    }
    def valueOrNull(f: StructField, i: Int): Any =
      if (f.nullable && i % 13 == 0) null else randValue(f.dataType, i)
    def norm(v: Any): Any = v match {
      case r: Row => r.toSeq.map(norm)
      case m: scala.collection.Map[_, _] =>
        m.toSeq.map { case (k, x) => (k, norm(x)) }.sortBy(_._1.toString)
      case s: scala.collection.Seq[_] => s.map(norm).toVector
      case d: Double => math.round(d * 1e9)
      case other => other
    }

    for (trial <- 0 until 25) {
      val nf = 2 + rnd.nextInt(4)
      val schema = StructType((0 until nf).map(i =>
        StructField(s"f$i", randType(1), nullable = rnd.nextBoolean())))
      val mapCols = schema.fields.collect { case f if f.dataType.isInstanceOf[MapType] => f.name }
      val flat: Set[String] = mapCols.filter(_ => rnd.nextBoolean()).toSet
      val nRows = 1 + rnd.nextInt(300)
      val rows = (0 until nRows).map(i => Row(schema.fields.map(f => valueOrNull(f, i)).toSeq: _*))
      val enc = ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
      val blob = Serializer.serialize(schema, rows.map(r => enc(r).copy()).iterator,
        Fields.WriteOptions(flatMap = flat))

      // v1 rebuild: streams re-emitted in the schema-derived key order with
      // no name table — only expressible without flatmap feature streams
      // (v1 readers derive streams from the schema)
      val v1Blob: Option[Array[Byte]] = if (flat.isEmpty) {
        val cur = new ByteCursor(blob)
        assert(cur.readVarint() == 2L)
        val sj = cur.readBlock(); val schemaBytes = sj.readBytes(sj.remaining)
        val n = cur.readVarint(); val count = cur.readVarint().toInt
        val byName = (0 until count).map { _ =>
          val nb = cur.readBlock(); val name = new String(nb.readBytes(nb.remaining), "UTF-8")
          val cb = cur.readBlock(); name -> cb.readBytes(cb.remaining)
        }.toMap
        val v1 = new ByteSink()
        v1.writeBlock(schemaBytes); v1.writeVarint(n)
        Fields.streamKeys(schema).foreach { k =>
          v1.writeBlock(byName.getOrElse(k, Array.emptyByteArray))
        }
        Some(v1.toArray)
      } else None

      val keep = rnd.shuffle(schema.fields.toSeq)
        .take(1 + rnd.nextInt(schema.fields.length)).map(_.name).toSet
      val wanted = StructType(schema.fields.filter(f => keep(f.name)))
      val dec = ExpressionEncoder(RowEncoder.encoderFor(wanted)).resolveAndBind().createDeserializer()
      val expected = rows.map(r =>
        wanted.fields.map(f => norm(r.get(schema.fieldIndex(f.name)))).toSeq)

      def check(b: Array[Byte], label: String): Unit = {
        val (ps, got) = Serializer.deserializeProjected(b, keep)
        assert(ps == wanted, s"seed=$seed trial=$trial $label schema: $ps vs $wanted")
        val gotN = got.map(ir => dec(ir).toSeq.map(norm))
        gotN.zip(expected).zipWithIndex.foreach { case ((g, e), ri) =>
          assert(g == e, s"seed=$seed trial=$trial $label row $ri keep=$keep " +
            s"flat=$flat schema=${schema.simpleString}\n got=$g\n exp=$e")
        }
        assert(gotN.length == expected.length, s"seed=$seed trial=$trial $label row count")
      }
      check(blob, "v2")
      v1Blob.foreach(check(_, "v1"))
    }
  }

  test("projector skips flatmap feature streams of unprojected columns") {
    val schema = StructType(Seq(
      StructField("a", LongType),
      StructField("m", MapType(StringType, LongType), nullable = true)))
    val rows = (0 until 50).map(i => Row(i.toLong, Map(s"k${i % 3}" -> i.toLong)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
    val blob = Serializer.serialize(schema, rows.map(r => enc(r).copy()).iterator,
      graft.format.Fields.WriteOptions(flatMap = Set("m")))
    // project only the atomic column: decodes without touching feature streams
    val (pa, backA) = Serializer.deserializeProjected(blob, Set("a"))
    assert(pa.fieldNames.toSeq == Seq("a") && backA.map(_.getLong(0)).toSeq == (0L until 50L))
    // project only the flatmap column: features reassemble into the map
    val (pm, backM) = Serializer.deserializeProjected(blob, Set("m"))
    assert(pm.fieldNames.toSeq == Seq("m"))
    val dec = ExpressionEncoder(RowEncoder.encoderFor(pm)).resolveAndBind().createDeserializer()
    assert(dec(backM(7)).getMap[String, Long](0).toMap == Map("k1" -> 7L))
  }
}
