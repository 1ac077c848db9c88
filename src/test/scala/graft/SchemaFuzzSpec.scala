package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Seeded random-schema round-trip fuzz: random nested schemas (struct /
  * array / map over random atomics, depth <= 2), random data with nulls,
  * empty containers, empty/unicode strings and extreme numeric values,
  * written through the connector with random writer options and compared
  * row-for-row after a read. Failures reproduce from the seed. */
class SchemaFuzzSpec extends SparkTestBase {

  private val atomics: Vector[DataType] = Vector(LongType, IntegerType, ShortType,
    DoubleType, FloatType, BooleanType, StringType, BinaryType, DateType)

  private def randType(rnd: scala.util.Random, depth: Int): DataType =
    if (depth >= 2 || rnd.nextInt(100) < 60) atomics(rnd.nextInt(atomics.length))
    else rnd.nextInt(3) match {
      case 0 => StructType((0 until 1 + rnd.nextInt(3)).map(i =>
        StructField(s"f$i", randType(rnd, depth + 1), nullable = true)))
      case 1 => ArrayType(randType(rnd, depth + 1), containsNull = true)
      case _ => MapType(StringType, randType(rnd, depth + 1), valueContainsNull = true)
    }

  private def randValue(rnd: scala.util.Random, dt: DataType, depth: Int): Any = {
    if (rnd.nextInt(100) < 12) return null
    dt match {
      case LongType => rnd.nextInt(5) match {
        case 0 => Long.MaxValue case 1 => Long.MinValue case _ => rnd.nextLong()
      }
      case IntegerType => rnd.nextInt()
      case ShortType => rnd.nextInt().toShort
      case DoubleType => rnd.nextInt(7) match {
        case 0 => Double.NaN case 1 => Double.PositiveInfinity
        case 2 => Double.NegativeInfinity
        case 3 => -0.0 case _ => rnd.nextDouble() * 1e12
      }
      case FloatType => rnd.nextInt(7) match {
        case 0 => Float.NaN case 1 => Float.PositiveInfinity
        case 2 => Float.NegativeInfinity
        case 3 => -0.0f case _ => (rnd.nextFloat() - 0.5f) * 1e9f
      }
      case BooleanType => rnd.nextBoolean()
      case StringType => rnd.nextInt(5) match {
        case 0 => ""
        case 1 => "naïve-日本語-🚀"
        case _ => scala.util.Random.javaRandomToRandom(
          new java.util.Random(rnd.nextLong())).alphanumeric.take(rnd.nextInt(24)).mkString
      }
      case BinaryType => val b = new Array[Byte](rnd.nextInt(16)); rnd.nextBytes(b); b
      case DateType => new java.sql.Date(86400000L * (rnd.nextInt(40000) - 10000))
      case s: StructType => Row(s.fields.map(f => randValue(rnd, f.dataType, depth + 1)).toSeq: _*)
      case a: ArrayType =>
        Seq.fill(rnd.nextInt(4))(randValue(rnd, a.elementType, depth + 1))
      case m: MapType =>
        (0 until rnd.nextInt(3)).map(i => s"k$i" -> randValue(rnd, m.valueType, depth + 1)).toMap
    }
  }

  test("random nested schemas round-trip through the connector (seeded)") {
    val rnd = new scala.util.Random(2026)
    for (trial <- 0 until 8) {
      val schema = StructType(
        StructField("row_id", LongType, nullable = false) +:
          (0 until 2 + rnd.nextInt(4)).map(i =>
            StructField(s"c$i", randType(rnd, 0), nullable = true)))
      val n = 200 + rnd.nextInt(800)
      val rows = (0 until n).map { i =>
        Row((i.toLong +: schema.fields.tail.map(f => randValue(rnd, f.dataType, 0)).toSeq): _*)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1 + rnd.nextInt(3)), schema)
      val dir = tmpDir(s"schemafuzz$trial")
      var w = df.write.format("nimble").mode("overwrite")
      if (rnd.nextBoolean()) w = w.option("rowsPerChunk", (64 << rnd.nextInt(4)).toString)
      if (rnd.nextBoolean()) w = w.option("compression", Seq("zstd", "lz4", "none")(rnd.nextInt(3)))
      w.save(dir)

      val back = spark.read.format("nimble").load(dir)
      assert(back.schema.fieldNames.sorted.toSeq == schema.fieldNames.sorted.toSeq, s"trial $trial")
      // row-wise compare keyed by row_id; JSON canonicalizes nested values
      // (NaN and binary print stably; map key order is the only wobble, and
      // generated maps use at most 3 fixed keys so sorting is unnecessary)
      val wantRows = df.toJSON.collect().sorted
      val gotRows = back.toJSON.collect().sorted
      assert(gotRows.length == wantRows.length, s"trial $trial: ${gotRows.length} vs ${wantRows.length}")
      for (i <- wantRows.indices if wantRows(i) != gotRows(i)) {
        fail(s"trial $trial row $i:\n  want ${wantRows(i)}\n  got  ${gotRows(i)}")
      }
    }
  }
}
