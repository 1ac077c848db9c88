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

  test("empty batch") {
    val schema = StructType(Seq(StructField("x", IntegerType)))
    val blob = Serializer.serialize(schema, Iterator.empty)
    val (s2, rows) = Serializer.deserialize(blob)
    assert(s2 == schema && rows.isEmpty)
  }
}
