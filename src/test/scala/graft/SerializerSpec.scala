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

  test("empty batch") {
    val schema = StructType(Seq(StructField("x", IntegerType)))
    val blob = Serializer.serialize(schema, Iterator.empty)
    val (s2, rows) = Serializer.deserialize(blob)
    assert(s2 == schema && rows.isEmpty)
  }
}
