package graft

/** NimbleDSL-analog REPL (reference: dwio/nimble/tools/NimbleDslVm.h). */
class DslSpec extends SparkTestBase {
  test("SELECT ... WHERE ... LIMIT over a tablet file") {
    import spark.implicits._
    val dir = tmpDir("dsl")
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "name", "v").coalesce(1)
      .write.format("nimble").mode("overwrite").save(dir)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.tools.NimbleDsl.execute(s"SELECT id,name,v FROM $dir WHERE v >= 20 LIMIT 2")
    }
    val lines = out.toString.trim.split("\n")
    assert(lines(0) == "id\tname\tv")
    assert(lines(1) == "2\tb\t20.0" && lines(2) == "3\tc\t30.0", lines.mkString("|"))
    assert(lines.length == 3)
  }
}
