package graft.tools

/** Dev probe: list SparkEntry.queries keys vs oracleSql keys (mismatch = a
  * query the driver's correctness gate silently misses). */
object KeysProbe {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracle=${o.size}")
    println(s"oracle-only: ${(o -- q).toSeq.sorted.mkString(",")}")
    println(s"queries-only: ${(q -- o).toSeq.sorted.mkString(",")}")
  }
}
