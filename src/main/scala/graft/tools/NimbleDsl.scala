package graft.tools

import graft.format._

/** Interactive SQL-ish inspection REPL — the NimbleDSL analog (reference:
  * dwio/nimble/tools/NimbleDslVm.h:28-46, docs/NimbleDSL.md:22-135).
  *
  * Supported statements (one per line; file = .gft file or directory):
  *   DESCRIBE <file>
  *   SHOW {INFO|STRIPES|STREAMS|ENCODING|LAYOUT|STATS|INDEX|NDV} <file>
  *   SHOW HISTOGRAM [TOP] [STRIPE s] <file>
  *   SELECT col1,col2|* FROM <file> [WHERE col =|!=|<|<=|>|>= literal] [LIMIT n]
  *   QUIT
  *
  * SELECT executes directly on the tablet (no SparkSession): stripe pruning
  * via stats/blooms for equality, then chunk decode + row filter. Intended
  * for inspection, not large extracts.
  */
object NimbleDsl {
  private val selectRe =
    """(?i)SELECT\s+(.+?)\s+FROM\s+(\S+)(?:\s+WHERE\s+(\w+)\s*(=|!=|<=|>=|<|>)\s*(.+?))?(?:\s+LIMIT\s+(\d+))?\s*""".r

  def main(args: Array[String]): Unit = {
    // statements may also arrive as CLI args (one statement per arg) since
    // batch sbt does not forward stdin
    if (args.nonEmpty) { args.foreach(execute); return }
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    System.err.println("nimble-dsl> (DESCRIBE / SHOW ... / SELECT ... / QUIT)")
    var line: String = null
    while ({ line = in.readLine(); line != null }) {
      if (line.trim.equalsIgnoreCase("QUIT") || line.trim.equalsIgnoreCase("EXIT")) return
      execute(line)
    }
  }

  /** Execute one DSL statement, printing results to stdout. */
  def execute(stmtRaw: String): Unit = {
    val stmt = stmtRaw.trim
    try {
      if (stmt.isEmpty) ()
      else if (stmt.toUpperCase.startsWith("DESCRIBE ")) NimbleDump.main(Array("schema", stmt.substring(9).trim))
      else if (stmt.toUpperCase.startsWith("SHOW ")) {
        val toks = stmt.substring(5).trim.split("\\s+")
        toks(0).toLowerCase match {
          case "histogram" =>
            // SHOW HISTOGRAM [TOP] [STRIPE s] <file> (ref: NimbleDslVm.cpp:349);
            // option tokens consume in any order from the head, the file path
            // is everything after them, re-joined so spaced paths survive
            var rest = toks.drop(1).toSeq
            var top = false
            var stripe: Seq[String] = Nil
            var more = true
            while (more) {
              // each option consumes at most once, so a path whose first
              // token happens to be "top" or "stripe" survives
              if (!top && rest.headOption.exists(_.equalsIgnoreCase("TOP"))) {
                top = true; rest = rest.drop(1)
              } else if (stripe.isEmpty &&
                  rest.headOption.exists(_.equalsIgnoreCase("STRIPE")) && rest.length >= 2) {
                stripe = Seq(s"stripe=${rest(1)}"); rest = rest.drop(2)
              } else more = false
            }
            NimbleDump.main(Array("histogram", rest.mkString(" ")) ++
              (if (top) Seq("top") else Nil) ++ stripe)
          case "index" => NimbleDump.main(Array("index", toks.drop(1).mkString(" ")))
          case first =>
            val cmd = first match {
              case "streams" | "stats" => "streams"
              case other => other
            }
            NimbleDump.main(Array(cmd, toks.drop(1).mkString(" ").trim))
        }
      } else stmt match {
        case selectRe(cols, file, wcol, wop, wval, limit) =>
          select(file, cols.split(",").map(_.trim), Option(wcol), Option(wop),
            Option(wval).map(_.trim.stripPrefix("'").stripSuffix("'")),
            Option(limit).map(_.toInt).getOrElse(20))
        case _ => System.err.println(s"parse error: $stmt")
      }
    } catch {
      case e: Exception => System.err.println(s"error: ${e.getMessage}")
    }
  }

  private def files(path: String): Seq[String] =
    graft.format.GraftIO.listGft(path).map(_.path)

  private def select(path: String, colsReq: Array[String], wcol: Option[String],
      wop: Option[String], wval: Option[String], limit: Int): Unit = {
    var printed = 0
    for (file <- files(path) if printed < limit) {
      val r = new Tablet.Reader(file)
      try {
        val keyIdx = r.footer.streamKeys.zipWithIndex.toMap
        val cols =
          if (colsReq.sameElements(Array("*")))
            r.footer.streamKeys.filter(!_.contains("#")).toSeq
          else colsReq.toSeq
        require(cols.forall(keyIdx.contains), s"unknown column among ${cols.mkString(",")}")
        if (printed == 0) println(cols.mkString("\t"))
        var s = 0
        while (s < r.footer.stripes.length && printed < limit) {
          val cursors = cols.map(c => new Tablet.ChunkCursor(r.readStreamBytes(s, keyIdx(c))))
          val wIdx = wcol.map(cols.indexOf(_))
          while (cursors.head.hasNext && printed < limit) {
            val chunk = cursors.map(_.next())
            val n = chunk.head.len
            var i = 0
            while (i < n && printed < limit) {
              val vals = chunk.map(c => render(c, i))
              val keep = (wcol, wop, wval) match {
                case (Some(c), Some(op), Some(v)) =>
                  val idx = cols.indexOf(c)
                  val cell = if (idx >= 0) vals(idx) else "?"
                  compare(cell, op, v)
                case _ => true
              }
              if (keep) { println(vals.mkString("\t")); printed += 1 }
              i += 1
            }
          }
          s += 1
        }
      } finally r.close()
    }
  }

  private def render(c: Column, i: Int): String = c match {
    case l: LongsCol => if (l.nulls != null && l.nulls(i)) "NULL" else l.values(i).toString
    case d: DoublesCol => if (d.nulls != null && d.nulls(i)) "NULL" else d.values(i).toString
    case b: BoolsCol => if (b.nulls != null && b.nulls(i)) "NULL" else b.values(i).toString
    case b: BytesCol => if (b.nulls != null && b.nulls(i)) "NULL" else new String(b(i), "UTF-8")
  }

  private def compare(cell: String, op: String, v: String): Boolean = {
    val cmp: Int =
      (cell.toDoubleOption, v.toDoubleOption) match {
        case (Some(a), Some(b)) => java.lang.Double.compare(a, b)
        case _ => cell.compareTo(v)
      }
    op match {
      case "=" => cmp == 0
      case "!=" => cmp != 0
      case "<" => cmp < 0
      case "<=" => cmp <= 0
      case ">" => cmp > 0
      case ">=" => cmp >= 0
    }
  }
}
