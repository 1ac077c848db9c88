package graft.tools

import graft.format._

/** Inspection CLI — the `nimble_dump` / NimbleDSL equivalent (reference:
  * dwio/nimble/tools/NimbleDumpLib.h:25,37-58, tools/NimbleDslVm.h:28-46,
  * docs/NimbleDSL.md:22-135).
  *
  * Usage: NimbleDump <cmd> <file-or-dir> [args]
  *   info     — row counts, stripe count, sizes, version
  *   schema   — the Spark schema (DESCRIBE)
  *   stripes  — per-stripe rows/offsets/bytes (SHOW STRIPES)
  *   streams  — per-stream encoded bytes + stats (SHOW STREAMS / SHOW STATS)
  *   encoding — codec tree histogram over all chunks (SHOW ENCODING)
  *   layout   — file layout walk (SHOW FILE LAYOUT)
  *   content  — first N rows of each leaf stream (SELECT ... LIMIT)
  */
object NimbleDump {
  private def files(path: String): Seq[String] =
    graft.format.GraftIO.listGft(path).map(_.path)

  /** Raw index streams (#idx:/#sidx:/#cidx:) are written as int count +
    * fixed-width payload, NOT chunk-framed — parsing them with ChunkCursor
    * misreports byte attribution or throws. The encoding/histogram walks
    * must skip them (SHOW INDEX reports them separately). */
  private def isRawIndexStream(k: String): Boolean =
    k.startsWith("#idx:") || k.startsWith("#sidx:") || k.startsWith("#cidx:")

  private def codecName(id: Byte): String = id match {
    case Codecs.TRIVIAL => "Trivial"
    case Codecs.RLE => "RLE"
    case Codecs.DICT => "Dictionary"
    case Codecs.FBW => "FixedBitWidth"
    case Codecs.NULLABLE => "Nullable"
    case Codecs.SPARSEBOOL => "SparseBool"
    case Codecs.VARINT => "Varint"
    case Codecs.DELTA => "Delta"
    case Codecs.CONST => "Constant"
    case Codecs.MAINLYCONST => "MainlyConstant"
    case Codecs.PREFIX => "Prefix"
    case Codecs.PREFIXR => "PrefixRestart"
    case Codecs.ALP => "ALP"
    case Codecs.PFOR => "PFOR"
    case Codecs.SIMDFOR => "SimdForBitpack"
    case Codecs.BLOCKBP => "BlockBitPacking"
    case Codecs.SUBINT => "SubIntSplit"
    case Codecs.FREQPART => "FrequencyPartition"
    case Codecs.FOR => "FOR"
    case Codecs.FSST => "FSST"
    case Codecs.HUFFMAN => "Huffman"
    case Codecs.DELTABLOCK => "DeltaBlock"
    case Codecs.SHAREDDICT => "SharedDictionary"
    case Codecs.SENTINEL => "Sentinel"
    case other => s"codec#$other"
  }

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("info")
    val path = args.lift(1).getOrElse {
      System.err.println("usage: NimbleDump <info|schema|stripes|streams|ndv|encoding|encodingtree|" +
        "histogram|index|chunkstats|chunkdir|sizes|layout|content|verify> <file> [top] [stripe=N]")
      sys.exit(2)
    }
    for (f <- files(path)) {
      val r = new Tablet.Reader(f)
      val ft = r.footer
      println(s"== $f")
      cmd match {
        case "info" =>
          println(s"  version=${ft.version} rows=${ft.rowCount} stripes=${ft.stripes.length} " +
            s"streams=${ft.streamKeys.length} bytes=${graft.format.GraftIO.status(f).length} " +
            s"sortColumns=${ft.sortColumns.mkString(",")}")
        case "schema" =>
          println(org.apache.spark.sql.types.DataType.fromJson(ft.schemaJson)
            .asInstanceOf[org.apache.spark.sql.types.StructType].treeString)
        case "stripes" =>
          for ((s, i) <- ft.stripes.zipWithIndex)
            println(f"  stripe $i%3d offset=${s.offset}%10d bytes=${s.length}%10d rows=${s.rowCount}%8d")
        case "streams" =>
          for ((k, i) <- ft.streamKeys.zipWithIndex) {
            val bytes = ft.stripes.indices.map(s => r.streamLoc(s, i).length).sum
            val st = ft.fileStats(i)
            val mm =
              if (!st.hasMinMax) ""
              else st.kind match {
                case PhysType.F32 | PhysType.F64 => s" min=${st.minDouble} max=${st.maxDouble}"
                case PhysType.Bytes =>
                  s" min=${new String(st.minBytes, "UTF-8").take(20)} max=${new String(st.maxBytes, "UTF-8").take(20)}"
                case _ => s" min=${st.minLong} max=${st.maxLong}"
              }
            println(f"  $k%-28s bytes=$bytes%10d values=${st.valueCount}%8d nulls=${st.nullCount}%6d$mm")
          }
        case "ndv" =>
          if (ft.ndvSketches.isEmpty) println("  (no NDV sketches: pre-v10 file)")
          else for ((k, regs) <- ft.ndvSketches.toSeq.sortBy(_._1))
            println(f"  $k%-28s ndv~${graft.format.Hll.estimate(regs)}%d")
        case "encoding" =>
          val hist = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
          for (s <- ft.stripes.indices; i <- ft.streamKeys.indices
               if !isRawIndexStream(ft.streamKeys(i))) {
            val cur = new Tablet.ChunkCursor(r.readStreamBytes(s, i))
            while (cur.hasNext) { hist(codecName(cur.peekCodec())) += 1; cur.skip() }
          }
          hist.toSeq.sortBy(-_._2).foreach { case (c, n) => println(f"  $c%-16s $n%6d chunks") }
        case "encodingtree" =>
          // nested encoding view of each stream's first chunk (reference:
          // dwio/nimble/encodings/views/EncodingView.h) — ZERO-COPY: the
          // tree comes from the header-only walker, no values materialize
          // (ViewDriftSpec pins its equality with the decoder's traversal)
          def show(n: Codecs.ViewNode, indent: String): Unit = {
            println(f"$indent${codecName(n.id)}%-18s phys=${n.phys} rows=${n.rows}")
            n.children.foreach(show(_, indent + "  "))
          }
          if (ft.stripes.isEmpty) println("  (no stripes)")
          else for ((k, i) <- ft.streamKeys.zipWithIndex if !k.startsWith("#")) {
            val cur = new Tablet.ChunkCursor(r.readStreamBytes(0, i))
            if (cur.hasNext) {
              println(s"  $k")
              show(cur.viewNext(), "    ")
            }
          }
        case "histogram" =>
          // encoding-type distribution with instance counts and storage
          // percentage (reference: NimbleDslVm.cpp SHOW HISTOGRAM [TOP]
          // [STRIPE s]); full trees come from the zero-copy header walker
          // (no value decode either way), TOP counts only chunk roots
          val topOnly = args.drop(2).exists(_.equalsIgnoreCase("top"))
          val stripeSel = args.drop(2).flatMap(a =>
            "(?i)stripe=(\\d+)".r.findFirstMatchIn(a).map(_.group(1).toInt)).headOption
          val instances = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
          val bytes = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
          var total = 0L
          for (s <- ft.stripes.indices if stripeSel.forall(_ == s); i <- ft.streamKeys.indices
               if !isRawIndexStream(ft.streamKeys(i))) {
            val cur = new Tablet.ChunkCursor(r.readStreamBytes(s, i))
            while (cur.hasNext) {
              val p0 = cur.bytePos
              if (topOnly) {
                val root = codecName(cur.peekCodec())
                cur.skip()
                instances(root) += 1
                bytes(root) += cur.bytePos - p0
              } else {
                val tree = cur.viewNext()
                def walk(n: Codecs.ViewNode): Unit = {
                  instances(codecName(n.id)) += 1; n.children.foreach(walk)
                }
                walk(tree)
                // storage attributes to the chunk's root encoding
                bytes(codecName(tree.id)) += cur.bytePos - p0
              }
              total += cur.bytePos - p0
            }
          }
          for ((c, n) <- instances.toSeq.sortBy(t => (-bytes(t._1), -t._2))) {
            val pct = if (total == 0) 0.0 else bytes(c) * 100.0 / total
            println(f"  $c%-18s instances=$n%7d bytes=${bytes(c)}%10d ($pct%5.1f%%)")
          }
        case "index" =>
          // index inventory (reference: NimbleDslVm.cpp SHOW INDEX): index
          // columns, sort orders, key stream regions and entry counts
          println(s"  sortColumns=${if (ft.sortColumns.isEmpty) "(none)" else ft.sortColumns.mkString(",")}")
          val idxStreams = ft.streamKeys.zipWithIndex.filter { case (k, _) =>
            k.startsWith("#idx:") || k.startsWith("#sidx:") || k.startsWith("#cidx:") }
          if (idxStreams.isEmpty) println("  (no index streams)")
          for ((k, i) <- idxStreams) {
            val kind = if (k.startsWith("#idx:")) "hash" else if (k.startsWith("#sidx:")) "sorted" else "composite"
            println(s"  $k ($kind)")
            for (s <- ft.stripes.indices) {
              val loc = r.streamLoc(s, i)
              if (loc.length > 0) {
                val entries = new graft.format.ByteCursor(r.readStreamBytes(s, i)).readInt()
                println(f"    stripe $s%3d region=[${loc.offset}%d, +${loc.length}%d) entries=$entries%d")
              }
            }
          }
          val bloomCols = ft.streamKeys.zipWithIndex.collect {
            case (k, i) if !k.startsWith("#") &&
              ft.stripes.indices.exists(s => r.streamBloom(s, i).isDefined) => k
          }
          println(s"  bloomColumns=${if (bloomCols.isEmpty) "(none)" else bloomCols.mkString(",")}")
        case "chunkdir" =>
          // v13/v14 chunk DIRECTORY of one stream (arg 3) or the first:
          // frame byte offsets, row counts and the v14 per-chunk min/max —
          // everything the sparse fetch prunes on, read from the FOOTER
          // alone (no stream bytes fetched; contrast `chunkstats`, which
          // walks the frames)
          val wantDir = args.lift(2)
          for ((k, i) <- ft.streamKeys.zipWithIndex if !isRawIndexStream(k)
               if wantDir.map(_ == k).getOrElse(i == 0)) {
            println(s"  stream $k")
            for (s <- ft.stripes.indices) {
              val dir = r.chunkDirOf(s, i)
              if (dir == null) println(f"    stripe $s%3d (no directory — pre-v13 or capped)")
              else for ((cl, c) <- dir.zipWithIndex) {
                val mm = Option(cl.stats) match {
                  case Some(st) if st.hasMinMax => st.kind match {
                    case PhysType.F32 | PhysType.F64 => s"min=${st.minDouble} max=${st.maxDouble}"
                    case PhysType.Bytes =>
                      s"min=${new String(st.minBytes, "UTF-8").take(16)} max=${new String(st.maxBytes, "UTF-8").take(16)}"
                    case _ => s"min=${st.minLong} max=${st.maxLong}"
                  }
                  case Some(_) => "(no minmax)"
                  case None => "(no stats)"
                }
                val kind = if (cl.isData) "data" else "alpha"
                println(f"    stripe $s%3d frame $c%4d @${cl.offset}%8d rows=${cl.rows}%6d $kind%-5s $mm")
              }
            }
          }
        case "chunkstats" =>
          // per-chunk min/max/nulls of one stream (arg 3) or the first stream
          val want = args.lift(2)
          // named stream only, or the FIRST stream when none named (the
          // `forall || isEmpty` guard this replaced was vacuously true for
          // every stream with no arg — it dumped the whole table)
          for ((k, i) <- ft.streamKeys.zipWithIndex if !isRawIndexStream(k)
               if want.map(_ == k).getOrElse(i == 0)) {
            println(s"  stream $k")
            for (s <- ft.stripes.indices) {
              val cur = new Tablet.ChunkCursor(r.readStreamBytes(s, i))
              var c = 0
              while (cur.hasNext) {
                val mm = cur.peekStats() match {
                  case Some(st) if st.hasMinMax => st.kind match {
                    case PhysType.F32 | PhysType.F64 => s"min=${st.minDouble} max=${st.maxDouble}"
                    case PhysType.Bytes =>
                      s"min=${new String(st.minBytes, "UTF-8").take(16)} max=${new String(st.maxBytes, "UTF-8").take(16)}"
                    case _ => s"min=${st.minLong} max=${st.maxLong}"
                  }
                  case Some(_) => "(no minmax)"
                  case None => "(no stats)"
                }
                val nulls = cur.peekStats().map(_.nullCount).getOrElse(-1L)
                println(f"    stripe $s%3d chunk $c%4d nulls=$nulls%6d $mm")
                cur.skip(); c += 1
              }
            }
          }
        case "sizes" =>
          // metadata-vs-data A/B (r15 VERDICT #4): stripe payload bytes vs
          // everything else (stream directory + chunk-dir stats + file stats
          // + NDV blocks + schema + postscript), with the NDV block called
          // out — the per-file fixed costs that small files pay as whole
          // ratio percents and cluster-scale files amortize to ~0
          val total = graft.format.GraftIO.status(f).length
          val data = ft.stripes.map(_.length).sum
          val ndv = ft.ndvSketches.iterator
            .map { case (k, regs) => k.getBytes("UTF-8").length + 2 + regs.length }.sum
          // how much a compressed NDV block would save (registers are
          // low-entropy rank bytes) — the gate-or-document decision input
          val ndvZ = ft.ndvSketches.iterator.map { case (_, regs) =>
            com.github.luben.zstd.Zstd.compress(regs, 3).length }.sum
          println(f"  total=$total data=$data meta=${total - data} ndv=$ndv ndv_zstd=$ndvZ " +
            f"meta_frac=${(total - data).toDouble / total}%.5f")
        case "layout" =>
          println(s"  [magic 4B][stripe data ...][footer][postscript 8B][magic]")
          for ((s, i) <- ft.stripes.zipWithIndex)
            println(s"  stripe $i @ ${s.offset} (+${s.length})")
          println(s"  footer @ ${ft.stripes.lastOption.map(s => s.offset + s.length).getOrElse(4L)}")
        case "content" =>
          val n = args.lift(2).map(_.toInt).getOrElse(10)
          for ((k, i) <- ft.streamKeys.zipWithIndex if !isRawIndexStream(k)) {
            val cur = new Tablet.ChunkCursor(r.readStreamBytes(0, i))
            if (cur.hasNext) {
              val col = cur.next()
              val vals = col match {
                case c: LongsCol => c.values.take(n).mkString(",")
                case c: DoublesCol => c.values.take(n).mkString(",")
                case c: BoolsCol => c.values.take(n).mkString(",")
                case c: BytesCol => (0 until math.min(n, c.len)).map(j => new String(c(j), "UTF-8").take(16)).mkString(",")
              }
              println(s"  $k: $vals")
            }
          }
        case "verify" =>
          // whole-stripe checksum verification, algorithm keyed by file
          // version: XXH3_64 for v11+ (reference: common/Types.h:204),
          // XXH64 for older files
          val raf = new java.io.RandomAccessFile(f, "r")
          for ((s, i) <- ft.stripes.zipWithIndex) {
            val h = if (ft.version >= 12) {
              // stream-by-stream: bounded buffers even for multi-GB stripes
              val hashes = scala.collection.mutable.ArrayBuffer[Long]()
              for (k <- ft.streamKeys.indices) {
                val loc = r.streamLoc(i, k)
                if (loc.length > 0) {
                  val sb = new Array[Byte](loc.length.toInt) // streams are Array-backed: < 2GB each
                  raf.seek(loc.offset); raf.readFully(sb)
                  hashes += Tablet.xxh3(sb, 0, sb.length)
                }
              }
              Tablet.combineStreamHashes(hashes.toArray)
            } else {
              val b = new Array[Byte](s.length.toInt)
              raf.seek(s.offset)
              raf.readFully(b)
              Tablet.stripeChecksumOf(ft.version, b, Array.empty)
            }
            val ok = h == s.checksum
            println(f"  stripe $i%3d checksum ${if (ok) "OK" else s"MISMATCH ($h != ${s.checksum})"}")
            if (!ok) sys.exit(1)
          }
          raf.close()
        case other => System.err.println(s"unknown command $other")
      }
      r.close()
    }
  }
}
