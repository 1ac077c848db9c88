package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** Golden binary fixtures: small `.gft` files written by the ACTUAL v5/v6/v7
  * writers (built from git history at d367b0a / d5d7c67 / 758dbb6 via
  * `graft.tools.GoldenGen` in a worktree — see the generator comment there)
  * and checked in under `src/test/resources/golden/`. Unlike LegacyFooterSpec,
  * which synthesizes old footers from current-format stripe bytes, these
  * files freeze the era's CODEC wire bytes too: any incompatible drift in a
  * decoder (reference keeps old files readable —
  * dwio/nimble/tablet/TabletReader.cpp version gates) fails here.
  *
  * Generator data (deterministic, g = global row index 0..2399; 3 stripes ×
  * 2 chunks × 400 rows; sortColumns=[id], bloomColumns=[id,cat]; v6/v7 also
  * indexColumns=[id]):
  *   id = g; run = g/100; cat = "cat_"+(g%7);
  *   txt = "https://example.com/path/"+(g%97)+"/res"; num = g*0.25;
  *   nul = null if g%11==0 else g*3; cst = 42; big = g*0x9E3779B97F4A7C15L
  */
class GoldenFixtureSpec extends AnyFunSuite {

  private val N = 2400

  private def golden(name: String): String = {
    val url = getClass.getResource(s"/golden/$name")
    assert(url != null, s"missing test resource golden/$name")
    new java.io.File(url.toURI).getAbsolutePath
  }

  private def expected(col: String, g: Long): Any = col match {
    case "id" => g
    case "run" => g / 100
    case "cat" => "cat_" + (g % 7)
    case "txt" => "https://example.com/path/" + (g % 97) + "/res"
    case "num" => g * 0.25
    case "nul" => if (g % 11 == 0) null else g * 3
    case "cst" => 42L
    case "big" => g * 0x9E3779B97F4A7C15L
  }

  private def expand(c: Column): IndexedSeq[Any] = c match {
    case l: LongsCol =>
      (0 until l.len).map(i => if (l.nulls != null && l.nulls(i)) null else l.values(i))
    case d: DoublesCol =>
      (0 until d.len).map(i => if (d.nulls != null && d.nulls(i)) null else d.values(i))
    case b: BoolsCol =>
      (0 until b.len).map(i => if (b.nulls != null && b.nulls(i)) null else b.values(i))
    case b: BytesCol =>
      (0 until b.len).map(i => if (b.nulls != null && b.nulls(i)) null else new String(b(i), "UTF-8"))
    case d: DictBytesCol => expand(d.expand)
    case l: LazyFsstBytesCol => expand(l.expand)
    case other => fail(s"unexpected column type ${other.getClass}")
  }

  private def columnValues(r: Tablet.Reader, col: String): IndexedSeq[Any] = {
    val id = r.footer.streamKeys.indexOf(col)
    assert(id >= 0, s"stream $col missing")
    r.footer.stripes.indices.flatMap { s =>
      val cur = new Tablet.ChunkCursor(r.readStreamBytes(s, id))
      val buf = scala.collection.mutable.ArrayBuffer[Any]()
      while (cur.hasNext) buf ++= expand(cur.next())
      buf
    }
  }

  private def checkFile(name: String, version: Int): Unit = {
    val r = new Tablet.Reader(golden(name))
    try {
      assert(r.footer.version == version)
      assert(r.footer.rowCount == N)
      assert(r.footer.sortColumns == Seq("id"))
      assert(r.footer.stripes.length == 3)
      assert(r.footer.stripes.map(_.rowCount).toSeq == Seq(800L, 800L, 800L))
      for (col <- Seq("id", "run", "cat", "txt", "num", "nul", "cst", "big")) {
        val got = columnValues(r, col)
        assert(got.length == N, s"$col length")
        var g = 0
        while (g < N) {
          val want = expected(col, g.toLong)
          assert(got(g) == want, s"$name $col row $g: got ${got(g)}, want $want")
          g += 1
        }
      }
      // blooms survive: a present id probes true in its own stripe
      val idId = r.footer.streamKeys.indexOf("id")
      val bl = r.streamBloom(1, idId)
      assert(bl.isDefined && bl.get.mightContain(Tablet.hashLongValue(900L)))
    } finally r.close()
  }

  test("golden v5 file (round-5 writer bytes) reads with current decoders") {
    checkFile("golden_v5.gft", 5)
  }

  test("golden v6 file (shared-dict era bytes) reads with current decoders") {
    checkFile("golden_v6.gft", 6)
  }

  test("golden v7 file (grouped-directory era bytes) reads with current decoders") {
    checkFile("golden_v7.gft", 7)
  }

  test("point lookup: hash index probes on v6/v7 golden files, scan fallback on v5") {
    // rowsDecoded counts per-column decodes, so compare like-for-like: the
    // indexed eras must decode strictly less than the v5 scan fallback
    var scanCost = 0L
    for ((name, indexed) <- Seq(("golden_v5.gft", false), ("golden_v6.gft", true),
        ("golden_v7.gft", true))) {
      val (rows, m) = Lookup.pointLookupMetered(golden(name), "id", 1234L)
      assert(rows.length == 1, name)
      val row = rows.head
      assert(row("id") == 1234L && row("cat") == expected("cat", 1234) &&
        row("txt") == expected("txt", 1234) && row("big") == expected("big", 1234), name)
      if (indexed) {
        assert(m.indexProbes > 0, s"$name: hash index not probed")
        assert(m.rowsDecoded < scanCost, s"$name: index did not cut decode vs v5 scan")
      } else { assert(m.indexProbes == 0, name); scanCost = m.rowsDecoded }
    }
  }

  test("range lookup scan-falls-back on pre-v8 files (no sorted index stream)") {
    for (name <- Seq("golden_v5.gft", "golden_v6.gft", "golden_v7.gft")) {
      val (rows, m) = Lookup.rangeLookupMetered(golden(name), "id", 100L, 199L)
      assert(rows.length == 100, name)
      assert(rows.map(_("id").asInstanceOf[Long]).sorted == (100L to 199L).toSeq, name)
      assert(m.indexProbes == 0, s"$name: pre-v8 file cannot have a sorted index")
      // sort-key stats prune to the one covering stripe
      assert(m.stripesProbed == 1, name)
    }
  }
}
