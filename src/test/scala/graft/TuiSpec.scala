package graft

import graft.service.{QueryService, QueryStatus}
import graft.tui.{Key, TuiApp}
import org.scalatest.funsuite.AnyFunSuite

/** Drives the interactive client's full state machine headlessly —
  * the key semantics mirrored from the reference's ratatui client
  * (client_tui.rs:505-523: q/e/Up/Down/Tab; 832-880: wrap-around
  * selection; 525-617: bidirectional data paging). */
class TuiSpec extends AnyFunSuite with SparkFixture {

  private lazy val root = java.nio.file.Files.createTempDirectory("graft_tui").toString
  private lazy val svc = new QueryService(spark, root)

  private def app(): TuiApp = {
    val statements = Seq(
      s"select r_regionkey, r_name from read_files('$sfDir/region.parquet') order by r_regionkey",
      s"select n_nationkey from read_files('$sfDir/nation.parquet') order by n_nationkey",
      "select * from read_files('/no/such/path.parquet')")
    val ids = statements.map(svc.runQuery)
    ids.foreach(svc.awaitComplete(_))
    new TuiApp(svc, statements, ids, pageSize = 3)
  }

  test("query pane selection wraps at both ends") {
    val a = app()
    assert(a.selected == 0)
    a.onKey(Key.Up)
    assert(a.selected == 2) // wrap to last, as the reference's previous_row
    a.onKey(Key.Down)
    assert(a.selected == 0) // wrap back to first
    a.onKey(Key.Down); a.onKey(Key.Down); a.onKey(Key.Down)
    assert(a.selected == 0)
  }

  test("status icons reflect per-query outcomes; e toggles error text") {
    val a = app()
    val frame = a.render()
    assert(frame.contains("[OK ]"))
    assert(frame.contains("[ERR]"))
    // admission snapshot in the header (all terminal here: 0/0 of 8)
    assert(frame.contains("0 queued/0 running of 8 slots"), frame)
    assert(!frame.contains("PATH_NOT_FOUND"))
    a.onKey(Key.Char('e'))
    assert(a.render().contains("PATH_NOT_FOUND"))
    a.onKey(Key.Char('e'))
    assert(!a.render().contains("PATH_NOT_FOUND"))
  }

  test("data pane pages forward and backward with boundary no-ops") {
    val a = app()
    a.onKey(Key.Tab) // into the data pane
    val (s0, rows0, cols, total) = a.window(0).get
    assert(s0 == 0 && total == 5 && cols == Seq("r_regionkey", "r_name"))
    assert(rows0.map(_.getInt(0)) == Seq(0, 1, 2))

    a.onKey(Key.Down) // forward: rows 3..4
    val (s1, rows1, _, _) = a.window(0).get
    assert(s1 == 3 && rows1.map(_.getInt(0)) == Seq(3, 4))

    a.onKey(Key.Down) // at the end: no-op
    assert(a.window(0).get._1 == 3)

    a.onKey(Key.Up) // backward: rows ending at 3 → 0..2
    val (s2, rows2, _, _) = a.window(0).get
    assert(s2 == 0 && rows2.map(_.getInt(0)) == Seq(0, 1, 2))

    a.onKey(Key.Up) // at the start: no-op
    assert(a.window(0).get._1 == 0)
  }

  test("render shows the visible row range and column headers") {
    val a = app()
    val frame = a.render()
    assert(frame.contains("rows 1-3 of 5"))
    assert(frame.contains("r_regionkey | r_name"))
    assert(frame.contains("AFRICA"))
    a.onKey(Key.Tab)
    a.onKey(Key.Down)
    assert(a.render().contains("rows 4-5 of 5"))
  }

  test("tab switches the active pane marker; q exits") {
    val a = app()
    assert(a.render().linesIterator.next().startsWith("*"))
    a.onKey(Key.Tab)
    assert(a.render().linesIterator.find(_.contains("Data:")).get.startsWith("*"))
    a.onKey(Key.Char('q'))
    assert(a.exited)
  }

  test("errored query renders an empty data pane, not a crash") {
    val a = app()
    a.selected = 2
    assert(a.window(2).isEmpty)
    assert(a.render().contains("(no result yet)"))
  }

  test("m toggles the selected query's runtime metrics line") {
    val a = app()
    assert(!a.render().contains("metrics:"))
    a.onKey(Key.Char('m'))
    // listener bus is async — poll until the scan rows land
    val deadline = System.currentTimeMillis() + 10000
    var frame = a.render()
    while (!frame.contains("scan") && System.currentTimeMillis() < deadline) {
      Thread.sleep(25); frame = a.render()
    }
    assert(frame.contains("metrics: scan"), frame)
    assert(frame.contains("shuffle r/w"), frame)
    a.onKey(Key.Char('m'))
    assert(!a.render().contains("metrics:"))
  }

  test("decodeChunk carries a split CSI sequence across read boundaries") {
    val esc = 0x1b.toByte
    // chunk ends mid-sequence: ESC alone, then '[A' in the next read
    val (k1, rest1) = Key.decodeChunk(Array('q'.toByte, esc))
    assert(k1 == Seq(Key.Char('q')) && rest1.toSeq == Seq(esc))
    val (k2, rest2) = Key.decodeChunk(rest1 ++ "[A".getBytes)
    assert(k2 == Seq(Key.Up) && rest2.isEmpty)
    // ESC [ split after the bracket
    val (k3, rest3) = Key.decodeChunk(Array(esc, '['.toByte))
    assert(k3.isEmpty && rest3.length == 2)
    val (k4, rest4) = Key.decodeChunk(rest3 :+ 'B'.toByte)
    assert(k4 == Seq(Key.Down) && rest4.isEmpty)
  }

  test("empty statement list renders and ignores navigation keys") {
    val a = new TuiApp(svc, Nil, Nil, pageSize = 3)
    assert(a.render().contains("(no result yet)"))
    a.onKey(Key.Up); a.onKey(Key.Down); a.onKey(Key.Tab)
    assert(a.selected == 0 && !a.exited)
    a.onKey(Key.Char('q'))
    assert(a.exited)
  }

  test("key decoding: CSI arrows, tab, chars; newlines ignored") {
    assert(Key.decode("\u001b[A\u001b[B\tq\r\n".getBytes) ==
      Seq(Key.Up, Key.Down, Key.Tab, Key.Char('q')))
    assert(Key.decode("jk".getBytes) == Seq(Key.Down, Key.Up))
  }
}
