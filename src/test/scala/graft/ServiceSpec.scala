package graft

import graft.service.{QueryService, QueryStatus, ResultCursor}
import org.scalatest.funsuite.AnyFunSuite

class ServiceSpec extends AnyFunSuite with SparkFixture {

  private lazy val root = java.nio.file.Files.createTempDirectory("graft_svc").toString
  private lazy val svc = new QueryService(spark, root)

  test("query lifecycle: submit, complete, read back") {
    val id = svc.runQuery(
      s"select r_regionkey, r_name from read_files('$sfDir/region.parquet')")
    assert(svc.awaitComplete(id) == QueryStatus.Complete)
    val r = svc.reader(id)
    assert(r.totalRows == 5)
    assert(r.asDataFrame.columns.toSeq == Seq("r_regionkey", "r_name"))
  }

  test("error status carries the failure message") {
    val id = svc.runQuery("select * from read_files('/no/such/path.parquet')")
    svc.awaitComplete(id) match {
      case QueryStatus.Error(msg) => assert(msg.contains("PATH_NOT_FOUND"))
      case other => fail(s"expected Error, got $other")
    }
  }

  test("forward pagination walks all rows exactly once") {
    val id = svc.runQuery(
      s"select l_orderkey, l_linenumber from read_files('$sfDir/lineitem.parquet') where l_orderkey < 20")
    assert(svc.awaitComplete(id) == QueryStatus.Complete)
    val r = svc.reader(id)
    val total = r.totalRows
    var cursor = Option(ResultCursor(0, 0))
    var seen = 0L
    var pages = 0
    while (cursor.isDefined) {
      val page = r.read(cursor.get, 7)
      seen += page.rows.size
      cursor = page.next
      pages += 1
      assert(pages < 1000)
    }
    assert(seen == total)
  }

  test("backward read returns the rows ending at the cursor") {
    val id = svc.runQuery(
      s"select r_regionkey from read_files('$sfDir/region.parquet')")
    svc.awaitComplete(id)
    val r = svc.reader(id)
    val fwd = r.read(ResultCursor(0, 0), 5).rows.map(_.getInt(0))
    val back = r.read(ResultCursor(0, 3), 2, forward = false).rows.map(_.getInt(0))
    assert(back == fwd.slice(1, 3))
  }

  test("allowOverflow=false rejects a page crossing the end") {
    val id = svc.runQuery(
      s"select r_regionkey from read_files('$sfDir/region.parquet')")
    svc.awaitComplete(id)
    val r = svc.reader(id)
    intercept[IllegalArgumentException] {
      r.read(ResultCursor(0, 3), 10, forward = true, allowOverflow = false)
    }
  }

  test("runScript executes statements in order with independent statuses") {
    val ids = svc.runScript(
      s"""select 1 as one from read_files('$sfDir/region.parquet');
         |select * from read_files('/missing.parquet');
         |select 2 as two from read_files('$sfDir/nation.parquet')""".stripMargin)
    assert(ids.size == 3)
    assert(svc.awaitComplete(ids(0)) == QueryStatus.Complete)
    assert(svc.awaitComplete(ids(1)).isInstanceOf[QueryStatus.Error])
    assert(svc.awaitComplete(ids(2)) == QueryStatus.Complete)
  }
}
