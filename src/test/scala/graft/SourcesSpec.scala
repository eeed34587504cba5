package graft

import graft.sources.{Connections, ReadFiles, ScriptRunner}
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite with SparkFixture {

  // Semantics pinned by the reference's sqlparser behavior test
  // (/root/reference/src/planner/test_sqlparser_behavior.rs:7-27).
  test("script splitting: statements, comments, quoted semicolons") {
    val script =
      """-- leading comment
        |select 1;
        |select 'a;b' as s; -- trailing comment
        |
        |select 2""".stripMargin
    val stmts = ScriptRunner.split(script)
    assert(stmts.size == 3)
    assert(stmts(1).contains("'a;b'"))
  }

  test("script splitting: '' escape inside string literal") {
    val stmts = ScriptRunner.split("select 'it''s; fine'; select 2")
    assert(stmts.size == 2)
    assert(stmts.head.contains("it''s; fine"))
  }

  test("read_files parquet rewrite answers the reference's simple query shape") {
    val df = ReadFiles.sql(spark,
      s"select l_orderkey, l_quantity from read_files('$sfDir/lineitem.parquet') where l_orderkey < 3")
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("l_orderkey", "l_quantity"))
  }

  test("read_files with named connection resolves relative paths") {
    val conns = Connections(Map("default" -> "", "test_fs" -> sfDir))
    val df = ReadFiles.sql(spark,
      "select count(*) as n from read_files('region.parquet', connection=>'test_fs')", conns)
    assert(df.collect()(0).getLong(0) == 5)
  }

  test("read_files csv and json formats") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val docs = Engine.table(spark, sfDir, "documents").select("doc_id", "lang", "n_chars").limit(50)
    docs.write.mode("overwrite").option("header", "true").csv(s"$tmp/docs_csv")
    docs.write.mode("overwrite").json(s"$tmp/docs_json")
    val fromCsv = ReadFiles.sql(spark,
      s"select count(*) as n from read_files('$tmp/docs_csv', format=>'csv')")
    val fromJson = ReadFiles.sql(spark,
      s"select count(*) as n from read_files('$tmp/docs_json', format=>'json')")
    assert(fromCsv.collect()(0).getLong(0) == 50)
    assert(fromJson.collect()(0).getLong(0) == 50)
  }

  test("multiple read_files calls in one statement") {
    val df = ReadFiles.sql(spark,
      s"""select c.c_custkey, n.n_name
         |from read_files('$sfDir/customer.parquet') c
         |join read_files('$sfDir/nation.parquet') n on c.c_nationkey = n.n_nationkey
         |where c.c_custkey < 5""".stripMargin)
    assert(df.count() == 5) // c_custkey starts at 0
  }
}
