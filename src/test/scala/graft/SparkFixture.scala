package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** Shared local session for specs. getOrCreate is shared across all
  * suites in the forked test JVM; never stopped mid-run. */
trait SparkFixture { self: Suite =>
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.sources.GraftExtensions)
      .getOrCreate()
    Engine.tune(s)
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
