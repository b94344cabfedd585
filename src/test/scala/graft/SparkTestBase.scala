package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local session for all specs (one JVM-wide session; ScalaTest runs
  * suites sequentially in the forked JVM).
  */
trait SparkTestBase extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkTestBase.session
  def fixture(rel: String): String =
    java.nio.file.Paths.get(
      getClass.getClassLoader.getResource(s"fixtures/$rel").toURI).toString
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // specs exercise vacuum against just-written debris; the production
    // default (10 min orphan grace — see LakeTable.vacuum) would spare
    // everything they assert reclaimed. The grace path itself is pinned
    // by LakeTableSpec's dedicated case, which sets the conf explicitly.
    s.sparkContext.hadoopConfiguration.setLong("graft.lake.vacuumGraceMs", 0L)
    s
  }
}
