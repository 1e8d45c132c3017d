package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for every suite (getOrCreate — suites run
  * sequentially in the forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.local("4", "graft-test")
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
}
