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

  /** transformWithState mandates the RocksDB state store provider;
    * scope it to one test body and restore the session default after. */
  def withRocksDBStateStore(body: => Unit): Unit = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }
}
