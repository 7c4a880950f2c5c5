package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (sbt runs tests in one forked JVM;
  * getOrCreate reuses the session). */
object TestSession {
  lazy val spark: SparkSession = Engine.session("4")
}

trait SparkSuiteBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf: String = "/root/testdata/sf0.001"
}
