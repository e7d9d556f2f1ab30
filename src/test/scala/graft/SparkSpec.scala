package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one local session per JVM (suites share it). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session("local[4]", "graft-test", 4)
  val sf: String = "/root/testdata/sf0.001"
}
