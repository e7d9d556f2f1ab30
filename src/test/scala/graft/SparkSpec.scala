package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one local session per JVM (suites share it). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // fresh warehouse per JVM: managed CREATE TABLE in golden scripts must
    // not trip over a previous run's leftover spark-warehouse directories
    // (DROP IF EXISTS can't see them — the in-memory catalog starts empty)
    System.setProperty("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    Engine.session("local[4]", "graft-test", 4)
  }
  val sf: String = "/root/testdata/sf0.001"
}
