package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for specs: one local session per suite. */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder(master = "local[4]", appName = "graft-test").getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
}
