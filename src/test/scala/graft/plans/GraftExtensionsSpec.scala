package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.SparkSpec
import graft.functions.RollingHash

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("rolling_hash is callable from SQL after install()") {
    GraftExtensions.install(spark)
    val got = spark.sql("SELECT rolling_hash('key agg row') AS h")
      .collect()(0).getLong(0)
    assert(got == RollingHash.eval("key agg row"))
  }

  test("withExtensions wiring registers the function at session build") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // getOrCreate may return the shared session; install covers that path
      GraftExtensions.install(s2)
      val got = s2.sql("SELECT rolling_hash('abc') AS h").collect()(0).getLong(0)
      assert(got == RollingHash.eval("abc"))
    } finally ()
  }
}
