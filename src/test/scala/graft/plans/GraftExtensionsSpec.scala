package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.SparkSpec
import graft.functions.RollingHash

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("all native expressions are callable from SQL after install()") {
    GraftExtensions.install(spark)
    val got = spark.sql("SELECT rolling_hash('key agg row') AS h")
      .collect()(0).getLong(0)
    assert(got == RollingHash.eval("key agg row"))
    val nfc = spark.sql("SELECT nfc_normalize('cafe\\u0301') AS s")
      .collect()(0).getString(0)
    assert(nfc == "café")
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 11.0)
    val sig = spark.sql("SELECT minhash_sig('abcdef', 4) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == 4)
    // default k tracks Dedup.MinhashK
    assert(spark.sql("SELECT size(minhash_sig('abcdef')) AS n")
      .collect()(0).getInt(0) == graft.operators.Dedup.MinhashK)
    // foldable (non-literal) k works, e.g. 2*3; long literals too
    assert(spark.sql("SELECT size(minhash_sig('abcdef', 2*3)) AS n")
      .collect()(0).getInt(0) == 6)
    assert(spark.sql("SELECT size(minhash_sig('abcdef', 8L)) AS n")
      .collect()(0).getInt(0) == 8)
    assert(spark.sql("SELECT simhash64('the quick brown fox') AS h")
      .collect()(0).getLong(0)
      == graft.functions.SimHash64.eval("the quick brown fox"))
  }

  test("withExtensions wiring registers the function at session build") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      // see Bench.scala: single-JVM harness disables artifact-isolation
      .config("spark.sql.artifact.isolation.enabled", "false")
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
