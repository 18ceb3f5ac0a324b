package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: the smoke query returns rows, every
  * oracle key has a query, and query outputs have distinct column names
  * (the driver's compare sorts columns by name — duplicates would break
  * the hash silently). */
class SparkEntrySpec extends AnyFunSuite with SparkSpec {

  test("entry (driver smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key is a registered query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query outputs have distinct, non-empty column names") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, "/root/testdata/sf0.001").columns.toSeq
      assert(cols.nonEmpty, s"$name has no columns")
      assert(cols.distinct == cols, s"$name has duplicate columns: $cols")
      assert(cols.forall(_.nonEmpty), s"$name has an empty column name")
    }
  }
}
