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

  test("no registered query emits DecimalType precision > 18 (driver-hash-unsafe)") {
    // DECIMAL(>18) survives analysis but the driver's cross-engine hash
    // canonicalizes it engine-dependently (Spark java.math.BigDecimal vs
    // DuckDB HUGEINT rendering) — the class of silent red that hid
    // sketch_f2 and the six round-11 rows. Exact integers beyond int64
    // must ride as BIGINT (when range-provable) or canonical STRINGS.
    import org.apache.spark.sql.types._
    def wide(dt: DataType, path: String): Seq[String] = dt match {
      case d: DecimalType if d.precision > 18 => Seq(s"$path: $d")
      case s: StructType =>
        s.fields.toSeq.flatMap(f => wide(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => wide(a.elementType, s"$path[]")
      case m: MapType =>
        wide(m.keyType, s"$path<key>") ++ wide(m.valueType, s"$path<val>")
      case _ => Nil
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        wide(fn(spark, "/root/testdata/sf0.001").schema, name)
    }
    assert(offenders.isEmpty,
      s"gate-unsafe wide decimals in query outputs:\n${offenders.mkString("\n")}")
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
