package graft

/** Driver-contract invariants: every oracle key has a query, flagship
  * entry returns rows, query names are stable.
  */
class EntryContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("oracle coverage: only the HLL sketch op lacks an oracle") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q34_approx_distinct"),
      s"unexpected rows-only set: $rowsOnly")
  }

  test("q34: HLL approx distinct within tolerance of the exact count (the rows-only gap is covered here)") {
    val out = SparkEntry.q34_approx_distinct(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exact = r.getAs[Long]("exact_parts")
      val approx = r.getAs[Long]("approx_parts")
      assert(exact > 0 && math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("no oracle SQL carries a stripMargin-mangled concat operator") {
    // OracleSql normalizes with .stripMargin, which EATS a leading `|`
    // on a continuation line — `|| substr(...)` at line start becomes
    // `| substr(...)`, a VARCHAR bitwise-OR DuckDB rejects at bind
    // time (bit q109 and q111 during development). A lone ` | ` in the
    // normalized SQL is always that mangling: SQL string concat is
    // `||` and no oracle uses bitwise OR.
    for ((name, sql) <- SparkEntry.oracleSql)
      assert(!sql.contains(" | "),
        s"$name: probable stripMargin-eaten '||' (found ' | ') in: " +
          sql.take(300))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("gate-schema guard: no query emits a driver-hash-unstable output " +
      "type (wide decimal, binary, struct, map)") {
    // The driver gate hashes values after a parquet → DuckDB → pandas
    // round-trip, and that path is only representation-stable for
    // atomic types DuckDB and Spark render identically. Known unstable:
    //  - DecimalType(precision > 18): DuckDB→pandas materializes wide
    //    decimals as float64 ("105108306.0") while Spark round-trips
    //    the exact Decimal ("105108306") — the r11 q148 regression.
    //  - BinaryType: no canonical text form across engines.
    //  - StructType / MapType: nested rendering differs per engine.
    // Arrays of atomics are fine (several green queries emit them).
    import org.apache.spark.sql.types._
    def unstable(dt: DataType): Option[String] = dt match {
      case d: DecimalType if d.precision > 18 =>
        Some(s"decimal(${d.precision},${d.scale}) — driver renders wide " +
          "decimals as float64; cast to string or split hi/lo bigints")
      case _: BinaryType => Some("binary — hex/base64 it to string")
      case _: StructType => Some("nested struct — flatten to columns")
      case _: MapType => Some("map — explode to rows or json-encode")
      case a: ArrayType => unstable(a.elementType)
      case _ => None
    }
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, dir).schema.fields.flatMap { f =>
          unstable(f.dataType).map(why => s"$name.${f.name}: $why")
        }
    }
    assert(offenders.isEmpty,
      "driver-hash-unstable output columns:\n" + offenders.mkString("\n"))
  }
}
