package graft.plans

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // expected values are DuckDB jaro_winkler_similarity outputs,
  // captured verbatim — the q156 oracle's comparator
  private val battery = Seq(
    ("", "", 0.0),
    ("a", "", 0.0),
    ("abc", "abc", 1.0),
    ("ABC", "abc", 0.0), // case-sensitive
    ("ab", "ba", 0.0), // window 0 → no off-position matches
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("duane", "dwayne", 0.8400000000000001),
    ("abcdef", "badcfe", 0.8333333333333334),
    ("appl", "apple", 0.96),
    ("abcdxxxxxx", "abcdyyyyyy", 0.6), // jaro ≤ 0.7 → NO prefix boost
    // the floored-half-transposition deviation from the literature
    // (an odd crossing count rounds DOWN — rapidfuzz/DuckDB lineage):
    // classic t/2.0 would give jaro 0.845238 (jw 0.907143) here
    ("XX000871", "XX001071", 0.9214285714285715),
    ("Customer#000000871", "Customer#000001071", 0.9660130718954247))

  test("scalar matches the DuckDB oracle battery bit-for-bit") {
    battery.foreach { case (a, b, want) =>
      assert(JaroWinkler.sim(a, b) == want, s"sim($a, $b)")
      assert(JaroWinkler.sim(b, a) == want, s"sim($b, $a) (symmetry)")
    }
  }

  test("column form: codegen == interpreted == scalar; NULL propagates") {
    val df = battery.map { case (a, b, w) => (a, b, w) }
      .toDF("a", "b", "want")
      .withColumn("got", T.jaroWinkler($"a", $"b"))
    def run() = df.filter($"got" =!= $"want").count()
    assert(run() == 0)
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.get(key)
    try { spark.conf.set(key, "NO_CODEGEN"); assert(run() == 0) }
    finally spark.conf.set(key, old)
    val nulls = Seq((Option("x"), Option.empty[String]),
      (Option.empty[String], Option("y"))).toDF("a", "b")
      .select(T.jaroWinkler($"a", $"b").as("s"))
    assert(nulls.filter($"s".isNotNull).isEmpty)
  }
}
