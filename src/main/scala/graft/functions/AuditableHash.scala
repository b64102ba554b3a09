package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 60-bit hash family computable *identically* in Spark and in ANSI
  * SQL engines (the DuckDB oracle), so sketch operators built on it —
  * MinHash signatures, SimHash fingerprints, deterministic samples —
  * are hash-match checkable end-to-end instead of rows-only.
  *
  * Base hash: `h60(s) = int(md5(utf8(s))[0:15 hex], 16)` — the first 60
  * bits of the MD5 digest as a non-negative long. In Spark that is
  * `conv(substring(md5(c),1,15),16,10)` (all codegen'd built-ins); in
  * DuckDB `CAST('0x' || substr(md5(c),1,15) AS BIGINT)`. 60 bits keeps
  * every derived product below 2^63 so ANSI-mode arithmetic (Spark 4
  * throws on long overflow) never wraps.
  *
  * MinHash permutations are the classic universal family over a 30-bit
  * reduction of the base hash: `g_i(x) = (a_i·(h60(x) mod 2^30) + b_i)
  * mod p`, p = 2^31−1 (Mersenne). The per-permutation constants derive
  * from h60 of literal strings (`minhash:a:i`), so the oracle can
  * regenerate them in SQL — no out-of-band parameter shipping. One md5
  * per shingle + 64 integer multiply-adds replaces 64 xxhash64 calls:
  * cheaper AND auditable. Bounds: a ∈ [1, 2^30−1], h < 2^30 → a·h <
  * 2^60; +b < 2^60+2^31 — no overflow.
  *
  * Collision budget: 60-bit base over ~10⁶ distinct shingles ⇒ ~4e-7
  * pair collision; the 30-bit reduction only feeds rank-order MinHash
  * estimates (k/64 granularity), where a ~1e-3 per-doc collision effect
  * is far below the estimator's own ±1/8 standard error.
  */
object AuditableHash {

  /** Modulus of the universal family: 2^31 − 1 (Mersenne prime). */
  val P: Long = 2147483647L

  /** Domain of the reduced base hash (2^30). */
  val M30: Long = 1073741824L

  /** 60-bit md5-derived hash of a column (non-negative). Computed by
    * the native [[graft.plans.Md5Prefix60]] expression — bit-identical
    * to `conv(substring(md5(c),1,15),16,10)` (differential-tested in
    * AuditableHashSpec) without the hex-string round-trip, because h60
    * runs once per shingle/token in the sketch kernels.
    */
  def h60(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.Md5Prefix60(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c.cast("string"))))

  /** [[h60]] reduced to the 30-bit universal-hash domain. */
  def base30(c: Column): Column = h60(c) % lit(M30)

  /** Permutation `i` of the MinHash family applied to a base-30 hash
    * column: `(a_i·h + b_i) mod p`.
    */
  def minhashPerm(i: Int, h: Column): Column =
    (lit(minhashA(i)) * h + lit(minhashB(i))) % lit(P)

  // ---- driver-side mirror (constant derivation) --------------------------

  /** JVM-side h60 — must agree bit-for-bit with the column form. */
  def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Multiplier of permutation i: `h60("minhash:a:i") mod (2^30−1) + 1`
    * ∈ [1, 2^30−1] (never 0 — a zero multiplier would make the
    * permutation constant).
    */
  def minhashA(i: Int): Long = h60(s"minhash:a:$i") % (M30 - 1) + 1

  /** Offset of permutation i: `h60("minhash:b:i") mod p`. */
  def minhashB(i: Int): Long = h60(s"minhash:b:$i") % P

  /** The SQL fragment computing h60 of `expr` in DuckDB — kept beside
    * the Scala forms so the three definitions can't drift apart.
    */
  def duckH60(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"
}
