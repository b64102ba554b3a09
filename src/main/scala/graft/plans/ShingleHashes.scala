package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional k-token shingle hashes of one document in one pass:
  * `string → array<long>` where element `i` (0-based) is
  * [[graft.functions.AuditableHash.h60]] of the lowercased tokens
  * `i+1 .. i+k` (1-based) joined by single spaces — the kernel of
  * [[graft.operators.SubstringDedup]]. Documents shorter than `k`
  * tokens (and empty/NULL-ish text) yield an empty array.
  *
  * Why a custom Expression: the composed form carried the full token
  * array through an explode and ran a five-deep expression forest per
  * window (`slice → transform(lower) → array_join → md5 → conv`),
  * allocating intermediate arrays and strings once per SHINGLE —
  * measured at ~3 s of the 3.4 s q90 runtime at sf0.1. This tokenizes
  * and lowercases each token ONCE per document, streams each window's
  * bytes straight into a reused MessageDigest, and emits the finished
  * long array; `posexplode` over it replaces the whole forest. Hash
  * values are bit-identical to the composed form (differential-tested
  * in ShingleHashesSpec), so the q90–q92 DuckDB oracles are unchanged.
  *
  * Tokenization matches [[WordShingles]]/`TextFunctions.tokens`:
  * `trim` then split on `\s+`; lowercasing is `UTF8String.toLowerCase`
  * (what `functions.lower` runs), applied per token — byte-equal to
  * lowercasing the joined shingle.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_h60 requires string, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_h60"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.ShingleHashes.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private val localDigest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  private val EmptyTokens = new Array[Array[Byte]](0)

  def compute(text: UTF8String, k: Int): ArrayData = {
    val out = hashWindows(tokenBytes(text), k)
    if (out.isEmpty) Empty else new GenericArrayData(out)
  }

  /** The tokenize+lowercase half of [[compute]]: each whitespace
    * token's lowercased bytes, in order (empty for token-less text).
    * Exposed so a caller hashing the SAME document at several window
    * sizes ([[HashedBowScore]]'s unigram+bigram passes) pays the
    * string work once.
    */
  def tokenBytes(text: UTF8String): Array[Array[Byte]] = {
    val trimmed = text.trim().toString
    if (trimmed.isEmpty) return EmptyTokens
    val toks = Ws.split(trimmed, -1)
    val n = toks.length
    // lowercase each token ONCE (UTF8String.toLowerCase == functions.lower)
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tb(i) = UTF8String.fromString(toks(i)).toLowerCase.getBytes
      i += 1
    }
    tb
  }

  /** The hash half of [[compute]]: h60 of each k-token window over
    * pre-tokenized bytes.
    */
  def hashWindows(tb: Array[Array[Byte]], k: Int): Array[Long] = {
    val n = tb.length
    if (n < k) return Array.emptyLongArray
    val md = localDigest.get() // digest() self-resets between windows
    val out = new Array[Long](n - k + 1)
    var p = 0
    while (p <= n - k) {
      var j = p
      while (j < p + k) {
        if (j > p) md.update(' '.toByte)
        md.update(tb(j))
        j += 1
      }
      val d = md.digest()
      out(p) =
        (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
          ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      p += 1
    }
    out
  }
}
