package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional k-CHARACTER n-gram hashes of one string in one pass:
  * `string → array<long>` where element `i` (0-based) is
  * [[graft.functions.AuditableHash.h60]] of code points `i .. i+k-1` —
  * the character-level sibling of [[ShingleHashes]] and the feature
  * extractor of the char-n-gram language model ([[CharLmScore]],
  * `graft.operators.CharLm`). Strings shorter than `k` code points
  * (and NULL) yield an empty array / NULL.
  *
  * Windows are CODE POINTS, not UTF-16 units or bytes — the contract
  * that makes the hash equal `md5(substr(s, i, k))` in DuckDB (whose
  * `substr`/`length` count code points). A window's bytes are a
  * contiguous UTF-8 slice, so the kernel walks the byte array once to
  * find code-point offsets and streams each window's slice straight
  * into the reused MessageDigest — no per-window string allocation.
  * Normalization (lowercase etc.) is the CALLER's: pass `lower(col)`
  * and mirror `lower(...)` in SQL, exactly the token-family contract.
  */
case class CharNgramHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_char_ngrams requires string, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    CharNgramHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.CharNgramHashes.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

object CharNgramHashes {

  private val localDigest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  /** Byte offset of each code point (length n+1; last = total bytes). */
  private[plans] def codePointOffsets(bytes: Array[Byte]): Array[Int] = {
    // count first, then fill — two cheap passes beat a growable buffer
    var n = 0
    var p = 0
    while (p < bytes.length) {
      p += UTF8String.numBytesForFirstByte(bytes(p)); n += 1
    }
    val offs = new Array[Int](n + 1)
    var i = 0
    p = 0
    while (i < n) {
      offs(i) = p
      p += UTF8String.numBytesForFirstByte(bytes(p))
      i += 1
    }
    offs(n) = bytes.length
    offs
  }

  /** h60 of `bytes[from, until)` — the [[ShingleHashes]] digest fold. */
  private[plans] def h60Slice(md: java.security.MessageDigest,
      bytes: Array[Byte], from: Int, until: Int): Long = {
    md.update(bytes, from, until - from)
    val d = md.digest() // digest() self-resets
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val offs = codePointOffsets(bytes)
    val n = offs.length - 1
    if (n < k) return Empty
    val md = localDigest.get()
    val out = new Array[Long](n - k + 1)
    var s = 0
    while (s <= n - k) {
      out(s) = h60Slice(md, bytes, offs(s), offs(s + k))
      s += 1
    }
    new GenericArrayData(out)
  }
}
