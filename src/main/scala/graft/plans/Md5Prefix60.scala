package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The first 60 bits of an MD5 digest as a non-negative long —
  * bit-identical to `conv(substring(md5(x), 1, 15), 16, 10)` (the
  * [[graft.functions.AuditableHash.h60]] contract: 15 hex nibbles =
  * digest bytes 0..7 big-endian with the 16th nibble dropped, i.e.
  * `(longBE(digest[0..7]) >>> 4)`), but computed straight from the
  * digest bytes. The built-in composition hex-encodes the digest to a
  * 32-char string, substrings it, and string-parses 15 chars back to a
  * long — three transient allocations per call, and h60 runs once per
  * SHINGLE in the MinHash kernel (corpus-scale row counts, the hottest
  * loop in the dedup suite). Same escape-hatch rationale as
  * [[LongArrayEqCount]]: a tight primitive inside whole-stage codegen.
  *
  * NULL contract matches the composition it replaces: NULL → NULL.
  * Accepts string (hashed as UTF-8, like `md5(cast(s as binary))`) or
  * binary input.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_h60 requires a string or binary argument, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  @inline private def prefix60(d: Array[Byte]): Long =
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    prefix60(Md5Prefix60.localDigest.get().digest(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // one MessageDigest per operator instance, not per row —
      // getInstance does a provider lookup + allocation, and this
      // expression runs once per shingle. digest() self-resets.
      val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              """.stripMargin)
      val d = ctx.freshName("digest")
      val src = if (child.dataType == StringType) s"$c.getBytes()" else c
      s"""
         |byte[] $d = $md.digest($src);
         |${ev.value} =
         |  ((($d[0] & 0xffL) << 56) | (($d[1] & 0xffL) << 48) | (($d[2] & 0xffL) << 40) |
         |   (($d[3] & 0xffL) << 32) | (($d[4] & 0xffL) << 24) | (($d[5] & 0xffL) << 16) |
         |   (($d[6] & 0xffL) << 8) | ($d[7] & 0xffL)) >>> 4;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  /** Interpreted-path digest, one per thread (MessageDigest is not
    * thread-safe; digest() self-resets between uses).
    */
  private val localDigest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}
