package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen'd expression:
  * `key → boolean` against a serialized `util.sketch.BloomFilter`
  * embedded in the plan — [[graft.operators.BloomJoin]]'s scan-side
  * pruning predicate. Replaces the previous Scala `udf` wrapper (the
  * repo's one deliberate UDF): the udf boxed every key and broke
  * whole-stage codegen on exactly the 100 TB probe scan the operator
  * exists to prune; this is the twelfth-kernel treatment — the
  * [[HashedBowScore]] pattern with the model blob as a reference
  * object, so the probe stays inside the scan's codegen stage.
  *
  * Spark's own `BloomFilterMightContain` is `private[sql]` and bound
  * to the runtime-filter scalar-subquery machinery; this expression
  * carries the PRE-BUILT filter bytes instead, which is what lets one
  * build prune many scans across jobs ([[graft.operators.BloomJoin]]'s
  * reuse contract).
  *
  * The blob deserializes ONCE per executor JVM (content-keyed cache in
  * the companion — `addReferenceObj` ships bytes, eval paths share the
  * decoded sketch). String keys hash exactly like the sketch's
  * `putString` (UTF-8 bytes → `mightContainBinary`), so probe results
  * are bit-identical to the builder's insertions. NULL keys yield
  * NULL, which a `Filter` treats as not-matching — the same rows drop
  * as with the old udf's `false`.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte],
    longKey: Boolean)
    extends UnaryExpression {

  require(bloomBytes.nonEmpty, "empty bloom filter blob")

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, longKey) match {
      case (LongType, true) => TypeCheckResult.TypeCheckSuccess
      case (StringType, false) => TypeCheckResult.TypeCheckSuccess
      case (t, lk) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains(longKey=$lk) cannot probe a $t key")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val filter: BloomFilter =
    BloomMightContain.filterFor(bloomBytes)

  override protected def nullSafeEval(input: Any): Any =
    if (longKey) filter.mightContainLong(input.asInstanceOf[Long])
    else filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", bloomBytes, "byte[]")
    val filterVar = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter", "graftBloom",
      v => s"$v = graft.plans.BloomMightContain.filterFor($bytesRef);")
    nullSafeCodeGen(ctx, ev, k =>
      if (longKey) s"${ev.value} = $filterVar.mightContainLong($k);"
      else s"${ev.value} = $filterVar.mightContainBinary($k.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {

  // content-keyed so every task (and the interpreted path) shares one
  // decoded sketch per distinct blob per JVM; blobs are broadcast-sized
  // and a pipeline holds a handful at once, so the map stays small
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[java.nio.ByteBuffer, BloomFilter]()

  def filterFor(bytes: Array[Byte]): BloomFilter =
    cache.computeIfAbsent(java.nio.ByteBuffer.wrap(bytes),
      _ => BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
}
