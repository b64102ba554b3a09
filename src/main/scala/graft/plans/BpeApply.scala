package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a ranked BPE merge list to a space-delimited segmentation
  * string in ONE expression — the scale fix for
  * [[graft.operators.BpeVocab]]'s per-merge `replace` chain, whose
  * plan depth and re-evaluated string work both grew linearly per
  * merge (O(V²) total) and whose generated code would fall out of the
  * JIT/codegen budget long before a real ~32k-merge vocabulary (the
  * repo's LshBuckets/IvfAssign expression-forest lesson). This kernel
  * is a single plan node whatever the merge count.
  *
  * Semantics are BIT-IDENTICAL to the sequential chain
  * `replace(s, ' p1 p2 ', ' p1p2 ')` applied in rank order — the
  * contract the q100/q101 DuckDB oracles state in SQL — including the
  * shared-space overlap quirk: `replace` scans left-to-right without
  * rescanning its own output, so in `" a b a b "` the second
  * occurrence's LEADING space is the first occurrence's consumed
  * TRAILING space and only the first merges in that pass (reference
  * Sennrich BPE would merge both; the divergence is documented at
  * [[graft.operators.BpeVocab]]). Symbol-array equivalent, proven by
  * the differential spec (BpeApplySpec): one pass per rank merges
  * occurrences left-to-right, forbidding a match that STARTS at the
  * position immediately after the previous merge.
  *
  * Cost shape: instead of running every rank's pass over every word
  * (O(merges × symbols)), ranks are processed from a min-heap seeded
  * with the ranks of the pairs ACTUALLY adjacent in this word; a pass
  * that merges something re-scans the word once and pushes any newly
  * adjacent pair's rank if it is LATER than the current one (an
  * earlier rank's pass has already run — sequential semantics). Per
  * word the work is O(adjacent pairs processed × word length) ≈
  * O(len²), independent of the vocabulary size — 32k merges cost the
  * same as 8 unless the word actually contains their pairs. The
  * rank lookup table builds once per (de)serialized expression
  * instance, not per row.
  *
  * Precondition: the input is the canonical segmentation form
  * `" s1 s2 … sN "` (single spaces, one leading, one trailing) that
  * [[graft.operators.BpeVocab]] produces; symbols never contain
  * spaces. NULL propagates.
  */
case class BpeApplyMerges(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_apply requires string, got $t")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_apply"

  @transient private lazy val model = new BpeApplyMerges.Model(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeApplyMerges.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("bpeModel", model,
      classOf[BpeApplyMerges.Model].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.BpeApplyMerges.compute($a, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerges =
    copy(child = newChild)
}

object BpeApplyMerges {

  /** Rank-ordered merge table + the per-executor lookup structure:
    * `rankOf(left)(right)` → ASCENDING array of every rank that merges
    * this pair. A pair CAN legitimately appear at several ranks: the
    * overlap quirk leaves back-to-back occurrences unmerged, so the
    * same pair may win the training argmax again on a later iteration
    * — each of its ranks runs its own pass. Nested maps avoid a key
    * concatenation per adjacent-pair probe.
    */
  final class Model(merges: Seq[(String, String)]) extends Serializable {
    val lefts: Array[String] = merges.map(_._1.split(" ", 2)(0)).toArray
    val rights: Array[String] = merges.map(_._1.split(" ", 2)(1)).toArray
    val mergedSyms: Array[String] = merges.map(_._2).toArray
    @transient lazy val rankOf: java.util.HashMap[String, java.util.HashMap[String, Array[Int]]] = {
      val m = new java.util.HashMap[String, java.util.HashMap[String, Array[Int]]]()
      val tmp = new java.util.HashMap[String, java.util.HashMap[String, java.util.ArrayList[Integer]]]()
      var i = 0
      while (i < lefts.length) {
        tmp.computeIfAbsent(lefts(i),
            _ => new java.util.HashMap[String, java.util.ArrayList[Integer]]())
          .computeIfAbsent(rights(i), _ => new java.util.ArrayList[Integer]())
          .add(i)
        i += 1
      }
      tmp.forEach { (l, inner) =>
        val outInner = new java.util.HashMap[String, Array[Int]]()
        inner.forEach { (r, ranks) =>
          val arr = new Array[Int](ranks.size())
          var j = 0
          while (j < arr.length) { arr(j) = ranks.get(j).intValue(); j += 1 }
          outInner.put(r, arr) // insertion order was ascending
        }
        m.put(l, outInner)
      }
      m
    }
  }

  def compute(seg: UTF8String, model: Model): UTF8String = {
    val str = seg.toString
    val body = str.trim
    if (body.isEmpty) return seg
    var cur = body.split(" ")
    var len = cur.length
    if (len < 2) return seg
    val rankOf = model.rankOf
    if (rankOf.isEmpty) return seg

    val heap = new java.util.PriorityQueue[Integer]()
    val pushed = new java.util.HashSet[Integer]()
    // push the pair's SMALLEST rank still > `after` (earlier passes
    // already ran); if that pass leaves or recreates the pair, the
    // post-pass rescan pushes the next duplicate rank the same way
    @inline def push(l: String, r: String, after: Int): Unit = {
      val inner = rankOf.get(l)
      if (inner != null) {
        val ranks = inner.get(r)
        if (ranks != null) {
          var j = 0
          while (j < ranks.length && ranks(j) <= after) j += 1
          if (j < ranks.length) {
            val rk: Integer = ranks(j)
            if (pushed.add(rk)) heap.add(rk)
          }
        }
      }
    }
    var i = 0
    while (i < len - 1) { push(cur(i), cur(i + 1), -1); i += 1 }

    while (!heap.isEmpty) {
      val r = heap.poll().intValue()
      val p1 = model.lefts(r); val p2 = model.rights(r)
      val m = model.mergedSyms(r)
      // one replace pass: left-to-right, non-overlapping, and a match
      // may not START where the previous merge's consumed trailing
      // space would have been its leading space (the `replace` quirk)
      val out = new Array[String](len)
      var o = 0; var j = 0; var forbid = -1; var mergedAny = false
      while (j < len) {
        if (j + 1 < len && j != forbid && cur(j) == p1 && cur(j + 1) == p2) {
          out(o) = m; o += 1; mergedAny = true; j += 2; forbid = j
        } else {
          out(o) = cur(j); o += 1; j += 1
        }
      }
      if (mergedAny) {
        cur = out; len = o
        var a = 0
        while (a < len - 1) { push(cur(a), cur(a + 1), r); a += 1 }
      }
    }

    val sb = new java.lang.StringBuilder(str.length)
    sb.append(' ')
    var b = 0
    while (b < len) { sb.append(cur(b)); sb.append(' '); b += 1 }
    UTF8String.fromString(sb.toString)
  }
}
