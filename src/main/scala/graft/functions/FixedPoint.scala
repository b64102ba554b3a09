package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Exact fixed-point kernels shared by operators whose outputs must be
  * re-derivable bit-for-bit by an ANSI SQL oracle. [[graft.plans.Log2Fp]]
  * is the log side; this object holds the pure-`Column` inverses and
  * helpers (built entirely from codegen'd Spark primitives — integer
  * multiply, compare, dynamic shift — so they stay inside whole-stage
  * codegen with no custom expression needed).
  */
object FixedPoint {

  /** `floor(2^(x/1024) · 1024)` — base-2 exponentiation in Q10 fixed
    * point, the inverse of the Log2Fp discipline and the kernel behind
    * softmax-style reweighting ([[graft.operators.DomainMixture]]).
    *
    * Method: split `x = 1024·i + f` (integer bits, Q10 fraction);
    * `2^(f/1024)` accumulates in Q30 by multiplying, for each set bit
    * b of `f` (MSB first), the constant `⌊2^(1/2^(b+1)) · 2^30⌋` — ten
    * integer literals the oracle repeats verbatim, so both engines
    * floor identically at every step. The final scale folds `2^i` in
    * with one dynamic shift. Deterministic by construction: no libm,
    * no doubles.
    *
    * Domain: `x` in `[0, 40960]` (2^0 … 2^40 — callers clamp; the Q30
    * accumulator times 2^40 stays far inside signed-64). Inputs below
    * 0 or above the cap are clamped, loudly documented rather than
    * silently wrapped. Monotone non-decreasing; error vs real 2^x is
    * ≤ 2 Q10 output ulps plus a ≤ 10·2^-30 multiplicative term (each
    * of the ten Q30 constant multiplications floors away ≤ 2^-30
    * relative; FixedPointSpec measures it against `math.pow`).
    */
  def pow2fp(x: Column): Column = {
    val cx = greatest(lit(0L), least(lit(40960L), x))
    val i = ColumnBridge.column(ShiftRight(
      ColumnBridge.expression(cx), ColumnBridge.expression(lit(10))))
    val f = cx.bitwiseAND(lit(1023L))
    // ⌊2^(1/2^(b+1)) · 2^30⌋ for b = 0..9 (sqrt(2), 2^(1/4), … 2^(1/1024))
    val consts = Seq(1518500249L, 1276901416L, 1170923761L, 1121280435L,
      1097253708L, 1085434105L, 1079572135L, 1076653033L, 1075196443L,
      1074468887L)
    // LINEAR expression tree: each step is `(r · factor) >> 30` with
    // factor = C_b when the bit is set, else 2^30 (an exact identity —
    // r·2^30 >> 30 == r). The obvious `when(bit, step(r)).otherwise(r)`
    // embeds r TWICE per level, a 2^10-leaf tree that made the planner
    // the hot path (a 30 s gate query); here r appears once per level.
    var r: Column = lit(1L << 30)
    for (b <- 0 to 9) {
      val bit = lit(1L << (9 - b))
      val factor = when(f.bitwiseAND(bit) === bit, lit(consts(b)))
        .otherwise(lit(1L << 30))
      r = ColumnBridge.column(ShiftRight(
        ColumnBridge.expression(r * factor),
        ColumnBridge.expression(lit(30))))
    }
    // result Q10 = (r · 2^i) / 2^20, shift-safe on both branches.
    // NULL propagates (guarded explicitly: least/greatest SKIP nulls,
    // so the clamp alone would silently turn NULL into the max output)
    when(x.isNotNull,
      when(i <= 20,
        ColumnBridge.column(ShiftRight(ColumnBridge.expression(r),
          ColumnBridge.expression((lit(20) - i).cast("int")))))
        .otherwise(ColumnBridge.column(ShiftLeft(ColumnBridge.expression(r),
          ColumnBridge.expression((i - lit(20)).cast("int"))))))
  }
}
