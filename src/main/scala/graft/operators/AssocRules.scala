package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining (the Apriori 2-itemset pass):
  * support, confidence, and lift for `A → B` over (basket, item)
  * rows — market-basket analysis, the co-occurrence rollup product
  * and retail warehouses serve next to funnels and retention.
  *
  * Scale shape, in order of what kills naive versions first:
  *
  *  - **Apriori prune BEFORE the pair join**: an itemset can only be
  *    frequent if every subset is, so items below `minSupport` are
  *    dropped before the within-basket self-join — the pair blowup is
  *    `Σ_b f_b²` over FREQUENT items per basket, not raw items.
  *  - **Hot-basket guard**: a single degenerate basket holding 10⁵
  *    frequent items would alone contribute 10¹⁰ pairs; real pipelines
  *    cap or drop such baskets explicitly. `maxItemsPerBasket` drops
  *    oversized baskets (measured AFTER the frequency prune, a
  *    deterministic rule the oracle can mirror) rather than letting
  *    one pathological row own the job. When the cap is active, item
  *    supports and the basket count N are recomputed over the
  *    POST-DROP incidence, so confidence and lift divide counts from
  *    one population (q166 pins the capped semantics).
  *  - Everything else is equi-join + aggregate keyed on basket or on
  *    the item pair: AQE-skew-splittable, no windows, no driver state.
  *
  * All scores are exact integer fixed point (units of `1/scale`):
  * `conf_fp = supp(AB)·scale DIV supp(A)` and
  * `lift_fp = supp(AB)·N·scale DIV (supp(A)·supp(B))` with `N` the
  * basket count — order-free and bit-reproducible by a SQL oracle.
  * Support counts BASKETS (distinct basket-item incidence), the
  * standard definition.
  */
object AssocRules {

  /** Directed rules `(antecedent, consequent, pair_supp, conf_fp,
    * lift_fp)` for every frequent ordered pair: both items ≥
    * `minSupport` baskets, the pair itself ≥ `minSupport` baskets,
    * and confidence ≥ `minConfFp`. Ordered confidence desc, then
    * antecedent/consequent — deterministic for any input.
    */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, minConfFp: Long = 0L,
      maxItemsPerBasket: Int = Int.MaxValue,
      scale: Long = 1000000L): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxItemsPerBasket >= 2,
      s"maxItemsPerBasket must be >= 2, got $maxItemsPerBasket")
    val capActive = maxItemsPerBasket != Int.MaxValue
    val inc = df
      .select(col(basketCol).cast("string").as("basket"),
        col(itemCol).cast("string").as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
      .localCheckpoint(eager = true) // feeds N, item supports, pairs
    val itemSupp = inc.groupBy(col("item")).agg(count(lit(1)).as("supp"))
    val freq = itemSupp.filter(col("supp") >= minSupport)
    // prune, then guard: basket size is measured over FREQUENT items
    val pruned = inc.join(freq.select(col("item")), Seq("item"), "left_semi")
    val kept =
      if (!capActive) pruned
      else {
        // aggregate + anti-join, not a window: the size check is a
        // map-side-combining count, and only the (rare) oversized
        // basket ids travel
        val oversized = pruned.groupBy(col("basket"))
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") > maxItemsPerBasket)
          .select(col("basket"))
        pruned.join(oversized, Seq("basket"), "left_anti")
          .localCheckpoint(eager = true) // feeds supports, N, AND pairs
      }
    // One consistent score population. Cap inactive: the raw incidence
    // (classic Apriori — N counts every basket, supports are pre-prune
    // counts; pruning only gates WHICH items pair). Cap ACTIVE: every
    // score must come from the SAME post-drop incidence — dividing a
    // post-drop pair_supp by pre-drop item supports / basket count
    // mixes two populations (confidence systematically underestimated
    // for items occurring in dropped baskets; lift's N inconsistent
    // with its numerator).
    val supports =
      if (capActive) kept.groupBy(col("item")).agg(count(lit(1)).as("supp"))
      else freq
    val nBaskets = (if (capActive) kept else inc)
      .select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val pairs = kept.as("x").join(kept.as("y"),
        col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("a"), col("y.item").as("b"))
      .agg(count(lit(1)).as("pair_supp"))
      .filter(col("pair_supp") >= minSupport)
    // both directions ride the same pair row; supports come from the
    // (small) frequent-item table twice
    val directed = pairs
      .select(col("a").as("antecedent"), col("b").as("consequent"), col("pair_supp"))
      .unionByName(pairs
        .select(col("b").as("antecedent"), col("a").as("consequent"), col("pair_supp")))
    directed
      .join(supports.select(col("item").as("antecedent"), col("supp").as("__sa")),
        "antecedent")
      .join(supports.select(col("item").as("consequent"), col("supp").as("__sb")),
        "consequent")
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("pair_supp"),
        expr(s"pair_supp * CAST($scale AS BIGINT) DIV __sa").as("conf_fp"),
        expr(s"pair_supp * n_baskets * CAST($scale AS BIGINT) DIV (__sa * __sb)")
          .as("lift_fp"))
      .filter(col("conf_fp") >= minConfFp)
      .orderBy(col("conf_fp").desc, col("antecedent"), col("consequent"))
  }
}
