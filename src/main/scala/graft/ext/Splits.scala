package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/val/test split assignment POLICIES over dedup components — the
  * curation step between near-dup grouping (NearDup.connectedComponents)
  * and data delivery (mixture schedule / shard packing).
  *
  * [[TextAnalysis.splitAssign]] is the stateless rule (hash the unit id);
  * this module adds the VERSIONED rule a production corpus needs once
  * snapshots evolve: assignments must be STABLE across versions (an eval
  * doc that silently moves into train contaminates every model trained
  * since), which a pure component-hash cannot give — a new doc bridging
  * two components changes the component id, and every surviving member
  * would re-hash to a possibly different split.
  */
object Splits {

  /** Version-pinned component splits (round 12 — VERDICT_r11 next #2).
    *
    * `members` is the CURRENT version's (idCol, componentCol) table —
    * every doc with its near-dup component (singletons = own id);
    * `prior` carries the PREVIOUS version's assignments (idCol,
    * priorSplitCol) for whatever ids survive. Output: (idCol,
    * componentCol, split, quarantined).
    *
    * The policy, in precedence order:
    *   1. a SURVIVING doc keeps its prior split unconditionally — the
    *      stability invariant (n_flipped = 0 by construction);
    *   2. a NEW doc in a component with surviving members inherits the
    *      component's pinned split: the prior split of the LOWEST-id
    *      surviving member (deterministic, engine-independent);
    *   3. an ALL-NEW component hashes its component id through
    *      [[TextAnalysis.splitAssign]] — identical to the stateless rule,
    *      so fresh data splits exactly as a from-scratch assignment would;
    *   4. a component whose surviving members carry CONFLICTING priors —
    *      two previously-pinned components merged by a bridging doc — is
    *      QUARANTINED (flag 1 on every member): no assignment can be both
    *      stable and leak-free once pinned splits collide, so members
    *      keep their non-flipped splits and the flag routes them out of
    *      eval sets. Quarantine is the honest resolution: silently
    *      flipping the smaller side (contamination) or leaving the leak
    *      (inflated eval) are both worse, and the flagged set is
    *      delta-bounded in practice (merges need a bridging change).
    *
    * Scale shape: one corpus-linear left join against the prior table,
    * one component-keyed aggregate (components are near-dup clusters —
    * bounded fan-in), one join back. No windows, no driver state.
    */
  def pinnedComponentSplits(members: DataFrame, idCol: String,
      componentCol: String, prior: DataFrame, priorSplitCol: String,
      weights: Seq[(String, Int)]): DataFrame = {
    val m = members.select(col(idCol), col(componentCol))
      .join(prior.select(col(idCol), col(priorSplitCol).as("__prior")),
        Seq(idCol), "left")
    // countDistinct ignores nulls (new docs pin nothing); the min-struct is
    // arg-min by id over the non-null priors — the pinned inheritance source
    val pins = m.groupBy(componentCol).agg(
      countDistinct(col("__prior")).as("__npins"),
      min(when(col("__prior").isNotNull,
        struct(col(idCol), col("__prior")))).as("__minpin"))
    m.join(pins.hint("shuffle_hash"), Seq(componentCol))
      .select(col(idCol), col(componentCol),
        when(col("__prior").isNotNull, col("__prior"))
          .when(col("__npins") === 0,
            TextAnalysis.splitAssign(col(componentCol), weights))
          .otherwise(col("__minpin").getField("__prior")).as("split"),
        when(col("__npins") > 1, 1).otherwise(0).as("quarantined"))
  }

  /** [[pinnedComponentSplits]] with the QUARANTINE LIFECYCLE (round 13 —
    * VERDICT_r12 next #5): the single-step policy recomputes the flag per
    * version from the live conflict alone, so a component whose conflict
    * dissolved (one side's docs left the corpus) would re-enter eval the
    * very next version — and flap right back out if the bridging content
    * returns. The versioned form carries per-doc state
    * (split, quarantined, stable_for) across versions and RETIRES
    * deliberately:
    *   - a component with a LIVE conflict (surviving pins disagree) is
    *     quarantined and its stability clock resets;
    *   - a component whose surviving members carry a quarantine flag but
    *     whose pins are now UNIFORM (the conflict dissolved — the only
    *     no-flip resolution) counts stable versions; it re-enters eval
    *     (flag cleared) only after `retireAfter` consecutive stable
    *     versions — the anti-flap window;
    *   - split assignment is IDENTICAL to the single-step policy in every
    *     arm: retirement never flips a survivor — docs re-enter eval with
    *     the split they always had, so stability and leak-freedom are
    *     preserved by construction (a dissolved conflict leaves uniform
    *     splits, so clearing the flag cannot create a leaky pair).
    * `prior` carries (idCol, priorSplitCol, priorQuarantinedCol,
    * priorStableForCol) from the previous version's output (all-zero
    * flags/counters for the first version). Output adds `stable_for`.
    * Scale shape unchanged: one corpus-linear left join, one
    * component-keyed aggregate, one join back.
    */
  def pinnedComponentSplitsVersioned(members: DataFrame, idCol: String,
      componentCol: String, prior: DataFrame, priorSplitCol: String,
      priorQuarantinedCol: String, priorStableForCol: String,
      weights: Seq[(String, Int)], retireAfter: Int): DataFrame = {
    require(retireAfter >= 1, "retireAfter must be >= 1 (versions of calm before re-entry)")
    val m = members.select(col(idCol), col(componentCol))
      .join(prior.select(col(idCol), col(priorSplitCol).as("__prior"),
        col(priorQuarantinedCol).as("__pq"),
        col(priorStableForCol).as("__psf")), Seq(idCol), "left")
    val pins = m.groupBy(componentCol).agg(
      countDistinct(col("__prior")).as("__npins"),
      min(when(col("__prior").isNotNull,
        struct(col(idCol), col("__prior")))).as("__minpin"),
      // any surviving member still under the flag, and the cooling clock:
      // min stable_for over the flagged survivors (a component is only as
      // calm as its most recently conflicted member)
      max(coalesce(col("__pq"), lit(0))).as("__anyq"),
      min(when(col("__pq") === 1, col("__psf"))).as("__minsf"))
    m.join(pins.hint("shuffle_hash"), Seq(componentCol))
      .select(col(idCol), col(componentCol),
        when(col("__prior").isNotNull, col("__prior"))
          .when(col("__npins") === 0,
            TextAnalysis.splitAssign(col(componentCol), weights))
          .otherwise(col("__minpin").getField("__prior")).as("split"),
        when(col("__npins") > 1, 1)
          .when(col("__anyq") === 1 && col("__minsf") + 1 < retireAfter, 1)
          .otherwise(0).as("quarantined"),
        when(col("__npins") > 1, 0)
          .when(col("__anyq") === 1, col("__minsf") + 1)
          .otherwise(0).as("stable_for"))
  }
}
