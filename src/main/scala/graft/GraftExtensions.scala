package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.NativeFunctions

/** Cluster-deployment entry point for the engine's session extensions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the native function surface (the fused `cosine_sim` and
  * `hamming_dist` Catalyst expressions, the `kmv_mink` native
  * aggregate) and the whole-operator rung — the planner strategy for
  * the native as-of join ([[graft.plans.AsofJoinStrategy]]) — into
  * every session at creation time, so SQL-only users get the functions
  * and plan-level users get the custom operator without calling the
  * per-session registrars from code. No custom OPTIMIZER rules are
  * injected: every relational rewrite the engine needs is stock
  * Catalyst (SURVEY.md §4); custom nodes enter below the optimizer
  * through their own strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      NativeFunctions.cosineSimIdentifier,
      NativeFunctions.cosineSimInfo,
      NativeFunctions.cosineSimBuilder))
    ext.injectFunction((
      NativeFunctions.hammingIdentifier,
      NativeFunctions.hammingInfo,
      NativeFunctions.hammingBuilder))
    ext.injectFunction((
      NativeFunctions.kmvIdentifier,
      NativeFunctions.kmvInfo,
      NativeFunctions.kmvBuilder))
    ext.injectFunction((
      NativeFunctions.centroidCellIdentifier,
      NativeFunctions.centroidCellInfo,
      NativeFunctions.centroidCellBuilder))
    ext.injectFunction((
      NativeFunctions.centroidProbeIdentifier,
      NativeFunctions.centroidProbeInfo,
      NativeFunctions.centroidProbeBuilder))
    ext.injectFunction((
      NativeFunctions.projectionBitsIdentifier,
      NativeFunctions.projectionBitsInfo,
      NativeFunctions.projectionBitsBuilder))
    ext.injectFunction((
      NativeFunctions.winnowFpSetIdentifier,
      NativeFunctions.winnowFpSetInfo,
      NativeFunctions.winnowFpSetBuilder))
    ext.injectFunction((
      NativeFunctions.shinglesArrIdentifier,
      NativeFunctions.shinglesArrInfo,
      NativeFunctions.shinglesArrBuilder))
    ext.injectFunction((
      NativeFunctions.minhashSigIdentifier,
      NativeFunctions.minhashSigInfo,
      NativeFunctions.minhashSigBuilder))
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
