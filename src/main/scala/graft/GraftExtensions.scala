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
  * `hamming_dist` Catalyst expressions) into every session at creation
  * time, so SQL-only users get it without calling
  * [[graft.functions.NativeFunctions.register]] from code. No custom
  * optimizer rules or strategies are injected — every relational rewrite
  * the engine needs is stock Catalyst (SURVEY.md §4); this hook exists
  * for the scalar-expression rung of the extension ladder.
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
  }
}
