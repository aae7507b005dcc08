package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst extension point — graft's analog of keenwa's pluggable
  * rule/operator registry (reference: /root/reference/src/rules/mod.rs:1,
  * src/operators/scalar/funcs.rs:9). Registers graft's codegen
  * expressions under SQL names so `spark.sql("select fnv64(text) ...")`
  * works, in addition to the typed Column API in graft.functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(
      name: String,
      builder: Seq[Expression] => Expression): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name), new ExpressionInfo("graft.functions", name), builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    import graft.functions.expr._
    e.injectOptimizerRule(_ => FuseJaccard)
    e.injectOptimizerRule(_ => PruneTopKPerKey)
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectFunction(fn("graft_fnv64", xs => Fnv64(xs.head)))
    e.injectFunction(fn("graft_poly_fingerprint", xs => PolyFingerprint(xs.head)))
    e.injectFunction(fn("graft_simhash64", xs => SimHash64(xs.head)))
    e.injectFunction(fn("graft_dot", xs => VectorDot(xs(0), xs(1))))
    e.injectFunction(fn("graft_norm", xs => VectorNorm(xs.head)))
    e.injectFunction(fn("graft_shingle_hashes", xs => ShingleHashes(xs.head, 3)))
    e.injectFunction(fn("graft_minhash_sig", xs => MinHashSig(xs.head)))
  }
}
