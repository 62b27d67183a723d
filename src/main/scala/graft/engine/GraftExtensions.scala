package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point — the deploy-time registration route
  * for graft's native SQL functions (brief §custom-operators route (c)):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.engine.GraftExtensions ...
  * }}}
  *
  * injects [[graft.functions.GraftFunctions.all]] into the session's
  * function registry at creation, so pure-SQL users (thrift server,
  * `spark.sql`) get `graft_minhash` / `graft_simhash64` /
  * `graft_fingerprint` / `graft_cosine` / `graft_hyperplane_sig` /
  * `graft_fnv61` with the SAME codegen'd Catalyst nodes the Column API
  * builds. For a session that already exists, use
  * [[graft.functions.GraftFunctions.register]] instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.HashExpressions", name),
        builder))
    }
}
