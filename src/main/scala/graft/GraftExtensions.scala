package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{RollingHashExpr, SimHashExpr}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available cluster-wide via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (no per-session
  * register() call needed). The injected functions are the same
  * expressions NativeFunctions registers per-session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "graft_fingerprint"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHashExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashExpr(exprs.head)))
  }
}
