package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{BloomContainsExpr, DotProductExpr, MinHashSigExpr, RollingHashExpr, SimHashExpr, WordShinglesExpr}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions and optimizer rules available cluster-wide via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (no per-session
  * register() call needed). The injected functions are the same
  * expressions NativeFunctions registers per-session; the injected
  * [[graft.plans.RewriteDotProduct]] rule transparently accelerates
  * user-written HOF dot products.
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
    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShinglesExpr].getName, "graft_word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordShinglesExpr(exprs.head, exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSigExpr(exprs.head,
          exprs(1).eval().asInstanceOf[Int],
          exprs(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_est"),
      new ExpressionInfo(classOf[graft.functions.CmsEstExpr].getName, "graft_cms_est"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CmsEstExpr(exprs.head,
          exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toLongArray(),
          exprs(2).eval().asInstanceOf[Int],
          exprs(3).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContainsExpr].getName, "graft_bloom_contains"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomContainsExpr(exprs.head,
          exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toLongArray(),
          exprs(2).eval().asInstanceOf[Int])))
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
  }
}
