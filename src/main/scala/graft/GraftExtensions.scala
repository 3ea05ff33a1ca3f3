package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions and optimizer rules available cluster-wide via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (no per-session
  * register() call needed). The injected functions come from the SAME
  * single registry (`NativeFunctions.builders`) the per-session
  * register uses — the two surfaces cannot drift (FunctionsSpec pins
  * the builder list against the Column wrapper surface). The injected
  * [[graft.plans.RewriteDotProduct]] rule transparently accelerates
  * user-written HOF dot products.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.NativeFunctions.builders.foreach { case (name, cls, builder) =>
      // the concrete Expression class per function, so DESCRIBE FUNCTION
      // EXTENDED names the real implementation (not a shared registry label)
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls, name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
  }
}
