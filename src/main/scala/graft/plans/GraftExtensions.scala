package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Injection point for graft's Catalyst extensions: registers the
  * custom expression builders at session build time so SQL text and
  * DataFrame code share one kernel set, and installs the
  * [[PreAggregateBeforeShuffleRule]] optimizer rule (OPS-inspired
  * pre-combine-before-shuffle + small-dim broadcast hinting).
  * Installed via `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    graft.functions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    e.injectOptimizerRule(_ => PreAggregateBeforeShuffleRule)
  }
}
