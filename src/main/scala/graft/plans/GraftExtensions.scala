package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Injection point for graft's Catalyst extensions (SQL function
  * registration + optimizer rules). Installed via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // optimizer rules / function injections land here.
    val _ = e
  }
}
