package graft

import org.apache.spark.sql.{Column, SparkSession}

/** Column wrappers for graft's custom Catalyst expressions, plus SQL
  * registration so `spark.sql("SELECT cosine_sim(a,b) ...")` works.
  * Grows as kernels land (vector / hash expressions).
  */
package object functions {
  def registerAll(spark: SparkSession): Unit = {
    // populated as custom expressions land; idempotent.
    val _ = spark
  }
}
