package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` door the custom-plan API needs: wrapping a
  * hand-built `LogicalPlan` back into a `DataFrame`. Spark exposes no
  * public constructor for that, so — the established idiom for
  * extension libraries that ship their own logical operators (Sedona's
  * `org.apache.spark.sql.sedona_sql`, Delta's `org.apache.spark.sql.delta`)
  * — this shim lives under `org.apache.spark.sql` to reach
  * `classic.Dataset.ofRows`. Nothing else in the engine uses the
  * package-private surface.
  */
object GraftSql {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
