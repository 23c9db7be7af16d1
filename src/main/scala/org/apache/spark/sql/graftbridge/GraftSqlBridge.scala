package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** The ONE access point this library takes into Spark's `private[sql]`
  * surface: constructing a DataFrame from a custom [[LogicalPlan]]
  * (`Dataset.ofRows`) — the standard bridge every Spark library that
  * ships its own operator uses, because plan-bearing Datasets have no
  * public constructor. Kept to a single file in a clearly-marked
  * package so the private-API dependency stays auditable; everything
  * else in the repo goes through public API.
  */
object GraftSqlBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
