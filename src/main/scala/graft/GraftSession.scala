package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine confs every graft session needs — session
  * configuration belongs at BUILD time, not inside query functions
  * (a query mutating session conf is global, order-dependent state).
  *
  *  - `nanosAsLong`: an events.parquet written with TIMESTAMP(NANOS)
  *    (older generator versions) cannot be read natively by Spark 4;
  *    the conf reads it as raw epoch-nanos LongType, which keeps
  *    arithmetic exact (ns epochs exceed 2^53, so doubles would
  *    corrupt them). Harmless for the current micros files —
  *    Relational.eventsRaw normalizes either form to nanos-long.
  *  - UTC: date/timestamp functions must agree with the DuckDB oracle.
  *  - shuffle.partitions sized to the local core count (not the 200
  *    default) — on a real cluster this is AQE + explicit tuning.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // bucketed-table writes (GraftIO.writeBucketed) land under
      // target/, not a spark-warehouse dir at the repo root
      .config("spark.sql.warehouse.dir",
        new java.io.File("target/warehouse").getAbsolutePath)
}
