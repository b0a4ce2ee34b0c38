package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke: run SparkEntry.entry, require rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    df.printSchema()
    rows.foreach(r => println(r.mkString(" | ")))
    println(s"entry rows: ${rows.length}")
    assert(rows.nonEmpty, "driver smoke would FAIL: entry returned 0 rows")
    spark.stop()
  }
}
