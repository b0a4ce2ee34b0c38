package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, ONE JSON line on stdout.
  *
  * local[32] by default (the driver's stated executor shape); AQE on so
  * sf0.1 plans re-partition at runtime the way a real cluster run would.
  * A warm-up action absorbs one-time session/codegen init so per-query
  * numbers measure the queries, not JVM startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: touch every table once (scan + codegen init, no shuffle)
    Tables.Names.foreach { n =>
      try Tables.load(spark, sfDir, n).limit(1).count()
      catch { case _: Throwable => () }
    }

    // noop sink: evaluates EVERY output column (count() would let Catalyst
    // prune computed projections and under-measure expression-heavy queries)
    // failures surface as -1 so a crashing query can never masquerade as a
    // fast one in the driver's bench record
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries carry the -1 sentinel in `queries` but must not
    // subtract from the headline total; surface them as a count instead
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failures = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
