package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot 10× scale probe for the three dedup pipelines: the documents
  * table from `SPARK_GRAFT_SF_DIR` (default sf0.1) is unioned `copies`
  * times with disjoint id ranges and a per-copy text perturbation (clones
  * are near- rather than exact-duplicates, so the verify stage does real
  * work), then the q39 (DataFrame LSH), q56 (SQL-text staged pipeline) and
  * q57 (mid-range windows + label propagation) shapes run once each on the
  * scaled corpus. Prints one JSON line of wall-times + output rows.
  *
  * Not a driver gate — direct evidence (recorded in COVERAGE.md) that the
  * bucketed one-shuffle plans hold an order of magnitude past bench scale:
  * the candidate structure stays (band, hash)-bucketed, never all-pairs, so
  * runtime should scale near-linearly in corpus size plus the genuine
  * quadratic term inside duplicate buckets (10 clones per doc → ~45 clone
  * pairs per bucket group — real dedup output, not plan overhead).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val offset = 10000000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    // EXACT copies, ids offset: the scaled corpus preserves the base corpus's
    // similarity structure exactly (each 1× pair → copies² pairs, each doc →
    // C(copies,2) clone pairs). Text perturbation was tried and rejected —
    // any appended tag dominates the shingle set of the corpus's shortest
    // documents and manufactures corpus-wide spurious clusters (measured
    // 138M pairs with a shared per-copy suffix, 70M with per-row id tags,
    // vs ~1M real ones)
    val scaled = (0 until copies).map { i =>
      base.select(($"doc_id" + lit(i * offset)).as("doc_id"), $"text")
    }.reduce(_ unionByName _)
    val nDocs = scaled.count()

    def timed(name: String)(df: => DataFrame): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val d = df
      d.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      (name, secs, d.count()) // rows counted untimed, after the measured run
    }

    val q39 = timed("q39_neardup_lsh_10x") {
      graft.operators.Dedup.nearDupPairs(
        scaled, "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.5)
    }
    val q56 = timed("q56_sql_dedup_10x") {
      scaled.createOrReplaceTempView("v_documents")
      SparkEntry.sqlDedupPipeline(spark)
    }
    val q57 = timed("q57_dedup_midrange_10x") {
      // q57's shape on each copy's first 200 docs (2000 docs of windows)
      val win = scaled
        .filter($"doc_id" % offset < 200)
        .withColumn("stride", greatest(lit(1L), floor(length($"text") / lit(8.0))))
        .withColumn("wlen", greatest(lit(4L), floor(length($"text") / lit(2.0))))
        .select(($"doc_id" * 3).as("base"), $"text", $"stride", $"wlen",
          explode(sequence(lit(0L), lit(2L))).as("w"))
        .select(($"base" + $"w").as("win_id"),
          $"text".substr(($"w" * $"stride" + 1).cast("int"), $"wlen".cast("int")).as("wtext"))
      val pairs = graft.operators.Dedup.nearDupPairs(
          win, "win_id", "wtext",
          numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.5)
        .filter($"est_jac" < 1.0)
      graft.operators.Dedup.resolveClusters(pairs, win.select($"win_id"))
        .select($"id".as("win_id"), $"keeper_id")
    }

    val qs = Seq(q39, q56, q57)
      .map { case (n, s, r) => s""""$n":{"sec":$s,"rows":$r}""" }.mkString(",")
    println(s"""{"probe":"dedup_10x","copies":$copies,"n_docs":$nDocs,"sf":"$sfDir","queries":{$qs}}""")
    spark.stop()
  }
}
