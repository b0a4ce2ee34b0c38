package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 re-expressed
  * Spark-first; [[oracleSql]] carries the DuckDB-equivalent ANSI SQL the
  * driver hash-compares against at sf0.01. Column names and ordering are
  * deliberately identical on both sides; float aggregates are rounded and
  * ties broken by key so hashes are stable (SURVEY.md §7.4.4).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Floor-quantize to 4 decimals. Per-row deterministic doubles must NOT use
    * round(): Spark rounds via the shortest decimal repr, DuckDB in binary —
    * they diverge when the repr ends in "…5" at the cut. floor of the same
    * double is bit-stable on both engines (SURVEY.md §7.4.4).
    */
  private def fq4(c: Column): Column = floor(c * 10000.0) / 10000.0

  /** Query-term list shared by the BM25 (q66) and hybrid-RRF (q67) rankers
    * — mirrored literally in their oracle SQL.
    */
  private val Bm25Terms = Seq("join", "vector", "window", "stream")

  /** Fixed BPE merge list shared by q110 and its oracle. The list is
    * PATTERN-COLLISION-FREE by construction so the oracle can express the
    * greedy fold as a chain of non-overlapping string replaces over
    * US-delimited symbols: no merge's `l` is a proper suffix, and no `r` a
    * proper prefix, of any symbol coexisting when that merge applies (e.g.
    * (c,o) would be illegal once (o,n) created "on": `c␟on` must stay
    * [c, on], but the replace would eat `c␟o`). Training-produced lists
    * don't carry this guarantee — the trained path is spec-verified
    * against a plain-Scala reference instead (SpanBpeSpec).
    */
  private val BpeMerges = Seq(
    "t" -> "h", "th" -> "e", "a" -> "n", "i" -> "n", "o" -> "n",
    "an" -> "d", "r" -> "e")

  /** BM25 over the documents table for [[Bm25Terms]] — the library API is
    * [[graft.query.LexicalRetriever.bm25Scores]]; see its doc for the
    * scale shape and the cross-engine float policy.
    */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame =
    graft.query.LexicalRetriever.bm25Scores(
      t(s, dir, "documents"), "doc_id", "text", Bm25Terms)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core retrieval shape (`QA_using_pinecone.py:31-50`):
    * metadata-filtered cosine top-k over the vector index joined back to
    * document text — filter pushed below the score, TakeOrderedAndProject
    * for the top-k, broadcast join for the k-row context assembly.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val emb = t(spark, dir, "embeddings")
    val docs = t(spark, dir, "documents")
    val qv = emb.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray
    val topk = emb
      .filter($"label".isin(0, 1, 2, 3, 4))
      .select($"vec_id",
        fq4(VectorFunctions.cosineSim($"embedding", lit(qv))).as("score"))
      .orderBy($"score".desc, $"vec_id")
      .limit(5)
    topk.join(docs, topk("vec_id") === docs("doc_id"))
      .select($"vec_id", $"score", substring($"text", 1, 80).as("context"))
      .orderBy($"score".desc, $"vec_id")
  }

  // ---------------------------------------------------------------------
  // Operator queries (SURVEY.md §2). Names are stable driver-facing ids.
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1-analog pricing summary: partial+final hash agg, one shuffle on the
    // two grouping keys (TPC-H Q1 shape).
    "q01_pricing_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("sum_disc_price"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // J1: FK equi-join user→chats analog (customer ⋈ orders ⋈ nation);
    // nation broadcast (tiny dim), orders⋈customer shuffle-hash on key.
    "q02_nation_revenue" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val n = t(s, dir, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("total_price"))
        .orderBy($"n_name")
    }),

    // J3 semi-join: registration duplicate-check analog (`main.py:36-38`).
    "q03_customers_with_orders" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // J2/U2 anti-join: insert-if-absent / delete-by-predicate analog
    // (`pipeline2.py:315-331`).
    "q04_customers_without_orders" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // W7 top-k: plans as TakeOrderedAndProject — no full sort at scale.
    "q05_top_orders" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    }),

    // P6 IN-list predicate (`QA_using_pinecone.py:41` metadata filter).
    "q06_segment_filter" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .filter($"c_mktsegment".isin("BUILDING", "AUTOMOBILE"))
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    // W1/P9: row numbering + id synthesis `FormName + "_" + index`
    // (`pipeline1.py:700`, `pipeline2.py:130-132`).
    "q07_order_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("order_tag",
          concat($"o_custkey".cast("string"), lit("_"), $"rn".cast("string")))
        .select($"o_orderkey", $"o_custkey", $"rn", $"order_tag")
        .orderBy($"o_orderkey")
    }),

    // W2 running sum (`CummulativeTokenCount`, `pipeline1.py:139-146`).
    "q08_running_value" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("run_sum", round(sum($"value").over(w), 2))
        .select($"event_id", $"user_id", $"run_sum")
        .orderBy($"event_id")
    }),

    // A2 distinct (`SELECT DISTINCT form_name`, `pipeline2.py:60`).
    "q09_distinct_pairs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"lang", $"source").distinct()
        .orderBy($"lang", $"source")
    }),

    // A1 ordered string-agg: paragraphs joined in-order per section
    // (`pipeline1.py:184-185`); order made explicit via sorted structs.
    "q10_lang_digest" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("snip", substring($"text", 1, 10))
        .groupBy($"lang")
        .agg(expr("array_join(transform(array_sort(collect_list(struct(doc_id, snip))), x -> x.snip), '|')").as("texts"))
        .orderBy($"lang")
    }),

    // P8 derived token counts (engine tokenizer, SURVEY.md §7.4.1).
    "q11_token_stats" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(
          $"doc_id",
          length($"text").cast("long").as("len"),
          TextFunctions.wsTokenCountCol($"text").cast("long").as("ws_tokens"),
          TextFunctions.numTokensCol($"text").cast("long").as("n_tokens"))
        .orderBy($"doc_id")
    }),

    // U1 union (schema-aligned concat, `pipeline1.py:703`).
    "q12_entity_union" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_name".as("name"), lit("customer").as("kind"))
        .unionByName(
          t(s, dir, "supplier").select($"s_name".as("name"), lit("supplier").as("kind")))
        .orderBy($"kind", $"name")
    }),

    // A5 fixed-size batching (`BatchGenerator`, `pipeline2.py:85-102`).
    // Global rank WITHOUT a single-partition window: range partitions +
    // local positions + broadcast offsets (Batching.globalRowNumber) —
    // identical numbering, every stage parallel.
    "q13_upsert_batches" -> ((s, dir) => {
      import s.implicits._
      // project BEFORE ranking: globalRowNumber checkpoints its input to pin
      // one range partitioning, and batching needs only the key — carrying
      // the 64-float vectors through the checkpoint would pay ~64x the IO
      graft.operators.Batching.globalRowNumber(
          t(s, dir, "embeddings").select($"vec_id"), $"vec_id", 32)
        .withColumn("batch", floor(($"rn" - 1) / 300.0).cast("long"))
        .groupBy($"batch")
        .agg(count(lit(1)).as("n"), min($"vec_id").as("first_id"), max($"vec_id").as("last_id"))
        .orderBy($"batch")
    }),

    // W6 offset+limit pagination (`crud.py:32-33`).
    "q14_page" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey")
        .offset(100).limit(20)
    }),

    // W3 classification when-chain (`pipeline1.py:151-162`).
    "q15_doc_class" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(
          $"doc_id",
          when($"n_chars" < 150, "short").when($"n_chars" < 300, "medium")
            .otherwise("long").as("size_class"),
          TextFunctions.classifyMarkdownCol($"text").as("md_class"))
        .orderBy($"doc_id")
    }),

    // P2/P12 regex scrub + extract (`pipeline1.py:114-134`, `383-388`).
    "q16_regex_ops" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(
          $"doc_id",
          regexp_extract($"text", "^(\\w+)", 1).as("first_word"),
          length(regexp_replace($"text", "\\bthe\\b", "")).cast("long").as("scrub_len"))
        .orderBy($"doc_id")
    }),

    // W4 section assignment as pure window expressions — the verified
    // reference state machine (`pipeline1.py:167-179`): pre-heading rows
    // each open a section; a heading opens one absorbing what follows.
    "q17_sections" -> ((s, dir) => {
      import s.implicits._
      val byDoc = Window.partitionBy($"source").orderBy($"doc_id")
      val before = byDoc.rowsBetween(Window.unboundedPreceding, -1)
      val upToHere = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .withColumn("is_heading", ($"n_chars" > 300).cast("int"))
        .withColumn("seen_before", coalesce(max($"is_heading").over(before), lit(0)))
        .withColumn("section",
          sum(when($"is_heading" === 1 || $"seen_before" === 0, 1).otherwise(0))
            .over(upToHere).cast("long"))
        .select($"doc_id", $"source", $"section")
        .orderBy($"doc_id")
    }),

    // A3-analog grouped stats over the events table.
    "q18_event_type_stats" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct($"user_id").as("n_users"),
          round(sum($"value"), 2).as("total_value"))
        .orderBy($"event_type")
    }),

    // W5/P5 newest-first user history (`main.py:73`).
    "q19_user_history" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .filter($"user_id" === 7)
        .orderBy($"ts".desc, $"event_id".desc)
        .select($"event_id", $"event_type", round($"value", 2).as("value"))
        .limit(20)
    }),

    // J5/W7: the reference's whole "query engine" — metadata-filtered
    // cosine top-k (`QA_using_pinecone.py:31-44`). Filter sits below the
    // score; top-k is TakeOrderedAndProject, never a full sort.
    "q20_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val qv = emb.filter($"vec_id" === 0).select($"embedding")
        .head().getSeq[Float](0).toArray
      emb.filter($"label".isin(0, 1, 2, 3, 4))
        .select($"vec_id",
          fq4(VectorFunctions.cosineSim($"embedding", lit(qv))).as("score"))
        .orderBy($"score".desc, $"vec_id")
        .limit(5)
    }),

    // A3/A4 index stats: counts + dimension probe (`pipeline2.py:134`,
    // `161-164`).
    "q21_label_stats" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .groupBy($"label")
        .agg(count(lit(1)).as("n"), min(size($"embedding")).cast("long").as("dim"))
        .orderBy($"label")
    }),

    // Exact dedup by content hash (north-star op; MD5 is byte-identical
    // across engine and oracle).
    "q22_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy(md5($"text").as("content_hash"))
        .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper_doc_id"))
        .orderBy($"keeper_doc_id")
    }),

    // C1/C2 distributed: greedy token-budget packing per form (source) —
    // ONE columnar shuffle (repartition + within-partition sort), packer
    // streams the sorted per-form runs. Replayed exactly by the
    // recursive-CTE oracle below.
    "q23_chunk_pypdf" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"source".as("formName"), $"doc_id".as("seq"), $"text")
        .as[graft.operators.ChunkingJob.DocInput]
      graft.operators.ChunkingJob.chunkPyPdf(docs, tokenLimit = 200)
        .toDF().orderBy($"FormName", $"ChunkId", $"Content")
    }),

    // C3/C4 distributed: nougat sectionize → section packing → oversized
    // split with heading carry. Rows-only.
    "q24_chunk_nougat" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"source".as("formName"), $"doc_id".as("seq"), $"text")
        .as[graft.operators.ChunkingJob.DocInput]
      graft.operators.ChunkingJob.chunkNougat(docs, tokenLimit = 200)
        .toDF().orderBy($"FormName", $"ChunkId")
    }),

    // MinHash signatures (4 hashes over 5-char shingles) — scan-side only.
    "q25_minhash_sig" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Dedup.minhashSig(t(s, dir, "documents"), "text", 4, 5)
        .select($"doc_id",
          element_at($"minhash", 1).as("mh0"), element_at($"minhash", 2).as("mh1"),
          element_at($"minhash", 3).as("mh2"), element_at($"minhash", 4).as("mh3"))
        .orderBy($"doc_id")
    }),

    // 32-bit SimHash over whitespace tokens.
    "q26_simhash" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Dedup.simhash32(t(s, dir, "documents"), "text", "simhash")
        .select($"doc_id", $"simhash".cast("long").as("simhash"))
        .orderBy($"doc_id")
    }),

    // Exact 5-gram Jaccard between consecutive documents (near-dup verify).
    "q27_jaccard_pairs" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val a = d.as("a"); val b = d.as("b")
      a.join(b, col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          (floor(graft.operators.Dedup.jaccard(col("a.text"), col("b.text"), 5) * 10000.0) / 10000.0).as("jac"))
        .orderBy($"id_a")
    }),

    // Language-ID heuristic + composite quality score (training-data ops).
    // Native single-loop expression; the HOF twin (languageIdFromTokens +
    // qualityScoreFromTokens) is value-identical and spec-pinned.
    "q28_lang_quality" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("lq", graft.operators.TextAnalysis.langQualityCol($"text"))
        .select($"doc_id",
          $"lq.lang_pred".as("lang_pred"), $"lq.quality".as("quality"))
        .orderBy($"doc_id")
    }),

    // Rolling word-3-gram fingerprint (min stable hash — winnowing flavor).
    "q29_fingerprint" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", graft.operators.TextAnalysis.fingerprint($"text").as("fp"))
        .orderBy($"doc_id")
    }),

    // Brute-force ANN baseline: 3 query vectors × corpus, per-query top-3 by
    // cosine (queries broadcast; corpus scanned once).
    "q30_ann_brute" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter($"vec_id".isin(0, 1, 2))
        .select($"vec_id".as("query_id"), $"embedding")
      graft.operators.SimilaritySearch.bruteForceTopK(emb, queries, 3)
        .select($"query_id", $"neighbor_id", fq4($"score").as("score"),
          $"rank".cast("long").as("rank"))
        .orderBy($"query_id", $"rank")
    }),

    // Sign-LSH bucketing (the ANN scale path): 4 deterministic hyperplanes
    // → 16 buckets, computed at scan time.
    "q31_lsh_buckets" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .withColumn("bucket",
          graft.operators.SimilaritySearch.signBucket($"embedding", 64, 4).cast("long"))
        .groupBy($"bucket").agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    }),

    // IVF ANN (the learned-bucket scale path): 8 deterministic seed
    // centroids (k lowest ids, iters=0 so the oracle sidesteps float-mean
    // aggregation-order nondeterminism; Lloyd refinement is spec-covered),
    // nprobe=2 — corpus scanned once, probe is a centroid equi-join,
    // per-cell top-k windows. ~k/nprobe of the corpus scored per query.
    "q32_ivf_ann" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter($"vec_id".isin(0, 1, 2))
        .select($"vec_id".as("query_id"), $"embedding")
      val cents = graft.operators.IvfIndex.centroids(emb, k = 8, iters = 0)
      graft.operators.IvfIndex.topK(emb, queries, cents, k = 3, nprobe = 2)
        .select($"query_id", $"neighbor_id", fq4($"score").as("score"),
          $"rank".cast("long").as("rank"))
        .orderBy($"query_id", $"rank")
    }),

    // J4 existence probe per group, as a grouped flag — not a full scan.
    "q33_exists_probe" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy($"source")
        .agg(max(when($"n_chars" > 350, 1).otherwise(0)).cast("long").as("has_large"),
          count(lit(1)).as("n_docs"))
        .orderBy($"source")
    }),

    // Pipeline 1 end-to-end (rows-only): chunk → deterministic embed via
    // mapPartitions batches → chunk table with vector dims. The embedder is
    // wrapped in the production failure policy (ResilientEmbedder: retry +
    // per-row lenient blanking) exactly as the HTTP stack composes it.
    "q34_embed_pipeline" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"source".as("formName"), $"doc_id".as("seq"), $"text")
        .as[graft.operators.ChunkingJob.DocInput]
      val chunks = graft.operators.ChunkingJob.chunkPyPdf(docs, tokenLimit = 200).toDF()
      graft.embed.EmbeddingJob
        .embedColumn(chunks, "Content",
          new graft.embed.ResilientEmbedder(new graft.embed.DeterministicEmbedder(16)))
        .select($"FormName", $"ChunkId", $"TokenCount", size($"Embeddings").cast("long").as("dim"))
        .orderBy($"FormName", $"ChunkId", $"TokenCount")
    }),

    // The reference's /askQuestion path end-to-end (rows-only): question
    // embedded deterministically, title-filtered cosine top-k over the
    // index shape (J5+W7+P6).
    "q35_retrieval_e2e" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
      val index = emb.join(docs, emb("vec_id") === docs("doc_id"))
        .select($"vec_id".cast("string").as("vector_id"),
          $"embedding".as("content_vector"), $"source".as("title"), $"text")
      val qv = new graft.embed.DeterministicEmbedder(64)
        .embedOne("how do i join two large tables")
      graft.query.Retriever
        .topK(index, qv, Seq("src0", "src1", "src2", "src3", "src4"), k = 5)
        .select($"vector_id", $"title", fq4($"score").as("score"))
    }),

    // Multimodal plumbing: opaque binary column + batch-wise stub decode in
    // mapPartitions (real codec would swap in); metadata is md5-derived so
    // the oracle can check the full path.
    "q36_multimodal_meta" -> ((s, dir) => {
      import s.implicits._
      val withBin = t(s, dir, "documents")
        .select($"doc_id", $"text".cast("binary").as("media"))
      graft.operators.Multimodal.extractMeta(withBin, "media")
        .select($"doc_id",
          $"media_meta.byte_length".as("byte_length"),
          $"media_meta.content_md5".as("content_md5"),
          // text bytes are not an image: the ImageIO-first decoder falls
          // back to the md5 stub, so these stay the oracle's pseudo-dims
          $"media_meta.width".cast("long").as("fake_width"),
          $"media_meta.height".cast("long").as("fake_height"))
        .orderBy($"doc_id")
    }),

    // Pipeline-2 index + stats-mirror lifecycle: upsert three forms and
    // mirror them into the stats table → delete one form by title (index +
    // mirror) → delete two ids → delete ALL of one form's vectors by id →
    // prune mirror rows whose vectors are gone. Parquet-table rewrites with
    // anti-join deletes (U2), id minting per title (P9), versioned
    // pointer-swap snapshots under the hood. Mirror states are materialized
    // per step (≤3 rows — the stats table is a handful of rows per the
    // reference's `vectordatabasestats`).
    "q37_index_lifecycle" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_index").toString
      val idx = new graft.index.VectorIndex(s, s"$tmp/index")
      val emb = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
      val records = emb.join(docs, emb("vec_id") === docs("doc_id"))
        .filter($"source".isin("src0", "src1", "src2"))
        .select($"source".as("title"), $"text", $"embedding".as("content_vector"),
          $"doc_id")
      idx.upsert(records, "doc_id")
      // stats mirror: insert-if-absent against an empty catalog (J2)
      val empty = Seq.empty[String].toDF("form_name")
      var mirror = graft.query.AppQueries
        .newForms(empty, idx.stats.select($"title".as("form_name")))
        .as[String].collect().toSeq.toDF("form_name")
      idx.deleteByForms(Seq("src2"))
      mirror = graft.query.AppQueries.mirrorDeleteForms(mirror, Seq("src2"))
        .as[String].collect().toSeq.toDF("form_name")
      val victims = idx.read.filter($"title" === "src0")
        .orderBy($"vector_id").limit(2)
        .select($"vector_id").as[String].collect().toSeq
      // ...and empty src1 out BY IDS (not by form) so the mirror goes
      // stale; one id-delete rewrite covers both
      val gone = idx.idsForForms(Seq("src1")).as[String].collect().toSeq
      idx.deleteByIds(victims ++ gone)
      // ...and prune-orphans brings it back in sync (`pipeline2.py:354-367`)
      val mirrorTitles = graft.query.AppQueries
        .pruneOrphans(mirror, idx.read.select($"title"))
        .as[String].collect().toSeq
      val statRows = idx.stats.orderBy($"title")
        .as[(String, Long)].collect().toSeq
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      (statRows.map { case (t0, n) => ("index", t0, n) } ++
        mirrorTitles.sorted.map(t0 => ("mirror", t0, 1L)))
        .toDF("kind", "title", "n")
    }),

    // P7 validation predicates (email + lookahead-free password rule) over
    // synthesized candidates.
    "q38_validation" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .select($"c_custkey",
          concat(lower(regexp_replace($"c_name", "[^A-Za-z0-9]", "")),
            when($"c_custkey" % 3 === 0, "@example.org").otherwise("@example.com")).as("email_cand"),
          when($"c_custkey" % 2 === 0, regexp_replace($"c_name", "#", ""))
            .otherwise($"c_name").as("password_cand"))
        .withColumn("email_ok",
          graft.functions.TextFunctions.emailValidCol($"email_cand").cast("int"))
        .withColumn("password_ok",
          graft.functions.TextFunctions.passwordValidCol($"password_cand").cast("int"))
        .orderBy($"c_custkey")
    }),

    // MinHash+LSH near-dup end-to-end: 8-hash signatures over 4-char
    // shingles -> 4 bands x 2 rows -> candidate pairs by band-hash equi-join
    // (ONE shuffle, never all-pairs) -> estimated-Jaccard verify >= 0.5.
    "q39_neardup_lsh" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Dedup.nearDupPairs(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.5)
        .orderBy($"id_a", $"id_b")
    }),

    // Embedding-cosine near-dup inside sign-LSH buckets: bucket equi-join
    // (not all-pairs), cosine verify > 0.3.
    "q40_embed_neardup" -> ((s, dir) => {
      import s.implicits._
      val b = t(s, dir, "embeddings")
        .withColumn("bucket",
          graft.operators.SimilaritySearch.signBucket($"embedding", 64, 4).cast("long"))
        .select($"vec_id", $"embedding", $"bucket")
      val a = b.select($"vec_id".as("id_a"), $"embedding".as("emb_a"), $"bucket")
      val c = b.select($"vec_id".as("id_b"), $"embedding".as("emb_b"), $"bucket")
      a.join(c, Seq("bucket")).filter($"id_a" < $"id_b")
        .withColumn("score",
          graft.functions.VectorFunctions.cosineSim($"emb_a", $"emb_b"))
        .filter($"score" > 0.3)
        .select($"id_a", $"id_b", fq4($"score").as("score"))
        .orderBy($"id_a", $"id_b")
    }),

    // Fact-fact shuffle join + calendar rollup (J1 at fact scale; AQE picks
    // the join strategy, aggregation is partial+final).
    "q41_monthly_revenue" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_items"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
        .orderBy($"month")
    }),

    // Mergeable MinHash union via a typed Aggregator: per-source signature =
    // element-wise min of member signatures (partial+final composes exactly).
    "q42_source_signature" -> ((s, dir) => {
      import s.implicits._
      // element-wise min per component stays in codegen (partial+final
      // hash agg); the typed MinHashUnionAgg Aggregator is the library API
      // for streaming/hierarchical merges (SparkOpsSpec covers it)
      graft.operators.Dedup.minhashSig(t(s, dir, "documents"), "text", 4, 5)
        .groupBy($"source")
        .agg(min(element_at($"minhash", 1)).as("mh0"),
          min(element_at($"minhash", 2)).as("mh1"),
          min(element_at($"minhash", 3)).as("mh2"),
          min(element_at($"minhash", 4)).as("mh3"))
        .orderBy($"source")
    }),

    // Skew-safe two-phase (salted) aggregation: partial agg on
    // (key, salt = id % 8), final agg on key — result identical to the
    // direct group-by, shuffle skew bounded by 8x fan-out.
    "q43_salted_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("salt", ($"event_id" % 8).cast("int"))
        .groupBy($"event_type", $"salt")
        .agg(count(lit(1)).as("pc"), sum($"value").as("ps"))
        .groupBy($"event_type")
        .agg(sum($"pc").as("n"), round(sum($"ps"), 2).as("total_value"))
        .orderBy($"event_type")
    }),

    // Skew-safe salted equi-join (deterministic salt from event_id; small
    // side replicated saltFactor times) — row-identical to the plain join.
    "q44_salted_join" -> ((s, dir) => {
      import s.implicits._
      val events = t(s, dir, "events")
      val dim = events.select($"event_type").distinct()
        .withColumn("type_tag", concat(lit("t:"), $"event_type"))
      graft.operators.Salting.saltedJoin(events, dim, "event_type", $"event_id", 8)
        .groupBy($"event_type", $"type_tag")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .orderBy($"event_type")
    }),

    // C6 end-to-end /askQuestion: deterministic question embedding, filtered
    // top-k, context assembly with the reference's exact prompt shape
    // (`QA_using_pinecone.py:45-55`). Rows-only (context is engine-defined).
    "q45_ask_context" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
      val index = emb.join(docs, emb("vec_id") === docs("doc_id"))
        .select($"vec_id".cast("string").as("vector_id"),
          $"embedding".as("content_vector"), $"source".as("title"),
          substring($"text", 1, 60).as("text"))
      val question = "which table has the highest aggregate value"
      val (hits, context) = graft.query.Retriever.ask(
        index, question, Seq("src1", "src3", "src5"),
        new graft.embed.DeterministicEmbedder(64), k = 2)
      val ids = hits.select($"vector_id").as[String].collect().toSeq
      Seq((question, ids.mkString(","), context)).toDF("question", "top_ids", "context")
    }),

    // Multi-level aggregation (rollup): per-type and grand-total in one
    // pass (Expand + partial/final agg).
    "q46_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .rollup($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .select(coalesce($"event_type", lit("ALL")).as("event_type"), $"n", $"total_value")
        .orderBy($"event_type")
    }),

    // Pivot: per-user event-type counts as columns (conditional-agg form in
    // the oracle — the classic pivot lowering).
    "q47_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .filter($"user_id" < 10)
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "view", "error", "signup", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"user_id")
    }),

    // Tumbling 1-hour event-time buckets (batch form of the streaming
    // window; ts is epoch-nanos — see Tables.load).
    "q48_hourly" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("hour_bucket", floor($"ts" / 3600000000000L).cast("long"))
        .groupBy($"hour_bucket")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .orderBy($"hour_bucket")
    }),

    // As-of join composed from union + ordered window (one shuffle on the
    // key): each error event picks up the user's most recent prior click
    // value. Oracle uses DuckDB's native ASOF LEFT JOIN.
    "q49_asof" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"value")
      graft.operators.AsOfJoin.lastPriorValue(errors, clicks, "user_id", "ts", "value")
        .select($"event_id", $"user_id", round($"asof_value", 2).as("last_click_value"))
        .orderBy($"event_id")
    }),

    // ApplicationLog analog (`pipeline1.py:296-313`): one correlation id per
    // run, structured rows through a CollectionAccumulator (executor-safe),
    // then an aggregation over the run's log — counts per component/status,
    // n_runs proves every row carries the run's single correlation id.
    // Deterministic details derive from the documents table so the oracle
    // can recompute the expected matrix.
    "q51_app_log" -> ((s, dir) => {
      import s.implicits._
      val log = graft.query.ApplicationLog(s)
      val docs = t(s, dir, "documents")
      val perForm = docs.groupBy($"source")
        .agg(count(lit(1)).as("n"), max($"n_chars").as("mx"))
        .orderBy($"source")
        .collect()
      perForm.foreach { r =>
        val (src, n, mx) = (r.getString(0), r.getLong(1), r.getLong(2))
        log.log("pipeline1", "Info", s"extracted $src")
        log.log("pipeline1", "Info", s"chunked $src n=$n")
        if (mx > 350) log.log("pipeline1", "Error", s"oversized paragraph in $src")
      }
      log.log("pipeline2", "Info", s"indexed ${perForm.map(_.getLong(1)).sum} docs")
      log.toDF
        .groupBy($"Application_Component".as("component"),
          $"Application_LogStatus".as("log_status"))
        .agg(count(lit(1)).as("n_entries"),
          countDistinct($"Application_LogCorrelationID").as("n_runs"))
        .orderBy($"component", $"log_status")
    }),

    // Multimodal frame sampling: video-like binary rows explode 1→N into
    // frame rows batch-wise (stub decode; real 1→N plumbing). frame_md5 is
    // md5(content_md5:idx) so the oracle replays the whole path.
    "q54_multimodal_frames" -> ((s, dir) => {
      import s.implicits._
      val withBin = t(s, dir, "documents")
        .select($"doc_id", $"text".cast("binary").as("media"))
      graft.operators.Multimodal.sampleFrames(withBin, "media", strideBytes = 200, maxFrames = 4)
        .select($"doc_id", $"frame_idx", $"frame_md5")
        .orderBy($"doc_id", $"frame_idx")
    }),

    // Multi-probe sign-LSH ANN: each query probes its own bucket plus all
    // Hamming-1 neighbors (planes+1 probes) — only the broadcast QUERY side
    // replicates; the corpus is scanned once, joined by bucket equi-join,
    // top-k window spans the probed buckets.
    "q52_ann_multiprobe" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter($"vec_id".isin(0, 1, 2))
        .select($"vec_id".as("query_id"), $"embedding")
      graft.operators.SimilaritySearch.lshTopKMultiProbe(emb, queries, 3, 64, 4)
        .select($"query_id", $"neighbor_id", fq4($"score").as("score"),
          $"rank".cast("long").as("rank"))
        .orderBy($"query_id", $"rank")
    }),

    // Near-dup cluster resolution: full-signature-agreement LSH pairs
    // (est_jac = 1.0 — the "same document" candidates; looser thresholds on
    // this templated corpus collapse into one giant component) → connected
    // components by iterative min-label propagation (one join shuffle per
    // round, localCheckpoint'ed labels, O(diameter) rounds) → every doc
    // mapped to its component's minimum id as the dedup keeper.
    "q53_dedup_resolve" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.nearDupPairs(
        docs, "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 1.0)
      graft.operators.Dedup.resolveClusters(pairs, docs.select($"doc_id"))
        .select($"id".as("doc_id"), $"keeper_id")
        .orderBy($"doc_id")
    }),

    // Mid-range near-dup cluster resolution: the corpus is sliced into 3
    // overlapping windows per document (stride n/8, width n/2), so adjacent
    // windows of one document land in the 0.5 ≤ est_jac < 1 band while the
    // outer pair usually does not — chains A~B~C with A≁C that min-label
    // propagation must actually ITERATE to resolve (≥2 rounds; q53's
    // exact-dup components collapse in one). Same bucketed LSH candidate
    // path as q39; edges filtered to the mid-range band before resolution.
    "q57_dedup_midrange" -> ((s, dir) => {
      import s.implicits._
      val win = t(s, dir, "documents")
        .filter($"doc_id" < 200)
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
        .orderBy($"win_id")
    }),

    // Deterministic train/val/test corpus split — the standard LLM-pipeline
    // split op done hash-stable instead of random: bucket = stable 60-bit
    // md5 hash of a salted doc id mod 100, 80/10/10 assignment. Scan-side
    // (no shuffle until the stats agg), reproducible across engines and
    // runs, and immune to re-partitioning — the properties a 100 TB split
    // needs. Output: per (source, split) doc and token counts.
    "q58_hash_split" -> ((s, dir) => {
      import s.implicits._
      val bucket = pmod(graft.functions.HashFunctions
        .stableHash64(concat(lit("split:"), $"doc_id".cast("string"))), lit(100L))
      t(s, dir, "documents")
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.numTokensCol($"text")).cast("long").as("n_tokens"))
        .orderBy($"source", $"split")
    }),

    // Training-sequence packing: documents greedily packed in corpus order
    // into <= 500-token sequences per source (never splitting a document;
    // an oversized document gets its own sequence) — the standard LLM
    // pretraining batch-construction op, one shuffle + streamed fold.
    // Oracle replays the greedy fold as a recursive CTE.
    "q59_sequence_pack" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"source".as("formName"), $"doc_id".as("seq"), $"text")
        .as[graft.operators.ChunkingJob.DocInput]
      graft.operators.SequencePacker.packBySource(docs, tokenBudget = 500)
        .groupBy($"source", $"seq_no")
        .agg(count(lit(1)).as("n_docs"),
          sum($"doc_tokens").cast("long").as("seq_tokens"))
        .orderBy($"source", $"seq_no")
    }),

    // Eval-set decontamination — the canonical pre-training hygiene op:
    // training documents sharing ANY word 4-gram with a held-out eval set
    // (docs with doc_id % 83 == 7 here) are flagged with their overlap
    // count. Grams are computed scan-side by the native word_ngrams
    // expression; the eval gram set is tiny by construction (eval sets are
    // benchmarks, not corpora) and BROADCAST, so the contamination probe is
    // one corpus scan + a broadcast hash join — no shuffle of the corpus at
    // 100 TB. Gram size 4 on this corpus (uniform draws over a small word
    // vocabulary) flags a selective non-empty set — 5-grams never collide,
    // 3-grams flag half the corpus; real pipelines tune n the same way.
    "q60_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val grams = t(s, dir, "documents")
        .select($"doc_id",
          explode(graft.operators.TextAnalysis.wordNGrams($"text", 4)).as("g"))
      val evalGrams = grams.filter($"doc_id" % 83 === 7).select($"g").distinct()
      grams.filter($"doc_id" % 83 =!= 7)
        .join(broadcast(evalGrams), Seq("g"))
        .groupBy($"doc_id")
        .agg(countDistinct($"g").cast("long").as("n_shared"))
        .orderBy($"doc_id")
    }),

    // Gopher-style repetition quality filter: per-document duplicate-line
    // fraction and most-common-token fraction, with the keep decision
    // (dup_line_frac <= 0.3 AND top_tok_frac <= 0.2). Line metrics are pure
    // scan-side array ops; token metrics are explode → two partial+final
    // aggs keyed by (doc, token) then doc — the standard distributed shape
    // for per-doc token histograms (no per-doc collect, skew-safe).
    "q61_repetition_filter" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val lineStats = d.select($"doc_id",
          filter(split($"text", "\n"), x => length(trim(x)) > 0).as("ls"))
        .select($"doc_id",
          size($"ls").cast("long").as("n_lines"),
          size(array_distinct($"ls")).cast("long").as("n_distinct_lines"))
      val tokStats = d
        .select($"doc_id", explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
        .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(max($"c").as("maxc"), sum($"c").as("ntok"))
      lineStats.join(tokStats, Seq("doc_id"), "left")
        .select($"doc_id", $"n_lines", $"n_distinct_lines",
          fq4(when($"n_lines" > 0,
              lit(1.0) - $"n_distinct_lines".cast("double") / $"n_lines")
            .otherwise(lit(0.0))).as("dup_line_frac"),
          fq4(coalesce($"maxc".cast("double") / $"ntok", lit(0.0))).as("top_tok_frac"))
        .withColumn("keep",
          ($"dup_line_frac" <= 0.3 && $"top_tok_frac" <= 0.2).cast("int"))
        .orderBy($"doc_id")
    }),

    // Deterministic per-source mixture sampling — domain weighting without
    // randomness: each source gets a reproducible rate (basis points derived
    // from a salted stable hash of the source name), each doc keeps iff its
    // own salted hash falls under the rate. Scan-side decisions (no shuffle
    // until the audit agg), reproducible across engines, runs and
    // partitionings — re-running the pipeline on a re-bucketed 100 TB corpus
    // selects the SAME documents.
    "q62_source_mix" -> ((s, dir) => {
      import s.implicits._
      val rateBp = lit(2000L) + pmod(graft.functions.HashFunctions
        .stableHash64(concat(lit("mix:"), $"source")), lit(7000L))
      val kept = pmod(graft.functions.HashFunctions
        .stableHash64(concat(lit("sample:"), $"doc_id".cast("string"))), lit(10000L)) < rateBp
      t(s, dir, "documents")
        .select($"source", rateBp.as("rate_bp"), kept.cast("int").as("kept"))
        .groupBy($"source", $"rate_bp")
        .agg(count(lit(1)).as("n_docs"), sum($"kept").cast("long").as("n_kept"))
        .orderBy($"source")
    }),

    // Corpus vocabulary top-k — the tokenizer-training primitive: global
    // token frequencies, top 20 with a deterministic tie-break. ONE shuffle
    // (partial+final count keyed by token — the map-side combine collapses
    // each partition to its distinct tokens before the exchange) and a
    // TakeOrderedAndProject; at 100 TB the shuffle carries vocabulary-sized
    // data, not corpus-sized.
    "q63_vocab_topk" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(explode(graft.operators.TextAnalysis.tokensCol($"text")).as("token"))
        .groupBy($"token").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token").limit(20)
    }),

    // PII redaction — pre-training scrub of emails and phone numbers to
    // typed placeholders, with a per-row redaction count for audit. Pure
    // scan-side regexp_replace (codegen'd, no shuffle); patterns chosen to
    // behave identically in Java regex and RE2 so the oracle reproduces the
    // scrub byte-for-byte. PII is synthesized from the customer table
    // (name-derived email; key-derived phone present for 2/3 of rows) since
    // the documents corpus contains none.
    "q64_pii_scrub" -> ((s, dir) => {
      import s.implicits._
      val phone = format_string("%02d-%03d-%03d-%04d",
        ($"c_nationkey" + 10).cast("int"),
        (lit(100) + $"c_custkey" % 900).cast("int"),
        (lit(100) + ($"c_custkey" * 7) % 900).cast("int"),
        (lit(1000) + ($"c_custkey" * 13) % 9000).cast("int"))
      val raw = concat(
        lit("contact "), lower(regexp_replace($"c_name", "[^A-Za-z0-9]", "")),
        lit("@corp.example"),
        when($"c_custkey" % 3 =!= 0, concat(lit(" ph "), phone)).otherwise(lit("")),
        lit(" end"))
      t(s, dir, "customer")
        .select($"c_custkey",
          regexp_replace(
            regexp_replace(raw, raw"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
            raw"\d{2}-\d{3}-\d{3}-\d{4}", "<PHONE>").as("scrubbed"))
        .withColumn("n_redacted",
          ((size(split($"scrubbed", "<EMAIL>", -1)) - 1) +
           (size(split($"scrubbed", "<PHONE>", -1)) - 1)).cast("long"))
        .orderBy($"c_custkey")
    }),

    // Gap-based sessionization over the events stream table (6 h inactivity
    // gap; ts is epoch-nanos — Tables.load). The lag and the running sum
    // share one Window partitioning, and the per-session rollup groups on
    // (user, session_seq) whose clustering the user-hash Exchange already
    // satisfies — ONE shuffle end to end, plan-pinned. The streaming twin
    // (StatefulOps.streamingSessionize) closes the same sessions on the
    // watermark; their session numbering provably agrees.
    "q65_sessionize" -> ((s, dir) => {
      import s.implicits._
      // µs domain on BOTH sides: the parquet carries TIMESTAMP(NANOS) but
      // DuckDB truncates to µs on read, so gap decisions and outputs must
      // be µs to agree. Integer `div` — a double division of epoch-nano
      // longs (~1.7e18 > 2^53) silently loses the low bits.
      graft.operators.Sessionize.sessionSummary(
          t(s, dir, "events")
            .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"), $"value"),
          "user_id", "ts_us", "event_id", "value", gap = 21600000000L)
        .select($"user_id", $"session_seq", $"n_events",
          $"start_ts".as("start_us"), $"dur".as("dur_us"), $"total_value")
        .orderBy($"user_id", $"session_seq")
    }),

    // BM25 lexical top-k retrieval (k1=1.2, b=0.75) — the lexical
    // complement of the cosine ANN family. Per-term tf and the document
    // length are SCAN-SIDE array ops on the tokens (the query's term list
    // is a literal, so no explode and no (doc, term) shuffle exists at
    // all); the corpus-global stats (N, avgdl, per-term df) are one
    // single-row aggregate cross-joined back as a broadcast. Two corpus
    // scans total — inherent, idf is corpus-global — then a pure scan-side
    // score and a TakeOrderedAndProject top-k. At 100 TB nothing shuffles
    // but one stats row. idf is floor-quantized at 1e-4 so the only
    // transcendental (ln) can't flip the hash across engines; everything
    // else is exact integer-derived double math mirrored operation-for-
    // operation in the oracle.
    "q66_bm25" -> ((s, dir) => {
      import s.implicits._
      bm25Scores(s, dir)
        .select($"doc_id", fq4($"score").as("score"))
        .orderBy($"score".desc, $"doc_id").limit(10)
    }),

    // Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25 lexical
    // ranking and the cosine vector ranking for the same information need
    // (query vec_id 0's embedding; doc_id and vec_id are aligned 1:1 in
    // the testdata). Each side is reduced to its top 20 FIRST via
    // TakeOrderedAndProject — rank positions are then assigned on k-row
    // results (single-partition window over 20 rows, not the corpus), the
    // standard scale shape for fusing rankers. Missing-from-one-list docs
    // contribute 0 from that list (full outer join + coalesce), per the
    // RRF paper's convention. The fuse itself plans as a SortMergeJoin —
    // Spark cannot broadcast a full-outer join — but both inputs are
    // top-k-bounded (20 rows each at ANY corpus size), so the exchange it
    // sorts is k rows, not data.
    "q67_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      val lexTop = bm25Scores(s, dir)
        .orderBy($"score".desc, $"doc_id").limit(20)
        .withColumn("lex_rank",
          row_number().over(Window.orderBy($"score".desc, $"doc_id")).cast("long"))
      val emb = t(s, dir, "embeddings")
      val qv = emb.filter($"vec_id" === 0).select($"embedding")
        .head().getSeq[Float](0).toArray
      val vecTop = emb.filter($"vec_id" =!= 0)
        .select($"vec_id".as("doc_id"),
          VectorFunctions.cosineSim($"embedding", lit(qv)).as("vscore"))
        .orderBy($"vscore".desc, $"doc_id").limit(20)
        .withColumn("vec_rank",
          row_number().over(Window.orderBy($"vscore".desc, $"doc_id")).cast("long"))
      graft.query.LexicalRetriever.rrfFuse(
          lexTop.select($"doc_id", $"lex_rank"),
          vecTop.select($"doc_id", $"vec_rank"),
          "doc_id", "lex_rank", "vec_rank")
        .orderBy($"rrf".desc, $"doc_id").limit(10)
    }),

    // Paragraph-level exact dedup with document reconstruction (the CCNet
    // move: drop every repeated paragraph, keep its first occurrence by
    // (doc, position), rebuild documents from what survives). The testdata
    // documents are single-line, so "paragraphs" here are fixed 3-token
    // segments — ~19% of segments repeat across this corpus, exercising
    // the real cross-document path. Scale shape: posexplode at the scan,
    // ONE shuffle keyed by paragraph content for the first-occurrence
    // window, then the per-doc rebuild groups on doc_id (second, doc-keyed
    // shuffle) using the q10 ordered-collect idiom. No self-join, no
    // corpus² anything; the paragraph-hash exchange is the canonical
    // distributed shape for this op.
    "q68_paragraph_dedup" -> ((s, dir) => {
      import s.implicits._
      val pars = t(s, dir, "documents")
        .select($"doc_id", graft.operators.TextAnalysis.tokensCol($"text").as("tk"))
        .filter(size($"tk") > 0)
        .select($"doc_id", posexplode(transform(
          sequence(lit(0), ((size($"tk") + 2) / 3).cast("int") - 1),
          i => array_join(slice($"tk", i * 3 + 1, lit(3)), " "))))
        .select($"doc_id", ($"pos" + 1).as("idx"), $"col".as("p"))
      graft.operators.ParagraphDedup.dedupSummary(pars, "doc_id", "idx", "p")
        .orderBy($"doc_id")
    }),

    // C4/Gopher-style composite quality filter: token count bounds, mean
    // token length band, and stopword presence — the rule family every
    // pre-training corpus pass applies before anything expensive runs.
    // All metrics are scan-side array ops on the tokens (no explode, no
    // shuffle at all before the final ORDER BY); decisions compare exact
    // integer-derived ratios so they reproduce bit-for-bit in the oracle.
    // Thresholds sit inside this corpus's observed distribution (n_tok
    // 5%-95% spans 16-94, ~9% of docs have zero stopwords) so both keep
    // outcomes occur.
    "q70_quality_filter" -> ((s, dir) => {
      import s.implicits._
      val stopAny = graft.operators.TextAnalysis.Markers("en").map(_.asInstanceOf[Any])
      t(s, dir, "documents")
        .select($"doc_id", graft.operators.TextAnalysis.tokensCol($"text").as("tk"))
        .select($"doc_id",
          size($"tk").cast("long").as("n_tok"),
          aggregate($"tk", lit(0), (acc, x) => acc + length(x)).cast("long").as("sum_len"),
          size(filter($"tk", x => x.isin(stopAny: _*))).cast("long").as("n_stop"))
        .select($"doc_id", $"n_tok",
          fq4($"sum_len".cast("double") / $"n_tok").as("mean_len4"),
          fq4($"n_stop".cast("double") / $"n_tok").as("frac_stop4"),
          ($"n_tok" >= 20 && $"n_tok" <= 80 && $"n_stop" > 0 &&
            $"sum_len".cast("double") / $"n_tok" >= 3.0 &&
            $"sum_len".cast("double") / $"n_tok" <= 6.0).cast("int").as("keep"))
        .orderBy($"doc_id")
    }),

    // Per-document tf-idf keyword extraction (top 3): the classic
    // summarization/labeling primitive. Shape: one (doc, token) partial+
    // final count (the map-side combine collapses each partition's token
    // stream before the exchange), the vocabulary-sized df table broadcast
    // back, then a per-doc window over the ALREADY-REDUCED (doc, token)
    // rows — the second shuffle carries distinct doc-term pairs, not the
    // token stream. idf quantizes the transcendental at 1e-6 and ranking
    // uses the quantized score on both sides, so order ties break
    // identically (then by token).
    "q71_tfidf_keywords" -> ((s, dir) => {
      import s.implicits._
      val tf = t(s, dir, "documents")
        .select($"doc_id", explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
        .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
      val dft = tf.groupBy($"w").agg(count(lit(1)).cast("double").as("df"))
      val nd = t(s, dir, "documents").agg(count(lit(1)).cast("double").as("n_docs"))
      tf.join(broadcast(dft), Seq("w"))
        .crossJoin(broadcast(nd))
        .withColumn("idf", floor(log($"n_docs" / $"df") * 1000000.0) / 1000000.0)
        .withColumn("score", fq4($"tf" * $"idf"))
        .withColumn("kw_rank", row_number().over(
          Window.partitionBy($"doc_id").orderBy($"score".desc, $"w")).cast("long"))
        .filter($"kw_rank" <= 3)
        .select($"doc_id", $"kw_rank", $"w".as("token"), $"score")
        .orderBy($"doc_id", $"kw_rank")
    }),

    // Hourly event-rate anomaly detection: per-hour counts z-scored
    // against the trailing 24 h (excluding the current hour), flagged at
    // |z| > 2 — the monitoring query every event pipeline runs. The window
    // runs over the HOUR-GRAIN aggregate (already corpus-reduced: bounded
    // by wall-clock hours, not events), so the single-partition ordering
    // is a few hundred rows at any corpus size. Variance comes from exact
    // integer window sums (sum, sum of squares) with the textbook formula
    // written identically on both sides — no engine stddev, whose
    // accumulation order would differ.
    "q72_event_anomaly" -> ((s, dir) => {
      import s.implicits._
      val hourly = t(s, dir, "events")
        .withColumn("hour_bucket", floor($"ts" / 3600000000000L).cast("long"))
        .groupBy($"hour_bucket").agg(count(lit(1)).as("n"))
      val fr = Window.orderBy($"hour_bucket").rowsBetween(-24, -1)
      val cnt = count($"n").over(fr).cast("double")
      val s1 = sum($"n").over(fr).cast("double")
      val s2 = sum($"n" * $"n").over(fr).cast("double")
      val variance = (s2 - (s1 * s1) / cnt) / (cnt - 1.0)
      val z = ($"n".cast("double") - s1 / cnt) / sqrt(variance)
      hourly
        .withColumn("z4", when(cnt >= 12.0 && variance > 0.0, fq4(z)))
        .withColumn("anomaly", when($"z4".isNotNull, (abs($"z4") > 2.0).cast("int")))
        .orderBy($"hour_bucket")
    }),

    // Mergeable KMV distinct-count sketch (k=16) per source: the shuffle
    // carries ≤ k longs per group (partial+final Aggregator), never the
    // distinct stream — the cardinality twin of q42's MinHash union. The
    // deterministic stable hash makes even the APPROXIMATE estimate
    // oracle-checkable bit-for-bit (row_number over the same md5 hashes);
    // k=16 sits below this corpus's ~40-token vocabulary so the (k-1)·M/h_k
    // estimator path actually runs, and n_exact rides along so the record
    // shows the accuracy. At 100 TB the same sketch column feeds
    // hierarchical rollups (merge without re-scanning).
    "q73_kmv_distinct" -> ((s, dir) => {
      import s.implicits._
      val kmvAgg = udaf(new graft.operators.KmvSketchAgg(16))
      t(s, dir, "documents")
        .select($"source", explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
        .select($"source", $"w",
          graft.functions.HashFunctions.stableHash64(concat(lit("kmv:"), $"w")).as("h"))
        .groupBy($"source")
        .agg(countDistinct($"w").as("n_exact"), kmvAgg($"h").as("sk"))
        .select($"source", $"n_exact",
          fq4(when(size($"sk") < 16, size($"sk").cast("double"))
            .otherwise(lit(15.0) * lit(graft.operators.KmvSketch.Modulus) /
              element_at($"sk", 16).cast("double"))).as("est4"))
        .orderBy($"source")
    }),

    // Deterministic epoch shuffle — the training-order primitive: each
    // epoch's order is a sort by a salted stable hash of the doc id, so
    // re-running on any partitioning (or any engine) reproduces the same
    // permutation, and epoch 1 is decorrelated from epoch 0 by the salt.
    // Positions come from Batching.globalRowNumber (range shuffle + local
    // sort + broadcast prefix sums) — NEVER a single-partition
    // row_number() window; one range shuffle per epoch is the whole cost.
    "q74_epoch_shuffle" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id")
      def pos(epoch: Int, out: String) = graft.operators.Batching.globalRowNumber(
        docs.withColumn("__h", graft.functions.HashFunctions.stableHash64(
          concat(lit(s"epoch$epoch:"), $"doc_id".cast("string")))),
        col("__h"), numPartitions = 8, out = out)
        .select($"doc_id", col(out))
      pos(0, "pos_e0").join(pos(1, "pos_e1"), Seq("doc_id"))
        .orderBy($"doc_id")
    }),

    // SimHash-banded near-dup join — the Google web-dedup shape, and the
    // LSH family member the MinHash path doesn't cover (bit-sketch +
    // hamming instead of shingle-set + Jaccard). 4 bands x 8 bits, one
    // (band, key) equi-join shuffle, exact-hamming verify in the join
    // projection; banding is COMPLETE for hamming <= 3 by pigeonhole
    // (3 flipped bits cannot touch all 4 bands — spec-proven equal to
    // brute force). 1,327 pairs at sf0.01.
    "q75_simhash_neardup" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Dedup.simHashNearDupPairs(
          t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy($"id_a", $"id_b")
    }),

    // Exact-quota stratified sampling: each source contributes its 10
    // smallest salted-hash documents — the deterministic counterpart of
    // q62's rate-based mixture (rates give you proportions; quotas give
    // you exact per-stratum counts, what an eval-set builder wants).
    // Reproducible across engines/partitionings like every hash-ordered
    // op here. ONE shuffle on source; the rank <= 10 filter is pushed
    // into the sort as WindowGroupLimit (plan-pinned) so each partition
    // keeps only its top candidates — never a full per-group sort
    // materialization.
    "q76_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
      t(s, dir, "documents")
        .select($"source", $"doc_id",
          graft.functions.HashFunctions.stableHash64(
            concat(lit("strat:"), $"doc_id".cast("string"))).as("h"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 10)
        .select($"source", $"rk", $"doc_id")
        .orderBy($"source", $"rk")
    }),

    // Corpus snapshot diff — dataset versioning's primitive: two corpus
    // states full-outer-joined on the doc key, rows classified
    // added/removed/changed/same by content hash. The "previous" snapshot
    // is derived deterministically from the current one (docs %17==3
    // absent then → added; %13==2 texts perturbed → changed; ghost ids →
    // removed) so the oracle reproduces it exactly. ONE co-partitioned
    // id-keyed join carrying (id, md5) pairs — never document text — then
    // a 4-row rollup; the shape a 100 TB nightly-diff job wants.
    "q77_snapshot_diff" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val cur = d.select($"doc_id", md5($"text").as("h_cur"))
      val prev = d.filter($"doc_id" % 17 =!= 3)
        .select($"doc_id",
          md5(when($"doc_id" % 13 === 2, concat($"text", lit(" v1")))
            .otherwise($"text")).as("h_prev"))
        .unionByName(d.filter($"doc_id" % 19 === 5)
          .select(($"doc_id" + 1000000L).as("doc_id"), md5($"text").as("h_prev")))
      cur.join(prev, Seq("doc_id"), "full_outer")
        .select(when($"h_prev".isNull, "added")
          .when($"h_cur".isNull, "removed")
          .when($"h_cur" =!= $"h_prev", "changed")
          .otherwise("same").as("status"))
        .groupBy($"status").agg(count(lit(1)).as("n"))
        .orderBy($"status")
    }),

    // Incremental near-dup — the nightly-ingest dedup shape: the q58 hash
    // split carves a ~10% "new batch" (bucket >= 90) out of documents; the
    // remaining 90% stands in for the existing corpus, whose signature
    // index would be a STORED bucketed table in production (computed once
    // at ingest — here derived inline because the harness is stateless).
    // New docs are signature-banded ONCE, probed against the index, and
    // self-joined among themselves — per-batch cost O(delta + matched
    // buckets), never O(corpus^2). Output = q39's full-corpus pairs
    // restricted to pairs touching the delta (spec-proven), tagged
    // new_new / new_old.
    "q78_incremental_neardup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val bucket = pmod(graft.functions.HashFunctions
        .stableHash64(concat(lit("split:"), $"doc_id".cast("string"))), lit(100L))
      val index = graft.operators.Dedup.signatureIndex(
        docs.filter(bucket < 90), "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2)
      graft.operators.Dedup.incrementalNearDupPairs(
          index, docs.filter(bucket >= 90), "doc_id", "text",
          numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.5)
        .orderBy($"id_a", $"id_b")
    }),

    // Sampled quantile profile — the mergeable path to q55's exact
    // quantiles: a deterministic bottom-16-by-salted-hash sample per source
    // (partial+final mergeable, the shuffle carries <= 16 pairs per group,
    // not the group) and exact order statistics OF the sample. Quantile
    // ranks use pure integer math (floor((p*n+99)/100) = ceil(p*n/100)) so
    // neither engine's decimal-vs-double ceil can disagree; the
    // deterministic hash makes even the sample membership oracle-checkable
    // bit-for-bit — none of t-digest/GK's engine-specific rank error.
    "q79_sampled_quantiles" -> ((s, dir) => {
      import s.implicits._
      val sampleAgg = udaf(new graft.operators.BottomMSampleAgg(16))
      def kth(vals: Column, p: Int): Column = element_at(vals,
        floor((lit(p) * size(vals) + lit(99)) / lit(100.0)).cast("int")).as(s"p$p")
      t(s, dir, "documents")
        .select($"source",
          graft.functions.HashFunctions.stableHash64(
            concat(lit("sample:"), $"doc_id".cast("string"))).as("h"),
          $"n_chars")
        .groupBy($"source")
        .agg(sampleAgg($"h", $"n_chars").as("vals"))
        .select($"source", size($"vals").cast("long").as("sample_n"),
          kth($"vals", 25), kth($"vals", 50), kth($"vals", 75), kth($"vals", 90))
        .orderBy($"source")
    }),

    // Two-stage quantized ANN — the memory-bound ANN shape: int8-quantize
    // the corpus (the stored index is 4x smaller; here derived inline),
    // rank candidates by the EXACT INTEGER dot of quantized vectors,
    // rescore the top-8 survivors with the true float cosine, emit top-3.
    // floor(x*scale + 0.5) quantization keeps both engines bit-identical
    // (round() is half-even vs half-away across engines), and qdot rides to
    // the output as integer evidence of the quantized stage.
    "q80_quantized_ann" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      graft.operators.SimilaritySearch.quantizedTopK(
          emb,
          emb.filter($"vec_id".isin(0, 1, 2))
            .select($"vec_id".as("query_id"), $"embedding"),
          k = 3, candidates = 8)
        .select($"query_id", $"neighbor_id", $"qdot",
          fq4($"score").as("score"), $"rank")
        .orderBy($"query_id", $"rank")
    }),

    // The dedup END PRODUCT: near-dup pairs -> connected components ->
    // keeper map joined BACK to the corpus (one co-partitioned id equi-join
    // — the map carries two longs per doc, never text), keeping one doc per
    // cluster. Output is the per-source kept/dropped ledger a corpus
    // curation run reports; at 100 TB the same plan writes the kept docs
    // instead of counting them.
    "q81_dedup_corpus" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.nearDupPairs(
        docs, "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 1.0)
      val keep = graft.operators.Dedup.resolveClusters(pairs, docs.select($"doc_id"))
      docs.join(keep, docs("doc_id") === keep("id"))
        .select($"source", ($"keeper_id" === $"doc_id").as("kept"), $"text")
        .groupBy($"source")
        .agg(sum(when($"kept", 1L).otherwise(0L)).as("n_kept"),
          sum(when($"kept", 0L).otherwise(1L)).as("n_dropped"),
          sum(when($"kept", TextFunctions.numTokensCol($"text")).otherwise(lit(0)))
            .cast("long").as("kept_tokens"))
        .orderBy($"source")
    }),

    // Hard-negative mining — the contrastive-training data op: for each
    // query vector, the top-3 most-similar corpus vectors with a DIFFERENT
    // label (nearest wrong answers). Same scale shape as brute-force ANN:
    // queries broadcast, one corpus scan, label inequality evaluated in the
    // broadcast join condition, per-query top-k window over the survivors.
    "q82_hard_negatives" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val q = emb.filter($"vec_id".isin(0, 1, 2))
        .select($"vec_id".as("query_id"), $"embedding".as("query_vec"),
          $"label".as("q_label"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"score".desc, $"vec_id")
      emb.join(broadcast(q), $"label" =!= $"q_label")
        .withColumn("score",
          graft.functions.VectorFunctions.cosineSim($"embedding", $"query_vec"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"query_id", $"vec_id".as("neighbor_id"), $"label",
          fq4($"score").as("score"), $"rank")
        .orderBy($"query_id", $"rank")
    }),

    // Leakage-safe split — q58's hash split made near-dup-aware: the split
    // bucket is hashed from the CLUSTER KEEPER id (q53's component
    // resolution), not the doc id, so a near-dup pair can never straddle
    // train/test — the eval-contamination failure mode of naive per-doc
    // splits. Cost over q58 is the cluster resolution plus one keeper-map
    // equi-join; the split itself stays scan-side and engine-reproducible.
    "q83_leakage_safe_split" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.nearDupPairs(
        docs, "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 1.0)
      val keep = graft.operators.Dedup.resolveClusters(pairs, docs.select($"doc_id"))
      val bucket = pmod(graft.functions.HashFunctions
        .stableHash64(concat(lit("split:"), $"keeper_id".cast("string"))), lit(100L))
      docs.join(keep, docs("doc_id") === keep("id"))
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"keeper_id").as("n_clusters"))
        .orderBy($"source", $"split")
    }),

    // Vocabulary coverage curve — the tokenizer-design op: how many
    // distinct word types cover 50% / 90% / 99% of all token occurrences.
    // One corpus scan + a vocabulary-sized agg; the cumulative distribution
    // over the frequency-sorted vocabulary runs through
    // Batching.globalRunningSum (range shuffle + driver prefix offsets +
    // streamed fold) — NEVER `sum() OVER (ORDER BY …)`'s single-partition
    // window, which a web-scale vocabulary (10^8+ types) would bottleneck.
    "q84_vocab_coverage" -> ((s, dir) => {
      import s.implicits._
      // the frequency table feeds the ranker AND the totals (and the
      // ranker reads it twice for its prefix offsets): checkpoint the
      // VOCAB-sized result once so the corpus token aggregation runs once.
      // LAZY (eager=false): materializes at the first action, so merely
      // CONSTRUCTING the query (plan-pin tests) stays job-free
      val freq = t(s, dir, "documents")
        .select(explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val ranked = graft.operators.Batching.globalRunningSum(
        freq, Seq($"c".desc, $"w"), "c", numPartitions = 8,
        outPos = "rk", outCum = "cum")
      val tot = freq.agg(sum($"c").as("tot"), count(lit(1)).as("n_types"))
      ranked.crossJoin(broadcast(tot))
        .groupBy($"tot", $"n_types")
        .agg(
          min(when($"cum" * 100 >= $"tot" * 50, $"rk")).as("types_p50"),
          min(when($"cum" * 100 >= $"tot" * 90, $"rk")).as("types_p90"),
          min(when($"cum" * 100 >= $"tot" * 99, $"rk")).as("types_p99"))
        .select($"tot".cast("long").as("n_tokens"), $"n_types",
          $"types_p50", $"types_p90", $"types_p99")
    }),

    // Span-level EXACT substring dedup (Lee et al. arXiv:2107.06499): every
    // 5-token window repeated anywhere in the corpus marks its positions
    // duplicated; per doc the marks merge into maximal runs. The corpus
    // shuffle carries (doc, pos, xxhash64) — never window text; run-merge is
    // one lag window per doc. Catches boilerplate INSIDE otherwise-unique
    // docs, which q22/q39/q68 structurally cannot.
    "q85_span_dedup" -> ((s, dir) => {
      import s.implicits._
      graft.operators.SpanDedup.spanProfile(
        t(s, dir, "documents"), "doc_id",
        graft.operators.TextAnalysis.tokensCol($"text"), k = 5, minCount = 2)
        .orderBy($"doc_id")
    }),

    // BPE merge statistics — tokenizer training's step 1 (Sennrich et al.
    // arXiv:1508.07909): weighted adjacent character-pair counts over the
    // VOCABULARY (types × counts), top-20 merge candidates. The corpus pays
    // exactly one scan + one word-count shuffle; pair explosion and the
    // top-k (TakeOrderedAndProject) run on the vocab-sized table. The full
    // iterative trainer (BpeTokenizer.train) is spec-verified against a
    // plain-Scala reference; this query oracles its distributed core.
    "q86_bpe_pairs" -> ((s, dir) => {
      import s.implicits._
      val wf = graft.operators.BpeTokenizer.wordFrequencies(
        t(s, dir, "documents"), graft.operators.TextAnalysis.tokensCol($"text"))
      graft.operators.BpeTokenizer.pairCounts(
        graft.operators.BpeTokenizer.initSymbols(wf.filter(length($"w") >= 2)))
        .orderBy($"cnt".desc, $"l", $"r")
        .limit(20)
    }),

    // Bloom-prefiltered decontamination: the eval set's 3-gram fingerprints
    // build a Bloom filter (driver-merged, ~1.2 MB at 1% fpp per 10^6
    // grams) that prunes the corpus gram stream BEFORE the equi-join — at
    // 100 TB the filter broadcasts to every executor and drops ~99% of
    // clean grams scan-side, so the join shuffle carries only candidates.
    // Survivors are verified by a semi-join on xxhash64(gram): Bloom false
    // positives cost shuffle bytes, never correctness, and the only
    // residual is a 64-bit corpus-vs-eval gram hash collision (~2^-64 per
    // candidate pair — the same residual SpanDedup's scaladoc documents);
    // verify on gram TEXT instead if even that is unacceptable (cheap:
    // only Bloom candidates reach the join).
    "q87_bloom_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select($"doc_id", $"source",
          graft.operators.TextAnalysis.tokensCol($"text").as("w"))
      def grams(df: DataFrame): DataFrame = {
        val long = df.filter(size($"w") >= 4)
          .select($"doc_id",
            explode(transform(sequence(lit(1), size($"w") - 2),
              i => concat_ws(" ", slice($"w", i, lit(3))))).as("g"))
        val short = df.filter(size($"w").between(1, 3))
          .select($"doc_id", concat_ws(" ", $"w").as("g"))
        long.union(short).select($"doc_id", xxhash64($"g").as("gh"))
      }
      val all = grams(toks)
      // the eval side is SMALL by definition — checkpoint its distinct
      // grams once so the bloom build, the cardinality count and the exact
      // verify join all read the materialized set instead of re-hashing
      // the eval scan three times (the corpus branch still scans once).
      // LAZY: the ev.count() below materializes it; construction itself
      // still runs jobs for the Bloom build (inherent — the filter is a
      // driver-side value), which the q87 scaladoc-level comment owns
      val ev = all.filter($"doc_id" % 83 === 7).select($"gh").distinct()
        .localCheckpoint(false)
      val corpus = all.filter($"doc_id" % 83 =!= 7)
      // size the filter from the eval set's true cardinality (one count of
      // the SMALL side — the eval set, not the corpus) so fpp holds at any SF
      val bf = ev.stat.bloomFilter("gh", math.max(ev.count(), 1000L), 0.01)
      val mightContain = udf((gh: Long) => bf.mightContainLong(gh))
      val hits = corpus.filter(mightContain($"gh"))
        .join(ev, "gh")
        .select($"doc_id").distinct()
      t(s, dir, "documents")
        .filter($"doc_id" % 83 =!= 7)
        .join(hits.withColumn("contam", lit(1)), Seq("doc_id"), "left")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce($"contam", lit(0))).cast("long").as("n_contam"),
          sum(when($"contam".isNull, 1).otherwise(0)).cast("long").as("n_clean"))
        .orderBy($"source")
    }),

    // Bucketed co-located join — the 100 TB fact⋈fact answer: both sides
    // written bucketed+sorted on the join key (8 buckets, one file each via
    // pre-repartition on the same hash), so the merge join runs with ZERO
    // exchange and zero sort below it (plan-pinned in SparkOpsSpec). The
    // ≤25-row aggregate is collected so the scratch tables can be dropped
    // before returning — same lifecycle pattern as q37.
    "q88_bucketed_join" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_bkt").toString
      Seq("graft_bkt_orders", "graft_bkt_customer")
        .foreach(t0 => s.sql(s"DROP TABLE IF EXISTS $t0"))
      t(s, dir, "orders").repartition(8, $"o_custkey")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$tmp/orders").saveAsTable("graft_bkt_orders")
      t(s, dir, "customer").repartition(8, $"c_custkey")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$tmp/customer").saveAsTable("graft_bkt_customer")
      val rows = s.table("graft_bkt_orders")
        .join(s.table("graft_bkt_customer").hint("merge"),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_nationkey".cast("long").as("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("revenue2"))
        .orderBy($"c_nationkey")
        .as[(Long, Long, Double)].collect().toSeq
      Seq("graft_bkt_orders", "graft_bkt_customer")
        .foreach(t0 => s.sql(s"DROP TABLE IF EXISTS $t0"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      rows.toDF("c_nationkey", "n_orders", "revenue2")
    }),

    // Partition-pruned scan: the corpus written partitioned by source, read
    // back with a partition predicate — the scan touches ONE directory of
    // twenty (PartitionFilters pinned in SparkOpsSpec; at 100 TB this is
    // the difference between reading 5 TB and 100 TB). Result collected
    // (≤ n_langs rows) so the scratch dir can be removed, as in q37/q88.
    "q89_pruned_scan" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
      t(s, dir, "documents").write.partitionBy("source").parquet(s"$tmp/docs")
      val rows = s.read.parquet(s"$tmp/docs")
        .filter($"source" === "src1")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
        .orderBy($"lang")
        .as[(String, Long, Long)].collect().toSeq
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      rows.toDF("lang", "n_docs", "sum_chars")
    }),

    // Edit-distance verifier — the dedup pipeline's third similarity
    // family (set-overlap: jaccard q27; bit-sketch: simhash q26/q75;
    // sequence-alignment: levenshtein here), over the q27 adjacent-pair
    // shape. The DP runs ONCE per pair and BANDED: the threshold overload
    // early-abandons at distance > 300 (O(n·t) instead of O(n²) — a
    // verify stage never needs distances beyond its accept bound), and
    // pairs past the band report the -1 sentinel. As a verify stage this
    // runs on LSH candidates, never corpus².
    "q90_edit_distance" -> ((s, dir) => {
      import s.implicits._
      val a = t(s, dir, "documents").select($"doc_id".as("id_a"), $"text".as("ta"))
      val b = t(s, dir, "documents").select($"doc_id".as("id_b"), $"text".as("tb"))
      a.join(b, $"id_b" === $"id_a" + 1)
        // the DP is ~10^5 cell ops per pair — orders of magnitude past the
        // scan — so spread pairs across every core BEFORE computing it (a
        // small parquet arrives as one partition; explicit N so AQE can't
        // coalesce the compute stage back onto one core)
        .repartition(s.sparkContext.defaultParallelism, $"id_a")
        .select($"id_a", $"id_b",
          levenshtein($"ta", $"tb", 300).cast("long").as("lev"),
          greatest(length($"ta"), length($"tb"), lit(1)).as("mx"))
        .select($"id_a", $"id_b", $"lev",
          when($"lev" < 0, -1.0)
            .otherwise(fq4(lit(1.0) - $"lev".cast("double") / $"mx")).as("sim4"))
        .orderBy($"id_a")
    }),

    // Count-Min sketch heavy hitters: the sketch ingests the raw token
    // stream through a mergeable typed Aggregator (partial+final — each
    // partition reduces to one 4×128 long array, the merge tree ships
    // 4 KB sketches, never tokens), then the top-20 exact words read their
    // point estimates from the broadcast sketch. CMS guarantees est >= cnt
    // (one-sided error); the oracle rebuilds the identical counter table
    // relationally from the same md5 hash family.
    "q91_countmin" -> ((s, dir) => {
      import s.implicits._
      val depth = 4; val width = 128
      val toks = t(s, dir, "documents")
        .select(explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
      val cms = udaf(new graft.operators.CountMinAgg(depth, width),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]())
      val sketch = toks
        .select(graft.operators.CountMinAgg.bucketsCol($"w", depth, width).as("bs"))
        .agg(cms($"bs").as("sketch"))
      val top = toks.groupBy($"w").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"w").limit(20)
      top.crossJoin(broadcast(sketch))
        .select($"w", $"cnt",
          graft.operators.CountMinAgg.estimateCol($"w", $"sketch", depth, width).as("est"))
        .withColumn("overcount", $"est" - $"cnt")
        .orderBy($"cnt".desc, $"w")
    }),

    // Bucketed interval join: per-user 24 h incident windows (opened at
    // the user's first purchase) joined to EVERY event falling inside —
    // `pt BETWEEN lo AND hi` turned into a bucket equi-join + refine
    // (IntervalJoin), never a nested-loop. Timestamps compare in the µs
    // domain (DuckDB truncates the parquet's nanos; `div`, not `/`, keeps
    // epoch-scale longs exact) and values sum as integer micro-units.
    "q92_interval_join" -> ((s, dir) => {
      import s.implicits._
      val dayUs = 86400000000L
      val ev = t(s, dir, "events")
        .select($"event_id", expr("ts div 1000").as("ts_us"), $"user_id",
          $"event_type", floor($"value" * 1000000.0).cast("long").as("v_u"))
      val win = ev.filter($"event_type" === "purchase" && $"user_id" % 5 === 0)
        .groupBy($"user_id").agg(min($"ts_us").as("lo"))
        .select($"user_id".as("w_user"), $"lo", ($"lo" + dayUs).as("hi"))
      graft.operators.IntervalJoin
        .joinPointsToIntervals(ev, "ts_us", win, "lo", "hi", dayUs)
        .groupBy($"w_user", $"lo")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"),
          sum($"v_u").as("sum_value_u"))
        .orderBy($"w_user")
    }),

    // DSIR-style importance weighting (Xie et al. arXiv:2302.03169,
    // reduced to its distributable core): per-doc log-ratio of a TARGET
    // domain unigram LM (source src1) vs the corpus LM decides data
    // selection. Each LM's token log-prob is floor-quantized to integer
    // micro-nats THE MOMENT ln is computed (the q69 rule — one
    // transcendental per word type per LM, then exact integer math), so
    // the per-doc sum is order-independent across any partitioning. BOTH
    // LMs come from one grouped pass (conditional count for the target
    // domain) and broadcast as one vocab-sized table; the token stream
    // never shuffles for the join, and the only corpus-sized shuffle is
    // the final per-doc rollup of 16-byte rows.
    "q93_importance_weights" -> ((s, dir) => {
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select($"doc_id", $"source",
          explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
      // BOTH LMs from one grouped pass (conditional count for the target
      // domain) — one corpus scan and one broadcast join instead of two
      // frequency tables built and joined separately
      val freq = toks.groupBy($"w").agg(count(lit(1)).as("cc"),
        sum(when($"source" === "src1", 1L).otherwise(0L)).as("ct"))
      val tot = freq.agg(sum($"cc").as("ctot"), count(lit(1)).as("vsz"),
        sum($"ct").as("ttot"))
      toks.join(broadcast(freq), Seq("w"))
        .crossJoin(broadcast(tot))
        .select($"doc_id",
          (floor(log(($"ct" + 1).cast("double") /
              ($"ttot" + $"vsz").cast("double")) * 1000000.0) -
            floor(log(($"cc" + 1).cast("double") /
              ($"ctot" + $"vsz").cast("double")) * 1000000.0)).as("lru"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"), sum($"lru").cast("long").as("score_u"))
        .withColumn("keep", ($"score_u" > 0).cast("int"))
        .orderBy($"doc_id")
    }),

    // SCD2 interval versioning — the dataset-versioning WRITE shape that
    // complements q77's snapshot diff: each key's change events become
    // [valid_from, valid_to) rows with an is_current flag, built from ONE
    // per-key window (row_number + lead share the same sort), in the exact
    // µs/micro-unit integer domain. At 100 TB this is one shuffle on the
    // key — no self-join of snapshots, no driver state.
    "q94_scd2_versions" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      t(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"),
          floor($"value" * 1000000.0).cast("long").as("v_u"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("nxt", lead($"ts_us", 1).over(w))
        .select($"user_id", $"version", $"v_u",
          $"ts_us".as("valid_from_us"),
          coalesce($"nxt", lit(Long.MaxValue)).as("valid_to_us"),
          $"nxt".isNull.cast("int").as("is_current"))
        .orderBy($"user_id", $"version")
    }),

    // End-to-end training-data pipeline composite: quality filter (q70's
    // predicate) → exact dedup keep-first (q22's rule) → hash-stable split
    // (q58's buckets) → per-(source, split) corpus stats, all ONE lazy
    // plan — no stage materializes, Catalyst fuses the scan-side filter
    // and tokenization into the dedup window's exchange, and the whole
    // pipeline costs two shuffles (content window + final agg). This is
    // the composition story: the verified operators chain without
    // intermediate tables or driver round-trips.
    "q95_pipeline_e2e" -> ((s, dir) => {
      import s.implicits._
      val stopAny = graft.operators.TextAnalysis.Markers("en").map(_.asInstanceOf[Any])
      val base = t(s, dir, "documents")
        .select($"doc_id", $"source", $"text",
          graft.operators.TextAnalysis.tokensCol($"text").as("tk"))
        .select($"doc_id", $"source", $"text",
          size($"tk").cast("long").as("n_tok"),
          aggregate($"tk", lit(0), (acc, x) => acc + length(x)).cast("long").as("sum_len"),
          size(filter($"tk", x => x.isin(stopAny: _*))).cast("long").as("n_stop"))
      val kept = base.filter($"n_tok" >= 20 && $"n_tok" <= 80 && $"n_stop" > 0 &&
        $"sum_len".cast("double") / $"n_tok" >= 3.0 &&
        $"sum_len".cast("double") / $"n_tok" <= 6.0)
      val uniq = kept
        .withColumn("rn", row_number().over(
          Window.partitionBy(md5($"text")).orderBy($"doc_id")))
        .filter($"rn" === 1)
      val bucket = pmod(graft.functions.HashFunctions
        .stableHash64(concat(lit("split:"), $"doc_id".cast("string"))), lit(100L))
      uniq
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
        .orderBy($"source", $"split")
    }),

    // q92's semantics through the PLANNER instead of the operator: the
    // join is written as the natural BETWEEN theta-join and the
    // RangeJoinRewrite optimizer rule (config-gated, installed via
    // extraOptimizations / GraftExtensions) rewrites it to the bucketed
    // equi-join + refine — no nested loop reaches execution. The physical
    // plan is forced inside the config window (plans are lazy; the gate
    // must be open when the logical plan optimizes, not when the driver
    // runs the action), then BOTH the rule and the gate are restored in
    // the finally: the session-global gate would otherwise rewrite any
    // unrelated join optimized while open. (The gate is still visible to
    // concurrently-optimizing queries DURING the window — single-query
    // sessions only; a shared session should install the rule via
    // GraftExtensions and scope the conf per-query.)
    "q96_range_join_rewrite" -> ((s, dir) => {
      import s.implicits._
      val halfDayUs = 43200000000L
      val prevRules = s.experimental.extraOptimizations
      if (!prevRules.exists(_.isInstanceOf[graft.plans.RangeJoinRewrite]))
        s.experimental.extraOptimizations =
          prevRules :+ new graft.plans.RangeJoinRewrite
      s.conf.set("spark.graft.intervalJoin.bucketSize", halfDayUs.toString)
      try {
        val ev = t(s, dir, "events")
          .select($"event_id", expr("ts div 1000").as("ts_us"), $"user_id",
            $"event_type", floor($"value" * 1000000.0).cast("long").as("v_u"))
        val win = ev.filter($"event_type" === "signup" && $"user_id" % 7 === 1)
          .groupBy($"user_id").agg(min($"ts_us").as("lo"))
          .select($"user_id".as("w_user"), $"lo", ($"lo" + halfDayUs).as("hi"))
        val out = ev.join(win, $"ts_us" >= $"lo" && $"ts_us" < $"hi")
          .groupBy($"w_user", $"lo")
          .agg(count(lit(1)).as("n_events"),
            countDistinct($"user_id").as("n_users"),
            sum($"v_u").as("sum_value_u"))
          .orderBy($"w_user")
        out.queryExecution.executedPlan // force optimization under the gate
        out
      } finally {
        s.conf.unset("spark.graft.intervalJoin.bucketSize")
        s.experimental.extraOptimizations = prevRules
      }
    }),

    // Cross-source duplication matrix — dedup ANALYTICS: which source
    // pairs share near-duplicate content (the "which crawls overlap, drop
    // which feed" decision). The q39 pipeline produces the pairs; two
    // doc_id-keyed joins attach sources (the pair side is output-sized,
    // the dim side carries two small columns, never text), and the
    // unordered (least, greatest) normalization folds both pair
    // orientations into one matrix cell.
    "q97_dup_source_matrix" -> ((s, dir) => {
      import s.implicits._
      val pairs = graft.operators.Dedup.nearDupPairs(
        t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.5)
      val src = t(s, dir, "documents").select($"doc_id", $"source")
      pairs
        .join(src.toDF("id_a", "sa"), "id_a")
        .join(src.toDF("id_b", "sb"), "id_b")
        .select(least($"sa", $"sb").as("src_a"), greatest($"sa", $"sb").as("src_b"))
        .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"src_a", $"src_b")
    }),

    // Curriculum bucketing: documents ordered by LM difficulty (q69's
    // integer micro-nat scoring) and cut into 10 equal-count buckets —
    // the difficulty-ordered curriculum / perplexity-pruning op. The
    // global rank comes from Batching.globalRowNumber (range shuffle +
    // broadcast prefix offsets — NEVER a single-partition ORDER BY
    // window), the total from the ranked relation's own checkpoint (no
    // second scoring pass), and the decile cut is exact integer math.
    "q98_curriculum" -> ((s, dir) => {
      import s.implicits._
      val tokens = t(s, dir, "documents")
        .select($"doc_id", explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
      val freq = tokens.groupBy($"w").agg(count(lit(1)).as("c"))
      val tot = freq.agg(sum($"c").as("tcnt"), count(lit(1)).as("vsz"))
      val scored = tokens.join(broadcast(freq), Seq("w"))
        .crossJoin(broadcast(tot))
        .select($"doc_id",
          floor(log(($"c" + 1).cast("double") / ($"tcnt" + $"vsz").cast("double")) * 1000000.0)
            .cast("long").as("lpu"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"), sum($"lpu").as("sum_lp_u"))
        .select($"doc_id",
          (floor($"sum_lp_u".cast("double") / $"n_tok" / 100.0) / 10000.0).as("avg_lp4"))
      val ranked = graft.operators.Batching.globalRowNumber(
        scored, struct($"avg_lp4", $"doc_id"), numPartitions = 8, out = "rk")
      // ranked is checkpoint-backed inside globalRowNumber: the total rank
      // reads that checkpoint, not a second scoring pass
      val n = ranked.agg(max($"rk").as("n"))
      ranked.crossJoin(broadcast(n))
        .withColumn("bucket", expr("((rk - 1) * 10) div n"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          min($"avg_lp4").as("lo_lp4"), max($"avg_lp4").as("hi_lp4"))
        .orderBy($"bucket")
    }),

    // Temperature-based mixture sampling (T = 2): per-source keep-rates
    // ∝ sqrt(n_s) — the UniMax-style rebalance that upweights small
    // sources, vs q62's fixed rates. EVERYTHING after sqrt is integer
    // math: sqrt is IEEE-correctly-rounded on both engines, its result is
    // floor-quantized to milli-units immediately, and the rate becomes
    // floor(budget·wq·10^6 / (Σwq·n_s)) ppm — so the 20-value weight sum
    // is exact and no aggregation order can flip a rate. Selection is the
    // q58/q62 salted-hash bucket: scan-side, reproducible across engines
    // and partitionings.
    "q99_temperature_mix" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val per = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
        .withColumn("wq", floor(sqrt($"n_docs".cast("double")) * 1000.0).cast("long"))
      val tot = per.agg(sum($"wq").as("wsum"), sum($"n_docs").as("n_tot"))
      // share first, then budget: every intermediate stays ≤ budget·10^6,
      // which fits a long even at 10^12 documents (budget·wq·10^6 would not)
      val rates = per.crossJoin(broadcast(tot))
        .withColumn("budget", expr("(n_tot * 6) div 10"))
        .withColumn("share_ppm", expr("(wq * 1000000L) div wsum"))
        .withColumn("rate_ppm",
          expr("least(1000000L, (budget * share_ppm) div n_docs)"))
        .select($"source", $"rate_ppm")
      val keep = pmod(graft.functions.HashFunctions
        .stableHash64(concat(lit("mix:"), $"doc_id".cast("string"))), lit(1000000L))
      docs.join(broadcast(rates), Seq("source"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), first($"rate_ppm").as("rate_ppm"),
          sum(when(keep < $"rate_ppm", 1L).otherwise(0L)).as("n_kept"))
        .orderBy($"source")
    }),

    // The data card (q100): the per-source corpus-health report a
    // training-data pipeline publishes — doc counts, exact-duplicate
    // membership (corpus-wide, via the in-place content-hash window),
    // token share in exact ppm, q70-quality pass counts, and language
    // entropy in integer micro-nats (each -p·ln p term quantized the
    // moment ln is computed). ONE corpus scan feeds everything through a
    // narrow checkpoint (hash + counters, no text); the 20-row per-source
    // table is checkpointed too so its three consumers don't re-run the
    // content window.
    "q100_data_card" -> ((s, dir) => {
      import s.implicits._
      val stopAny = graft.operators.TextAnalysis.Markers("en").map(_.asInstanceOf[Any])
      val base = t(s, dir, "documents")
        .select($"doc_id", $"source", $"lang", md5($"text").as("h"),
          graft.operators.TextAnalysis.tokensCol($"text").as("tk"))
        .select($"doc_id", $"source", $"lang", $"h",
          size($"tk").cast("long").as("n_tok"),
          aggregate($"tk", lit(0), (a, x) => a + length(x)).cast("long").as("sum_len"),
          size(filter($"tk", x => x.isin(stopAny: _*))).cast("long").as("n_stop"))
        .localCheckpoint(false) // lazy: construction stays job-free
      val dup = base.withColumn("n_occ",
        count(lit(1)).over(Window.partitionBy($"h")))
      val per = dup.groupBy($"source").agg(
          count(lit(1)).as("n_docs"),
          sum(when($"n_occ" >= 2, 1L).otherwise(0L)).as("n_dup_docs"),
          sum($"n_tok").as("n_toks"),
          sum(when($"n_tok".between(20, 80) && $"n_stop" > 0 &&
            $"sum_len".cast("double") / $"n_tok" >= 3.0 &&
            $"sum_len".cast("double") / $"n_tok" <= 6.0, 1L).otherwise(0L)).as("n_quality"))
        .localCheckpoint(false)
      val ent = base.groupBy($"source", $"lang").agg(count(lit(1)).as("nl"))
        .join(broadcast(per.select($"source", $"n_docs")), "source")
        .select($"source",
          floor(-($"nl".cast("double") / $"n_docs") *
            log($"nl".cast("double") / $"n_docs") * 1000000.0)
            .cast("long").as("term_u"))
        .groupBy($"source").agg(sum($"term_u").as("entropy_u"))
      val tot = per.agg(sum($"n_toks").as("tot_toks"))
      per.join(ent, "source").crossJoin(broadcast(tot))
        .select($"source", $"n_docs", $"n_dup_docs",
          expr("(n_toks * 1000000L) div tot_toks").as("tok_share_ppm"),
          $"n_quality", $"entropy_u")
        .orderBy($"source")
    }),

    // Unigram-LM document scoring (add-one smoothing): the KenLM-style
    // quality signal, reduced to its distributable core. Token log-probs
    // are floor-quantized to integer micro-nats AT THE SCAN, so the
    // distributed sum is exact integer math — order-independent across any
    // partitioning, and the only transcendental (ln) is quantized before
    // it can flip a hash. Two corpus scans (the LM must be counted before
    // docs are scored — inherent); the vocabulary-sized frequency table
    // broadcasts back (bounded by vocab, not corpus; a shuffle join is the
    // fallback if vocab ever outgrows broadcast), and the final per-doc
    // shuffle carries 16-byte (doc_id, lpu) rows, not text.
    "q69_unigram_lm" -> ((s, dir) => {
      import s.implicits._
      val tokens = t(s, dir, "documents")
        .select($"doc_id", explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
      val freq = tokens.groupBy($"w").agg(count(lit(1)).as("c"))
      val tot = freq.agg(sum($"c").as("tcnt"), count(lit(1)).as("vsz"))
      tokens.join(broadcast(freq), Seq("w"))
        .crossJoin(broadcast(tot))
        .select($"doc_id",
          floor(log(($"c" + 1).cast("double") / ($"tcnt" + $"vsz").cast("double")) * 1000000.0)
            .cast("long").as("lpu"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"), sum($"lpu").as("sum_lp_u"))
        .withColumn("avg_lp4",
          floor($"sum_lp_u".cast("double") / $"n_tok" / 100.0) / 10000.0)
        .orderBy($"doc_id")
    }),

    // Corpus profiling (training-data QA): per-source document counts,
    // language cardinality, exact length quantiles (Spark `percentile` and
    // DuckDB `quantile_cont` share the interpolation contract), short-doc
    // rate. One partial+final agg pass over the scan.
    "q55_corpus_profile" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct($"lang").as("n_langs"),
          expr("percentile(n_chars, 0.5)").as("median_chars"),
          expr("percentile(n_chars, 0.9)").as("p90_chars"),
          floor(avg($"n_chars") * 10000.0).cast("long").as("avg_chars_q"),
          sum(when($"n_chars" < 150, 1).otherwise(0)).cast("long").as("n_short"))
        .orderBy($"source")
    }),

    // The whole q39 MinHash-LSH dedup pipeline expressed PURELY in SQL text
    // through the registered native functions (minhash_sig at the scan,
    // band hashes via md5/conv — the same stableHash64 formula the
    // DataFrame path compiles, in-bucket signature-agreement verify,
    // threshold before DISTINCT). Proves a SQL-only user can run the dedup
    // suite; values are bit-identical to q39's DataFrame plan. Spark inlines
    // WITH-CTEs into every consumer, so a single-statement form would scan
    // the corpus + compute signatures TWICE (once per self-join side); the
    // band relation is therefore staged through an eagerly-cached temp view
    // — the SQL analogue of the DataFrame path's localCheckpoint in
    // Dedup.bandSelfJoin. All statements are plain SQL: a SQL-only user
    // stages at scale exactly this way (or INSERTs into a staging table).
    "q56_sql_dedup" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("v_documents")
      sqlDedupPipeline(s)
    }),

    // Retrieval-quality evaluation — the metric layer every ANN deployment
    // ships with: recall@10 and MRR-of-the-true-NN for the single-probe
    // sign-LSH index (q31's bucketing) against brute-force ground truth.
    // Both rankers are the library operators (one corpus scan each, queries
    // broadcast); truth and candidates are k-row-per-query relations, so
    // every join after them is output-sized. At 100 TB you run this on a
    // SAMPLED query set — the eval cost is the two scans, never a cross
    // product. Metrics are exact rationals until the final quantized
    // division (n_hit/10, 1/rank).
    "q101_retrieval_eval" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter($"vec_id" < 10).select($"vec_id".as("query_id"), $"embedding")
      // truth and candidates are each read twice (hit count + NN-rank
      // probe): stage the k·q-row results, not the scans (lazy — nothing
      // runs at construction)
      val truth = graft.operators.SimilaritySearch
        .bruteForceTopK(emb, qs, k = 10).localCheckpoint(false)
      val cand = graft.operators.SimilaritySearch
        .lshTopK(emb, qs, k = 10, dim = 64, planes = 4).localCheckpoint(false)
      val hits = truth.select($"query_id", $"neighbor_id")
        .join(cand.select($"query_id", $"neighbor_id"), Seq("query_id", "neighbor_id"))
        .groupBy($"query_id").agg(count(lit(1)).as("n_hit"))
      val nn1 = truth.filter($"rank" === 1).select($"query_id", $"neighbor_id")
      val rr = nn1
        .join(cand.select($"query_id", $"neighbor_id", $"rank"),
          Seq("query_id", "neighbor_id"), "left")
        .select($"query_id",
          coalesce(lit(1.0) / $"rank".cast("double"), lit(0.0)).as("mrr"))
      qs.select($"query_id")
        .join(hits, Seq("query_id"), "left")
        .join(rr, Seq("query_id"), "left")
        .select($"query_id",
          coalesce($"n_hit", lit(0L)).as("n_hit"),
          fq4(coalesce($"n_hit", lit(0L)).cast("double") / lit(10.0)).as("recall4"),
          fq4(coalesce($"mrr", lit(0.0))).as("mrr4"))
        .orderBy($"query_id")
    }),

    // HyperLogLog distinct-count per source — the FOURTH mergeable sketch
    // (cardinality with FIXED m-register state; KMV q73 trades k·8 bytes
    // for exactness below k). Registers ingest the raw token stream via a
    // typed Aggregator (partial+final — each partition reduces to one
    // 16-int array, the shuffle ships registers, never tokens), and the
    // bucket/rank derivation is scan-side md5 so the oracle rebuilds the
    // IDENTICAL registers with max() GROUP BY. Estimate math is integer
    // (S = Σ 2^(48-M_j)) up to one literal product + division; n_exact
    // rides along to show the accuracy.
    "q102_hll_distinct" -> ((s, dir) => {
      import s.implicits._
      val p = 4
      val hll = udaf(new graft.operators.HllAgg(p),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Int)]())
      t(s, dir, "documents")
        .select($"source", explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
        .select($"source", $"w",
          graft.functions.HashFunctions.stableHash64(concat(lit("hll:"), $"w")).as("h"))
        .withColumn("bkt", graft.operators.HllSketch.bucketCol($"h", p))
        .withColumn("rnk", graft.operators.HllSketch.rankExpr("h", p))
        .groupBy($"source")
        .agg(countDistinct($"w").as("n_exact"),
          hll($"bkt", $"rnk").as("regs"))
        .select($"source", $"n_exact",
          fq4(graft.operators.HllSketch.estimateExpr("regs", p)).as("est4"))
        .orderBy($"source")
    }),

    // Top-k per group WITHOUT the window sort: a bounded-heap typed
    // Aggregator (TopKAgg) reduces every map-side partition to ≤ k pairs
    // per group BEFORE the exchange — the shuffle carries
    // O(groups·k·partitions) state instead of every row, which at 100 TB
    // is the difference between a kilobyte-scale exchange and shuffling
    // the corpus through `row_number() OVER (PARTITION BY …)`. Plan-pinned
    // (no Window, ObjectHashAggregate with partial merge) in SparkOpsSpec.
    "q103_topk_per_group" -> ((s, dir) => {
      import s.implicits._
      val topk = udaf(new graft.operators.TopKAgg(3),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
      t(s, dir, "documents")
        .groupBy($"source")
        .agg(topk($"n_chars", $"doc_id").as("top"))
        .select($"source", posexplode($"top").as(Seq("i", "p")))
        .select($"source", ($"i" + 1).cast("long").as("rk"),
          $"p._2".as("doc_id"), $"p._1".as("n_chars"))
        .orderBy($"source", $"rk")
    }),

    // Weighted sampling without replacement (Efraimidis & Spirakis, IPL
    // 2006): each row draws key = -ln(u)/w from a HASH-derived uniform —
    // fully deterministic, reproducible across engines and partitionings,
    // the weighted sibling of q58's salted-hash split. u = (h mod 2^20 +
    // 1)/2^20 is an exact dyadic rational; -ln(u) is floor-quantized to
    // integer nano-units THE MOMENT it is computed (the suite's standard
    // transcendental dodge), so the per-row key (eu·1000 div w) and the
    // bottom-k selection are exact integer math. Scan-side keys + one
    // TakeOrderedAndProject — no shuffle of the corpus; the trailing
    // row_number window orders the 20 SELECTED rows only.
    "q104_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      val h = graft.functions.HashFunctions.stableHash64(
        concat(lit("ws:"), $"doc_id".cast("string")))
      val scored = t(s, dir, "documents")
        .select($"doc_id", $"source", greatest($"n_chars", lit(1L)).as("w"))
        .withColumn("eu",
          floor(-log((pmod(h, lit(1048576L)) + lit(1L)).cast("double") / lit(1048576.0))
            * lit(1000000000.0)).cast("long"))
        .withColumn("skey", expr("(eu * 1000) div w"))
      scored.orderBy($"skey", $"doc_id").limit(20)
        .withColumn("rk",
          row_number().over(Window.orderBy($"skey", $"doc_id")).cast("long"))
        .select($"rk", $"doc_id", $"source", $"w", $"skey")
    }),

    // Semantic dedup (SemDeDup, arXiv:2303.09540): cluster the embedding
    // space (deterministic centroids, broadcast; assignment is the IVF
    // map-side max_by — one scan), then mark within-cluster lower-id
    // neighbors at cosine >= 0.3 as duplicates via a self-equi-join on the
    // cell id. The quadratic check never leaves a cell, and k = 0 →
    // IvfIndex.autoK keeps cell interiors ~64 rows as the corpus grows —
    // the n·s cost stays linear without the caller raising k by hand.
    // The lexical dedup family (q39/q75/q85) cannot see these pairs —
    // paraphrases share no shingles.
    "q105_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = graft.operators.IvfIndex.centroids(emb, k = 0, iters = 0)
      graft.operators.SemanticDedup.report(emb, cents, tau = 0.3)
    }),

    // Z-order layout (Morton 1966; Delta/Iceberg OPTIMIZE ZORDER): the
    // WRITE-side clustering op. Rows get a scan-side bit-interleaved key
    // of (user bucket, hour bucket), one RANGE shuffle orders the curve
    // (Batching.globalRowNumber — never a single-partition window), and
    // equal-count file cuts produce the layout. The report is each file's
    // min/max of BOTH dimensions — the column statistics a format would
    // store, and the proof the curve clusters x and y simultaneously (a
    // plain ORDER BY x would leave every file spanning all of y).
    "q106_zorder_layout" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_id",
          pmod($"user_id", lit(65536L)).as("x"),
          pmod(expr("(ts div 1000) div 3600000000"), lit(65536L)).as("y"))
      graft.operators.ZOrder
        .layout(ev, "x", "y", bits = 16, files = 32, tieBreak = "event_id")
        .groupBy($"file_id")
        .agg(count(lit(1)).as("n"),
          min($"x").as("x_lo"), max($"x").as("x_hi"),
          min($"y").as("y_lo"), max($"y").as("y_hi"),
          min($"zval").as("z_lo"), max($"zval").as("z_hi"))
        .orderBy($"file_id")
    }),

    // Interpolated bigram LM scoring — q69's unigram signal upgraded one
    // order: p = 0.7·p(cur|prev) + 0.3·p(cur), both estimated from the
    // bigram stream. ONE corpus scan produces the (doc, prev, cur) stream
    // (staged — the count tables AND the scoring pass read it); every
    // derived table is vocab²-bounded and broadcasts back; token log-probs
    // quantize to integer micro-nats at the scan so the per-doc sum is
    // order-independent exact integer math (the suite's transcendental
    // policy). At 100 TB the broadcasts become shuffle joins on the gram
    // key — same plan shape, no new scans.
    "q107_bigram_lm" -> ((s, dir) => {
      import s.implicits._
      val bi = t(s, dir, "documents")
        .select($"doc_id", graft.operators.TextAnalysis.tokensCol($"text").as("w"))
        .filter(size($"w") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(2, size(w)), i -> struct(element_at(w, i - 1) AS p, element_at(w, i) AS c))")).as("b"))
        .select($"doc_id", $"b.p".as("p"), $"b.c".as("c"))
        .localCheckpoint(false) // one corpus scan; counts + scoring read this
      val bic = bi.groupBy($"p", $"c").agg(count(lit(1)).as("cbi"))
        .localCheckpoint(false) // vocab²-bounded; feeds three derived tables
      val prevc = bic.groupBy($"p").agg(sum($"cbi").as("cp"))
      val curc = bic.groupBy($"c").agg(sum($"cbi").as("cc"))
      val tot = bic.agg(sum($"cbi").as("nbi"))
      bi.join(broadcast(bic), Seq("p", "c"))
        .join(broadcast(prevc), Seq("p"))
        .join(broadcast(curc), Seq("c"))
        .crossJoin(broadcast(tot))
        .select($"doc_id",
          floor(log(lit(0.7) * ($"cbi".cast("double") / $"cp".cast("double"))
            + lit(0.3) * ($"cc".cast("double") / $"nbi".cast("double"))) * lit(1000000.0))
            .cast("long").as("lpu"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bi"), sum($"lpu").as("sum_lp_u"))
        .select($"doc_id", $"n_bi", $"sum_lp_u",
          (floor($"sum_lp_u".cast("double") / $"n_bi" / 100.0) / 10000.0).as("avg_lp4"))
        .orderBy($"doc_id")
    }),

    // PageRank over the near-dup pair graph — dedup analytics one level
    // above q97's source matrix: rank centrality finds the TEMPLATE
    // documents boilerplate radiates from (what you read before choosing
    // a cluster's canonical survivor). Exact integer arithmetic (ppm
    // ranks, div-damping) so any engine/partitioning reproduces it;
    // each of the 3 iterations is one equi-join + one agg over the staged
    // degree-annotated adjacency (PageRank.ranks).
    "q108_dup_pagerank" -> ((s, dir) => {
      import s.implicits._
      val pairs = graft.operators.Dedup.nearDupPairs(
        t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.5)
      graft.operators.PageRank.ranks(pairs, "id_a", "id_b", iters = 3)
        .select($"id".as("doc_id"), $"deg", $"rank_u")
        .orderBy($"rank_u".desc, $"doc_id")
        .limit(20)
    }),

    // Embedding-outlier pruning — the data-quality sibling of q105: flag
    // vectors whose similarity to their OWN cluster centroid sits more
    // than 2σ below the cluster mean (mislabeled/garbage embeddings drift
    // toward cell boundaries). The z-test runs in EXACT integer math on
    // scan-quantized scores: cos4 = floor(cos·10⁴), and z² > 4 below the
    // mean is the cross-multiplied integer inequality
    // (n·cos4 − S)² > 4·(n·S2 − S²) — no float mean, no engine-ordered
    // variance, any partitioning reproduces it. One scan (assignment) +
    // one cluster-sized agg broadcast back.
    "q109_embedding_outliers" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val cents = graft.operators.IvfIndex.centroids(emb, k = 8, iters = 0)
      val cells = graft.operators.IvfIndex.assign(emb, cents, "vec_id", "embedding")
        .join(broadcast(cents), "centroid_id")
        .select($"centroid_id", $"vec_id",
          floor(graft.functions.VectorFunctions.cosineSim($"embedding", $"centroid")
            * lit(10000.0)).cast("long").as("cos4"))
        .localCheckpoint(false) // stats + flagging read the scored cells
      val stats = cells.groupBy($"centroid_id")
        .agg(count(lit(1)).as("n"), sum($"cos4").as("s1"),
          sum($"cos4" * $"cos4").as("s2"))
      cells.join(broadcast(stats), "centroid_id")
        .groupBy($"centroid_id")
        .agg(first($"n").as("n_vecs"),
          sum(when($"n" * $"cos4" < $"s1" &&
            ($"n" * $"cos4" - $"s1") * ($"n" * $"cos4" - $"s1")
              > lit(4L) * ($"n" * $"s2" - $"s1" * $"s1"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy($"centroid_id")
    }),

    // BPE ENCODE — applying the tokenizer, the other half of q86's
    // training surface: per-word greedy merge fold (BpeTokenizer.encodeCol,
    // reference Sennrich semantics) with q110's fixed collision-free merge
    // list (see BpeMerges; trained lists are spec-verified separately).
    // Scale shape: each word TYPE is encoded once — the fold runs over the
    // distinct-word vocabulary (sublinear in the corpus) and the token
    // stream joins the encoded lengths back by word (broadcast at bench
    // scale, shuffle join at web scale); the corpus itself is scanned
    // once and never carries symbol arrays.
    "q110_bpe_encode" -> ((s, dir) => {
      import s.implicits._
      val merges = BpeMerges.map { case (l, r) =>
        graft.operators.BpeTokenizer.Merge(l, r, 0L) }
      val tok = t(s, dir, "documents")
        .select($"doc_id", explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
      val vocabEnc = tok.select($"w").distinct()
        .select($"w", length($"w").as("nc"),
          size(element_at(
            graft.operators.BpeTokenizer.encodeCol(array($"w"), merges), 1)).as("ns"))
      tok.join(broadcast(vocabEnc), "w")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum($"nc").as("n_chars"), sum($"ns").as("n_syms"))
        .select($"doc_id", $"n_words", $"n_chars", $"n_syms",
          fq4($"n_syms".cast("double") / $"n_chars".cast("double")).as("ratio4"))
        .orderBy($"doc_id")
    }),

    // Matryoshka-truncation retrieval eval (Kusupati et al.,
    // arXiv:2205.13147): how much recall@10 / NN-rank survives when the
    // index stores only the FIRST 16 of 64 dimensions — the
    // dimension-adaptive deployment question (4× less index to scan, same
    // q101 metric layer). Truncated scoring is a scan-side slice; both
    // rankers are one corpus scan with broadcast queries; every join after
    // the k-row rankings is output-sized.
    "q111_matryoshka_eval" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter($"vec_id" < 10).select($"vec_id".as("query_id"), $"embedding")
      val truth = graft.operators.SimilaritySearch
        .bruteForceTopK(emb, qs, k = 10).localCheckpoint(false)
      // candidate ranking sees ONLY the 16-dim prefix of both sides
      val emb16 = emb.select($"vec_id", slice($"embedding", 1, 16).as("embedding"))
      val qs16 = qs.select($"query_id", slice($"embedding", 1, 16).as("embedding"))
      val cand = graft.operators.SimilaritySearch
        .bruteForceTopK(emb16, qs16, k = 10, qidCol = "query_id")
        .localCheckpoint(false)
      val hits = truth.select($"query_id", $"neighbor_id")
        .join(cand.select($"query_id", $"neighbor_id"), Seq("query_id", "neighbor_id"))
        .groupBy($"query_id").agg(count(lit(1)).as("n_hit"))
      val nn1 = truth.filter($"rank" === 1).select($"query_id", $"neighbor_id")
      val rr = nn1
        .join(cand.select($"query_id", $"neighbor_id", $"rank"),
          Seq("query_id", "neighbor_id"), "left")
        .select($"query_id",
          coalesce(lit(1.0) / $"rank".cast("double"), lit(0.0)).as("mrr"))
      qs.select($"query_id")
        .join(hits, Seq("query_id"), "left")
        .join(rr, Seq("query_id"), "left")
        .select($"query_id",
          coalesce($"n_hit", lit(0L)).as("n_hit"),
          fq4(coalesce($"n_hit", lit(0L)).cast("double") / lit(10.0)).as("recall4"),
          fq4(coalesce($"mrr", lit(0.0))).as("mrr4"))
        .orderBy($"query_id")
    }),

    // Mergeable corpus statistics — the 100 TB rollup contract proven at
    // the query level: per-source stats are computed INDEPENDENTLY on two
    // disjoint corpus halves (doc_id parity), then COMBINED purely from
    // the partial states — counts add, HLL registers take the element-wise
    // max (zip_with greatest) — and the merged estimate must equal the
    // whole-corpus stats bit-for-bit (the oracle computes them directly,
    // never seeing the halves). This is how a data card stays one cheap
    // merge per ingest instead of a corpus re-scan: yesterday's sketch ⊕
    // today's delta.
    "q112_mergeable_stats" -> ((s, dir) => {
      import s.implicits._
      val p = 4
      def half(pred: org.apache.spark.sql.Column) = {
        val hll = udaf(new graft.operators.HllAgg(p),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Int)]())
        t(s, dir, "documents").filter(pred)
          .select($"source",
            explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
          .select($"source", $"w",
            graft.functions.HashFunctions.stableHash64(concat(lit("hll:"), $"w")).as("h"))
          .withColumn("bkt", graft.operators.HllSketch.bucketCol($"h", p))
          .withColumn("rnk", graft.operators.HllSketch.rankExpr("h", p))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_tok"), hll($"bkt", $"rnk").as("regs"))
      }
      val a = half($"doc_id" % 2 === 0)
      val b = half($"doc_id" % 2 === 1)
      a.toDF("source", "n_tok_a", "regs_a")
        .join(b.toDF("source", "n_tok_b", "regs_b"), Seq("source"), "full")
        .select($"source",
          (coalesce($"n_tok_a", lit(0L)) + coalesce($"n_tok_b", lit(0L))).as("n_tok"),
          zip_with(
            coalesce($"regs_a", array_repeat(lit(0), 1 << p)),
            coalesce($"regs_b", array_repeat(lit(0), 1 << p)),
            (x, y) => greatest(x, y)).as("regs"))
        .select($"source", $"n_tok",
          fq4(graft.operators.HllSketch.estimateExpr("regs", p)).as("est4"))
        .orderBy($"source")
    }),

    // Positional inverted index + phrase queries — exact phrase constraints
    // dense retrieval cannot guarantee (InvertedIndex scaladoc has the
    // 100 TB shape: postings written once bucketed by term; a k-term
    // phrase reads only its own terms' postings and runs k−1 equi-joins on
    // one shared (doc, pos) partitioning). The postings relation is staged
    // once (lazy checkpoint — modelling the written index) and probed by
    // both phrase chains.
    "q113_phrase_search" -> ((s, dir) => {
      import s.implicits._
      val post = graft.query.InvertedIndex
        .postings(t(s, dir, "documents"), "doc_id", "text")
        .localCheckpoint(false)
      def hits(phrase: Seq[String]) =
        graft.query.InvertedIndex.phraseMatches(post, phrase)
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_occ"), min($"pos").cast("long").as("first_pos"))
          .select(lit(phrase.mkString(" ")).as("phrase"), $"doc_id", $"n_occ", $"first_pos")
      hits(Seq("table", "scan")).union(hits(Seq("hash", "join")))
        .orderBy($"phrase", $"n_occ".desc, $"doc_id")
    }),

    // Length-bucketed padded batches — the padding-efficiency layout step
    // (PaddedBatching scaladoc): power-of-two cap ladder at the scan, ONE
    // range shuffle for the whole layout (windowless global rank), batch
    // identity by arithmetic. Report = per-batch fill efficiency, the
    // number a training-infra dashboard actually watches.
    "q114_padded_batches" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id",
        size(graft.operators.TextAnalysis.tokensCol($"text")).cast("long").as("tc"))
      graft.operators.PaddedBatching
        .batches(docs, "doc_id", "tc", batchSize = 8, numPartitions = 32)
        .groupBy($"cap".cast("long").as("cap"), $"batch_id")
        .agg(count(lit(1)).as("n_seqs"), sum($"tc").as("n_tok"))
        .select($"cap", $"batch_id", $"n_seqs", $"n_tok",
          ($"n_seqs" * $"cap" - $"n_tok").as("n_pad"),
          fq4($"n_tok".cast("double") / ($"n_seqs" * $"cap").cast("double")).as("eff4"))
        .orderBy($"cap", $"batch_id")
    }),

    // n-gram CONTAINMENT over LSH candidates — Broder's asymmetric
    // near-superset measure (quote/inclusion detection): C(A,B) ≈ 1 with
    // low Jaccard means A is swallowed by B. Candidates come from the same
    // banded (band, hash) equi-join as q39 — the exact verifier only ever
    // runs on bucketed pairs, never all-pairs. Verifier shape: all three
    // measures in ONE compiled pass per pair (ShinglePairScores — separate
    // expressions rebuild the shingle sets per measure, 6 builds instead
    // of 2), behind an explicit-N repartition: the candidate relation is
    // bytes-tiny so AQE coalesces it onto a few cores, exactly the
    // compute-bound-projection trap q90 documents (28.8 → ~2 s at sf0.1).
    "q115_containment" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val sigs = graft.operators.Dedup
        .minhashSig(docs, "text", numHashes = 8, shingle = 4)
        .select($"doc_id", $"minhash")
      val cand = graft.operators.Dedup.lshCandidates(sigs, "doc_id", bands = 4, rowsPerBand = 2)
      // the scored relation is checkpointed BEFORE field extraction:
      // project-collapse + filter pushdown would otherwise re-inline the
      // scorer into every GetStructField AND the filter predicate — up to
      // 5 evaluations per pair of the expensive expression
      val scored = cand
        .join(docs.select($"doc_id".as("id_a"), $"text".as("text_a")), Seq("id_a"))
        .join(docs.select($"doc_id".as("id_b"), $"text".as("text_b")), Seq("id_b"))
        .repartition(32, $"id_a", $"id_b")
        .select($"id_a", $"id_b",
          graft.operators.Dedup.pairScores($"text_a", $"text_b", 5).as("sc"))
        .localCheckpoint(false)
      scored.select($"id_a", $"id_b",
          fq4($"sc.cont_ab").as("cont_ab4"), fq4($"sc.cont_ba").as("cont_ba4"),
          fq4($"sc.jac").as("jac4"))
        .filter(greatest($"cont_ab4", $"cont_ba4") >= 0.8)
        .orderBy($"id_a", $"id_b")
    }),

    // Sliding context windows (stride < win keeps cross-boundary context —
    // the RoBERTa long-doc convention): pure scan-side expression, the
    // explode only at the consumer. Window fingerprints are the dedup key
    // for cross-document window dedup downstream.
    "q116_sliding_windows" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", posexplode(graft.operators.TextAnalysis.slidingWindowsCol(
          graft.operators.TextAnalysis.tokensCol($"text"), win = 24, stride = 16)))
        .select($"doc_id", $"pos".cast("long").as("win_id"),
          $"col.start".cast("long").as("start"),
          $"col.n_tok".cast("long").as("n_tok"), $"col.fp".as("fp"))
        .orderBy($"doc_id", $"win_id")
    }),

    // Sequential funnel (signup → view → purchase) with STRICT ordering —
    // each stage's event must follow the previous stage's chosen event
    // (Funnel scaladoc: k−1 equi-joins on one entity partitioning, each
    // stage's filter pushed to the scan, no event-stream window). µs
    // domain for cross-engine ts math (see q49/q65).
    "q117_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_type", expr("ts div 1000").as("ts_us"))
      graft.operators.Funnel
        .firstCompletion(ev, "user_id", "event_type", "ts_us",
          Seq("signup", "view", "purchase"))
        .select($"user_id", $"ts_1", $"ts_2", $"ts_3",
          when($"ts_3".isNotNull, 3L).when($"ts_2".isNotNull, 2L).otherwise(1L).as("stage"))
        .orderBy($"user_id")
    }),

    // Dedup SURVIVOR selection — the policy step after cluster resolution:
    // within each exact-dup cluster keep the longest version (ties →
    // lowest id), the "keep the most complete copy" rule real pipelines
    // apply. argmax rides a struct max inside the per-cluster aggregate —
    // no window, map-side partial.
    "q118_dedup_survivors" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.nearDupPairs(
        docs, "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 1.0)
      graft.operators.Dedup.resolveClusters(pairs, docs.select($"doc_id"))
        .join(docs.select($"doc_id", $"n_chars"), $"id" === $"doc_id")
        .groupBy($"keeper_id")
        .agg(count(lit(1)).as("n_members"),
          max(struct($"n_chars".as("nc"), (-$"doc_id").as("nid"))).as("best"))
        .filter($"n_members" >= 2)
        .select($"keeper_id".as("cluster_id"), $"n_members",
          (-$"best.nid").as("survivor_id"), $"best.nc".as("survivor_chars"))
        .orderBy($"cluster_id")
    }),

    // Token-budget output sharding — contiguous shards of ~equal token
    // count, the layout a data-parallel training job reads (equal-token
    // shards keep readers in step; equal-DOC shards skew on length).
    // Windowless: one range shuffle + per-partition offset fold
    // (Batching.globalRunningSum), shard identity by integer arithmetic.
    "q119_token_shards" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id",
        size(graft.operators.TextAnalysis.tokensCol($"text")).cast("long").as("tc"))
      graft.operators.Sharding
        .tokenBudgetShards(docs, $"doc_id", "tc", tokenBudget = 20000L, numPartitions = 32)
        .groupBy($"shard_id")
        .agg(count(lit(1)).as("n_docs"), sum($"tc").as("n_tok"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
        .orderBy($"shard_id")
    }),

    // Rendezvous (highest-random-weight) sharding — stateless shard
    // assignment that is MINIMALLY DISRUPTIVE under resharding: the query
    // itself measures the property, assigning every doc under K=8 and
    // K=9 and counting movers per shard (~1/9 of docs move; hash % K
    // would move ~8/9). The 100 TB relevance is incremental ingest:
    // capacity changes must not re-layout the corpus.
    "q120_rendezvous_shards" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          graft.operators.Sharding.rendezvousCol($"doc_id", 8).as("shard_id"),
          graft.operators.Sharding.rendezvousCol($"doc_id", 9).as("shard_grown"))
        .groupBy($"shard_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(($"shard_id" =!= $"shard_grown").cast("long")).as("n_moved"))
        .orderBy($"shard_id")
    }),

    // Point-in-time (feature-store) join: each view event reads the
    // purchase-derived SCD2 version VALID AT its timestamp — the
    // training-serving-skew correctness question. The engine path is the
    // as-of join (union + one keyed window, q49's operator): for dims
    // with open-ended current versions, as-of IS the point-in-time join,
    // and it never materializes validity intervals (whose unbounded
    // upper ends would defeat interval bucketing). Events before the
    // first version read version 0 (no value).
    "q121_point_in_time" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val ev = t(s, dir, "events")
      val scd = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"),
          floor($"value" * 1000000.0).cast("long").as("v_u"))
        .withColumn("version", row_number().over(w).cast("long"))
        .select($"user_id", $"ts_us", struct($"version", $"v_u").as("ver"))
      val views = ev.filter($"event_type" === "view")
        .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"))
      graft.operators.AsOfJoin.lastPriorValue(views, scd, "user_id", "ts_us", "ver")
        .select($"event_id", $"user_id", $"ts_us",
          coalesce($"asof_ver.version", lit(0L)).as("version"),
          $"asof_ver.v_u".as("v_u"))
        .orderBy($"event_id")
    }),

    // Embedding moment (Gram/covariance) matrix — the input to PCA
    // whitening and decorrelation diagnostics over a corpus's embedding
    // space. EXACT integer math end-to-end: components are quantized at
    // the scan (floor(x·10⁴)), so Σvᵢvⱼ, Σvᵢ and the covariance numerator
    // n·Sᵢⱼ − Sᵢ·Sⱼ are plain integer sums — any engine, any partitioning,
    // bit-identical. Shape: the d² explode is inherent to a dense Gram
    // computation, but the SHUFFLE carries only d(d+1)/2 = 2080 keys
    // (map-side partial sums do the reduction); the 64×64 result is
    // driver-sized, ready for an eigen-solve. A BLAS mapPartitions
    // variant would cut the explode constant, not the plan shape.
    "q122_gram_matrix" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select($"vec_id",
          transform($"embedding", x => floor(x.cast("double") * 10000.0).cast("long")).as("e4"))
        .select($"vec_id", $"e4", posexplode($"e4")).toDF("vec_id", "e4", "i", "vi")
        .select($"vec_id", $"i", $"vi", posexplode($"e4")).toDF("vec_id", "i", "vi", "j", "vj")
        .filter($"j" >= $"i")
        .groupBy($"i".cast("long").as("i"), $"j".cast("long").as("j"))
        .agg(count(lit(1)).as("n_vecs"), sum($"vi" * $"vj").as("s_ij"),
          sum($"vi").as("s_i"), sum($"vj").as("s_j"))
        .select($"i", $"j", $"n_vecs", $"s_ij", $"s_i", $"s_j",
          ($"n_vecs" * $"s_ij" - $"s_i" * $"s_j").as("cov_num"))
        .orderBy($"i", $"j")
    }),

    // The keyed interval join at query level — q121's point-in-time
    // question restricted to CLOSED validity windows, run through the
    // bucketed per-key interval join instead of the as-of operator: each
    // view event equi-joins on (user, time-bucket) against the exploded
    // closed purchase windows, exact range refine after. The contrast
    // with q121 is deliberate: bounded windows bucket cleanly (this
    // path), open-ended current versions do not (as-of path) — together
    // they cover the dimension-join spectrum.
    "q124_keyed_interval" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val ev = t(s, dir, "events")
      val closed = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("vt", lead($"ts_us", 1).over(w))
        .filter($"vt".isNotNull)
        .select($"user_id", $"ts_us".as("vf"), $"vt", $"version")
      val views = ev.filter($"event_type" === "view")
        .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"))
      // bucketSize 0 = AUTO: closed SCD2 windows have data-dependent
      // lengths, exactly the case where a hand-picked constant drifts from
      // the corpus — the sampled-median estimate costs one aggregate pass
      // over the (small) interval side and the output is bucket-invariant
      graft.operators.IntervalJoin.joinPointsToIntervals(
          views, "ts_us", closed, "vf", "vt",
          bucketSize = 0L, keyCols = Seq("user_id"))
        .select($"event_id", $"user_id", $"ts_us", $"version")
        .orderBy($"event_id")
    }),

    // Gap-filled dense time series — hourly event counts with EVERY hour
    // present (zero-filled): dashboards and anomaly detectors break on
    // sparse series where absent != zero. The hour spine is generated
    // from the corpus min/max (a 2-value broadcast) via sequence+explode
    // — no calendar table, no driver loop — and the left join fills gaps.
    // µs domain throughout (q49/q65 policy).
    "q125_dense_timeseries" -> ((s, dir) => {
      import s.implicits._
      val hourUs = 3600000000L
      val ev = t(s, dir, "events")
        .select(expr(s"(ts div 1000) div $hourUs").as("hour_idx"),
          $"event_type", $"event_id")
      val counts = ev.filter($"event_type" === "error")
        .groupBy($"hour_idx").agg(count(lit(1)).as("n_errors"))
      val spine = ev.agg(min($"hour_idx").as("lo"), max($"hour_idx").as("hi"))
        .select(explode(sequence($"lo", $"hi")).as("hour_idx"))
      spine.join(counts, Seq("hour_idx"), "left")
        .select($"hour_idx", coalesce($"n_errors", lit(0L)).as("n_errors"))
        .orderBy($"hour_idx")
    }),

    // Cohort retention matrix — the product-analytics complement of the
    // funnel: users grouped by first-activity day (cohort), each later
    // active day bucketed into days-since-cohort; cell = distinct active
    // users. Two aggregates + one broadcast-able join on the per-user
    // cohort relation — no window over the event stream.
    "q126_cohort_retention" -> ((s, dir) => {
      import s.implicits._
      val dayUs = 86400000000L
      val ev = t(s, dir, "events")
        .select($"user_id", expr(s"(ts div 1000) div $dayUs").as("day_idx"))
      val cohorts = ev.groupBy($"user_id").agg(min($"day_idx").as("cohort_day"))
      ev.join(cohorts, Seq("user_id"))
        .select($"user_id", $"cohort_day", ($"day_idx" - $"cohort_day").as("age_days"))
        .distinct()
        .groupBy($"cohort_day", $"age_days")
        .agg(count(lit(1)).as("n_active"))
        .filter($"age_days" <= 7)
        .orderBy($"cohort_day", $"age_days")
    }),

    // Log-histogram percentiles — the mergeable-quantile answer for
    // latency-style metrics: values quantize to integer centi-units at
    // the scan, bucket = binary length (power-of-two histogram, ≤ 2×
    // relative error), and a percentile is the first bucket whose
    // cumulative count crosses ceil(q·n) — ALL integer arithmetic, so
    // any engine/partitioning reproduces it, and the histogram (unlike a
    // sorted-sample percentile) merges across shards by adding counts.
    // The corpus shuffle carries (type, bucket) partial counts only; the
    // cumulative walk runs on the bucket-ladder-sized relation.
    "q127_log_histogram" -> ((s, dir) => {
      import s.implicits._
      val hist = t(s, dir, "events")
        .select($"event_type",
          length(bin(greatest(floor($"value" * 100.0).cast("long"), lit(0L)))).as("bucket"))
        .groupBy($"event_type", $"bucket").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy($"event_type").orderBy($"bucket")
      val cum = hist.withColumn("cum", sum($"c").over(w))
        .withColumn("n", sum($"c").over(Window.partitionBy($"event_type")))
      def pct(q: Int) = min(when($"cum" >= expr(s"(n * $q + 99) div 100"),
        expr("shiftleft(cast(1 as bigint), bucket - 1)"))).as(s"p${q}_lb100")
      cum.groupBy($"event_type")
        .agg(first($"n").as("n_events"), pct(50), pct(90), pct(99))
        .orderBy($"event_type")
    }),

    // Sketch algebra for overlap estimation — the join-size question a
    // planner asks ("how many distinct tokens do these two sources
    // share?") answered WITHOUT touching the data twice: per-source HLL
    // registers (one corpus pass) combine by element-wise max into the
    // union sketch, and inclusion–exclusion gives the intersection
    // estimate — est(A) + est(B) − est(A∪B) — computed in floor-quantized
    // integer 1e-4 units so the combination is exact cross-engine. The
    // exact intersection rides along as the accuracy reference.
    "q128_sketch_overlap" -> ((s, dir) => {
      import s.implicits._
      val p = 6
      val srcs = Seq("src0", "src1", "src2", "src3", "src4")
      val hll = udaf(new graft.operators.HllAgg(p),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Int)]())
      val tok = t(s, dir, "documents").filter($"source".isin(srcs: _*))
        .select($"source",
          explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
      val regs = tok
        .select($"source", $"w",
          graft.functions.HashFunctions.stableHash64(concat(lit("hll:"), $"w")).as("h"))
        .withColumn("bkt", graft.operators.HllSketch.bucketCol($"h", p))
        .withColumn("rnk", graft.operators.HllSketch.rankExpr("h", p))
        .groupBy($"source").agg(hll($"bkt", $"rnk").as("regs"))
        .localCheckpoint(false) // source-count-sized; feeds both join sides
      val vocab = tok.select($"source", $"w").distinct().localCheckpoint(false)
      val exact = vocab.toDF("src_a", "w")
        .join(vocab.toDF("src_b", "w"), Seq("w"))
        .filter($"src_a" < $"src_b")
        .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("n_inter_exact"))
      def e4(c: Column) = floor(c * 10000.0).cast("long")
      regs.toDF("src_a", "regs_a").crossJoin(regs.toDF("src_b", "regs_b"))
        .filter($"src_a" < $"src_b")
        .select($"src_a", $"src_b",
          e4(graft.operators.HllSketch.estimateExpr("regs_a", p)).as("ea"),
          e4(graft.operators.HllSketch.estimateExpr("regs_b", p)).as("eb"),
          zip_with($"regs_a", $"regs_b", (x, y) => greatest(x, y)).as("regs_u"))
        .select($"src_a", $"src_b", $"ea", $"eb",
          e4(graft.operators.HllSketch.estimateExpr("regs_u", p)).as("eu"))
        .select($"src_a", $"src_b",
          ($"ea" / 10000.0).as("est_a4"), ($"eb" / 10000.0).as("est_b4"),
          ($"eu" / 10000.0).as("est_u4"),
          (greatest($"ea" + $"eb" - $"eu", lit(0L)) / 10000.0).as("est_i4"))
        .join(exact, Seq("src_a", "src_b"), "left")
        .select($"src_a", $"src_b", coalesce($"n_inter_exact", lit(0L)).as("n_inter_exact"),
          $"est_a4", $"est_b4", $"est_u4", $"est_i4")
        .orderBy($"src_a", $"src_b")
    }),

    // Join-skew diagnostic — the report that decides salting/broadcast
    // BEFORE a 100 TB join melts an executor: per key column, the top
    // heavy-hitter keys (TopKAgg — map-side ≤ k pairs per partition, the
    // shuffle never carries per-key rows) with each hitter's share of the
    // total in exact 1e-4 integer units, flagged when a single key
    // exceeds 1/32 of the relation (one task's fair share at 32-way
    // parallelism — precisely when an unsalted shuffle join hotspots).
    "q129_skew_report" -> ((s, dir) => {
      import s.implicits._
      val topk = udaf(new graft.operators.TopKAgg(5),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
      val ev = t(s, dir, "events")
      val total = ev.count() // driver-side scalar: one count, reused as a literal
      val counts = ev.groupBy($"user_id").agg(count(lit(1)).as("c"))
      counts.agg(topk($"c", $"user_id").as("top"))
        .select(posexplode($"top"))
        .select(($"pos" + 1).cast("long").as("rank"),
          $"col._2".as("user_id"), $"col._1".as("n_rows"),
          expr(s"(col._1 * 10000) div $total").as("share4u"),
          ($"col._1" * 32 > total).cast("int").as("hot_at_32"))
        .orderBy($"rank")
    }),

    // q129's diagnostic WIRED to the remedy (the round-7 gap): the
    // documents→source-dim join is the pathological shape AQE can't fix —
    // 20 distinct sources means 20 reducers no matter how many cores — so
    // autoSaltedJoin probes the key histogram (TopKAgg, k-row collect),
    // flags every source over 1/32 of the corpus, and routes flagged rows
    // through the salted two-branch join (small side replicates 8× for hot
    // keys ONLY). Output is row-identical to the plain join — the oracle
    // runs the plain SQL join and must hash-match.
    "q132_salted_join" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"source", $"n_chars")
      val dim = docs.groupBy($"source").agg(max($"n_chars").as("max_chars"))
      val total = docs.count() // driver-side scalar: the 1/32 hot bar
      graft.operators.Salting.autoSaltedJoin(
          docs, dim, "source", saltSource = $"doc_id", saltFactor = 8,
          hotKeyThreshold = total / 32)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(($"n_chars" * 10 >= $"max_chars" * 9).cast("long")).as("n_near_max"),
          min($"max_chars").as("max_chars"))
        .orderBy($"source")
    }),

    // Manifest mergeability — q123's claim proven at the query level
    // (q112's rollup contract, applied to the integrity layer): manifests
    // of two disjoint corpus halves combine purely by partial-state
    // algebra — counts and char-sums ADD, XOR signatures XOR, id bounds
    // min/max — and the merged manifest must equal the whole-corpus
    // manifest bit-for-bit (the oracle computes it directly, never seeing
    // the halves). This is what lets a replica check absorb a delta
    // shipment without re-hashing the corpus.
    "q130_manifest_merge" -> ((s, dir) => {
      import s.implicits._
      def half(pred: org.apache.spark.sql.Column) =
        t(s, dir, "documents").filter(pred)
          .select($"source", $"doc_id", $"n_chars",
            graft.functions.HashFunctions.stableHash64(
              concat_ws(":", $"doc_id", $"text")).as("h"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("sig"),
            sum($"n_chars").as("sc"), min($"doc_id").as("lo"), max($"doc_id").as("hi"))
      val a = half($"doc_id" % 2 === 0).toDF("source", "n_a", "sig_a", "sc_a", "lo_a", "hi_a")
      val b = half($"doc_id" % 2 === 1).toDF("source", "n_b", "sig_b", "sc_b", "lo_b", "hi_b")
      a.join(b, Seq("source"), "full")
        .select($"source",
          (coalesce($"n_a", lit(0L)) + coalesce($"n_b", lit(0L))).as("n_docs"),
          // XOR identity is 0, so absent halves contribute nothing
          (coalesce($"sig_a", lit(0L)).bitwiseXOR(coalesce($"sig_b", lit(0L)))).as("content_sig"),
          (coalesce($"sc_a", lit(0L)) + coalesce($"sc_b", lit(0L))).as("sum_chars"),
          least(coalesce($"lo_a", $"lo_b"), coalesce($"lo_b", $"lo_a")).as("min_id"),
          greatest(coalesce($"hi_a", $"hi_b"), coalesce($"hi_b", $"hi_a")).as("max_id"))
        .orderBy($"source")
    }),

    // Corpus integrity manifest — the checksum layer a 100 TB corpus
    // ships with: per source, an order-independent content signature
    // (XOR of per-doc hashes — associative + commutative, so partials
    // from any partitioning/shard merge exactly; the id is hashed WITH
    // the text so renumbered-but-identical content changes the
    // signature). Verifying a replica or yesterday's snapshot is a
    // manifest diff, never a corpus re-read. XOR's self-cancellation on
    // duplicate rows is harmless here: (doc_id, text) is id-unique.
    // One scan, one tiny agg.
    "q123_corpus_manifest" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"source", $"doc_id", $"n_chars",
          graft.functions.HashFunctions.stableHash64(
            concat_ws(":", $"doc_id", $"text")).as("h"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), expr("bit_xor(h)").as("content_sig"),
          sum($"n_chars").as("sum_chars"),
          min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
        .orderBy($"source")
    }),

    // Span-dedup APPLY (Lee et al. §4): q85 profiles duplicated spans; this
    // REWRITES the corpus — every k-gram repeat after its corpus-wide first
    // occurrence cuts its covered positions, runs merge, survivors
    // reassemble into text_clean. Same single 8-byte-hash shuffle as the
    // profile (count + corpus rank in one window pass); run-merge BEFORE
    // position explosion keeps the covered stream O(dropped tokens).
    "q131_span_dedup_apply" -> ((s, dir) => {
      import s.implicits._
      graft.operators.SpanDedup.applySpanDedup(
        t(s, dir, "documents"), "doc_id",
        graft.operators.TextAnalysis.tokensCol($"text"), k = 5, minCount = 2)
        .orderBy($"doc_id")
    }),

    // MMR-diversified retrieval: brute-force top-8 candidates per query,
    // then greedy λ=0.7 re-rank trades relevance against redundancy —
    // near-duplicate passages stop crowding the context window a plain
    // top-k hands to the LLM. Scores integer-quantize at 1e4 (the q30
    // precision) BEFORE the greedy loop so the pick sequence is exact
    // integer arithmetic the unrolled-CTE oracle replays; all MMR
    // relations are (queries × 8)-sized — the corpus is only touched by
    // the candidate generator.
    "q133_mmr_rerank" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter($"vec_id".isin(0, 1, 2))
        .select($"vec_id".as("query_id"), $"embedding")
      val cand = graft.operators.SimilaritySearch.bruteForceTopK(emb, queries, 8)
        .select($"query_id", $"neighbor_id",
          floor($"score" * 10000.0).cast("long").as("rel_u"))
        .localCheckpoint(false) // candidate set feeds pairs AND the loop
      val vecs = emb.select($"vec_id", $"embedding")
      val pairs = cand.select($"query_id", $"neighbor_id".as("id_a"))
        .join(cand.select($"query_id", $"neighbor_id".as("id_b")), Seq("query_id"))
        .filter($"id_a" =!= $"id_b")
        .join(vecs.select($"vec_id".as("id_a"), $"embedding".as("va")), Seq("id_a"))
        .join(vecs.select($"vec_id".as("id_b"), $"embedding".as("vb")), Seq("id_b"))
        .select($"query_id", $"id_a", $"id_b",
          floor(graft.functions.VectorFunctions.cosineSim($"va", $"vb") * 10000.0)
            .cast("long").as("sim_u"))
      graft.operators.MmrRerank.rerank(
          cand, "query_id", "neighbor_id", "rel_u",
          pairs, "id_a", "id_b", "sim_u",
          k = 3, lambdaNum = 7L, lambdaDen = 10L)
        .orderBy($"query_id", $"pick_rank")
    }),

    // Zone-map skip estimate: q106 builds the z-order layout, this MEASURES
    // the payoff — the same rectangle predicate A/B'd against the default
    // linear-on-x layout, reporting what file-level min/max stats would
    // prune (Delta/Iceberg data skipping, decided from the manifest alone).
    // Predicate bounds are derived scalars (corpus min/max eighths) so the
    // query is scale-free; rows_matched is layout-invariant by construction
    // — the two rows differ only in skip effectiveness.
    "q134_zonemap_skip" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_id",
          pmod($"user_id", lit(65536L)).as("x"),
          pmod(expr("(ts div 1000) div 3600000000"), lit(65536L)).as("y"))
      val b = ev.agg(min($"x").as("mnx"), max($"x").as("mxx"),
          min($"y").as("mny"), max($"y").as("mxy"))
        .select(($"mnx" + expr("(mxx - mnx) div 8")).as("xlo"),
          ($"mnx" + expr("3 * (mxx - mnx) div 8")).as("xhi"),
          ($"mny" + expr("(mxy - mny) div 8")).as("ylo"),
          ($"mny" + expr("3 * (mxy - mny) div 8")).as("yhi"))
      val lin = graft.operators.ZOrder.linearLayout(ev, "x", files = 32,
        tieBreak = "event_id")
      val zo = graft.operators.ZOrder.layout(ev, "x", "y", bits = 16,
        files = 32, tieBreak = "event_id")
      graft.operators.ZOrder.skipEstimate(lin, "x", "y", b)
        .withColumn("layout", lit("linear"))
        .unionByName(graft.operators.ZOrder.skipEstimate(zo, "x", "y", b)
          .withColumn("layout", lit("zorder")))
        .select($"layout", $"n_files", $"n_skipped", $"rows_scanned",
          $"rows_matched")
        .orderBy($"layout")
    }),

    // Range-partition planner closing its own loop (the q129→q132 move,
    // applied to range layout): boundaries from a deterministic 20% hash
    // sample of event times, then the balance report a range shuffle with
    // those cuts would see. Boundary collect is (parts−1) driver values —
    // the accepted k-row class; corpus assignment is a scan expression.
    "q135_range_partition" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"event_id", expr("ts div 1000").as("v"))
      val bnds = graft.operators.RangePlanner
        .boundaries(ev, "v", "event_id", parts = 8, sampleMod = 5)
        .collect().map(_.getAs[Long]("boundary")).toSeq
      graft.operators.RangePlanner.balanceReport(ev, "v", bnds)
        .orderBy($"bucket")
    }),

    // Gopher/RefinedWeb repetition rules (Rae et al. 2021 §A1.1): flag
    // documents dominated by a repeated unigram/bigram or by duplicated
    // 5-gram runs. All ratios are INTEGER micro-fractions ((k·10000) div n)
    // so any engine/partitioning reproduces the flags bit-for-bit; the only
    // shuffle is the per-doc gram hash-agg (map-side combined, gram text
    // never leaves the scan stage at 100 TB — the profile is count-only).
    "q136_repetition_rules" -> ((s, dir) => {
      import s.implicits._
      val qs = graft.operators.QualitySignals
      val base = t(s, dir, "documents")
        .select($"doc_id", graft.operators.TextAnalysis.tokensCol($"text").as("w"))
        .select($"doc_id", size($"w").as("n_tok"), $"w")
        .localCheckpoint(false) // one corpus scan feeds all three gram profiles
      def topCnt(n: Int, out: String) = base
        .select($"doc_id", explode(qs.ngramsStrict($"w", n)).as("g"))
        .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(max($"c").as(out))
      val dup5 = base
        .select($"doc_id", explode(qs.ngramsStrict($"w", 5)).as("g"))
        .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(sum(when($"c" > 1, $"c").otherwise(0L)).as("dup5_cnt"))
      base.select($"doc_id", $"n_tok")
        .join(topCnt(1, "top1_cnt"), Seq("doc_id"), "left")
        .join(topCnt(2, "top2_cnt"), Seq("doc_id"), "left")
        .join(dup5, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tok",
          coalesce($"top1_cnt", lit(0L)).as("top1_cnt"),
          coalesce($"top2_cnt", lit(0L)).as("top2_cnt"),
          coalesce($"dup5_cnt", lit(0L)).as("dup5_cnt"))
        .withColumn("top1_u", when($"n_tok" > 0,
          expr("(top1_cnt * 10000) div n_tok")).otherwise(lit(0L)))
        .withColumn("top2_u", when($"n_tok" >= 2,
          expr("(top2_cnt * 2 * 10000) div n_tok")).otherwise(lit(0L)))
        .withColumn("dup5_u", when($"n_tok" >= 5,
          expr("(dup5_cnt * 10000) div (n_tok - 4)")).otherwise(lit(0L)))
        .select($"doc_id", $"n_tok",
          ($"top1_u" / lit(10000.0)).as("top1_frac4"),
          ($"top2_u" / lit(10000.0)).as("top2_frac4"),
          ($"dup5_u" / lit(10000.0)).as("dup5_frac4"),
          when($"top1_u" > 800 || $"top2_u" > 1000 || $"dup5_u" > 3000, 1L)
            .otherwise(0L).as("flagged"))
        .orderBy($"doc_id")
    }),

    // PII scan + redaction (QualitySignals.piiCounts / redactPii) — the
    // scrub pass a web corpus runs before anything else. The source tables
    // are PII-free by construction, so the query plants deterministic
    // synthetic PII derived from doc_id (example-domain email, 555 phone,
    // RFC-1918 IP) and then proves the scan finds EXACTLY the planted
    // counts and the redaction removes them (re-scan of redacted text is
    // all-zero, asserted as a column). Everything is scan-side regex — one
    // corpus pass, no shuffle, no UDF.
    "q137_pii_redact" -> ((s, dir) => {
      import s.implicits._
      val qs = graft.operators.QualitySignals
      val aug = t(s, dir, "documents").select($"doc_id",
        concat($"text",
          when($"doc_id" % 5 === 0,
            concat(lit(" contact user"), $"doc_id".cast("string"),
              lit("@corp.example now")))
            .otherwise(lit("")),
          when($"doc_id" % 7 === 0,
            concat(lit(" call 415-555-"),
              lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when($"doc_id" % 3 === 0,
            concat(lit(" host 10.0."), ($"doc_id" % 256).cast("string"),
              lit("."), (expr("doc_id div 256") % 256).cast("string")))
            .otherwise(lit(""))).as("text"))
      aug.select($"doc_id", length($"text").as("raw_len"),
          qs.piiCounts($"text").as("pii"),
          qs.redactPii($"text").as("red"))
        .withColumn("residual", qs.piiCounts($"red"))
        .select($"doc_id", $"raw_len",
          $"pii.n_email".cast("long").as("n_email"),
          $"pii.n_phone".cast("long").as("n_phone"),
          $"pii.n_ip".cast("long").as("n_ip"),
          length($"red").as("red_len"),
          ($"pii.n_email" + $"pii.n_phone" + $"pii.n_ip" === 0).cast("long")
            .as("clean"),
          ($"residual.n_email" + $"residual.n_phone" + $"residual.n_ip")
            .cast("long").as("residual_hits"))
        .orderBy($"doc_id")
    }),

    // Curriculum tiers by ABSOLUTE perplexity band under the q107 bigram
    // LM — the "easy first" ordering signal (Bengio et al. 2009) as a data
    // pipeline op. Banding on fixed thresholds (not quantiles) keeps the
    // tier a pure scan-side CASE over the per-doc score: no global sort,
    // no single-reducer ntile window — the shape that survives 100 TB.
    // The tier key is floor(sum_u / n) via ONE double division (integer
    // `div` is out: Spark truncates toward zero, DuckDB floors — they
    // disagree on negative log-probs).
    "q138_curriculum_tiers" -> ((s, dir) => {
      import s.implicits._
      val bi = t(s, dir, "documents")
        .select($"doc_id", graft.operators.TextAnalysis.tokensCol($"text").as("w"))
        .filter(size($"w") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(2, size(w)), i -> struct(element_at(w, i - 1) AS p, element_at(w, i) AS c))")).as("b"))
        .select($"doc_id", $"b.p".as("p"), $"b.c".as("c"))
        .localCheckpoint(false) // one corpus scan; counts + scoring read this
      val bic = bi.groupBy($"p", $"c").agg(count(lit(1)).as("cbi"))
        .localCheckpoint(false)
      val prevc = bic.groupBy($"p").agg(sum($"cbi").as("cp"))
      val curc = bic.groupBy($"c").agg(sum($"cbi").as("cc"))
      val tot = bic.agg(sum($"cbi").as("nbi"))
      bi.join(broadcast(bic), Seq("p", "c"))
        .join(broadcast(prevc), Seq("p"))
        .join(broadcast(curc), Seq("c"))
        .crossJoin(broadcast(tot))
        .select($"doc_id",
          floor(log(lit(0.7) * ($"cbi".cast("double") / $"cp".cast("double"))
            + lit(0.3) * ($"cc".cast("double") / $"nbi".cast("double"))) * lit(1000000.0))
            .cast("long").as("lpu"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bi"), sum($"lpu").as("sum_lp_u"))
        .withColumn("alu",
          floor($"sum_lp_u".cast("double") / $"n_bi".cast("double")).cast("long"))
        .select($"doc_id", $"n_bi",
          (floor($"alu" / 100.0) / 10000.0).as("avg_lp4"),
          when($"alu" >= -3380000L, 1L)
            .when($"alu" >= -3395000L, 2L)
            .when($"alu" >= -3420000L, 3L)
            .otherwise(4L).as("tier"))
        .orderBy($"doc_id")
    }),

    // Deterministic stratified train/val/test split — hash-ordered
    // row_number WITHIN each (lang, source) stratum, 80/10/10 by the
    // integer rule rn*10 <= n*8 / n*9 (exact, engine-independent; the
    // same salt-prefixed md5 ordering any re-run or other engine
    // reproduces). Per-stratum windows parallelize across strata; no
    // global sort anywhere.
    "q139_stratified_split" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang", $"source")
        .orderBy(md5(concat(lit("split:"), $"doc_id".cast("string"))), $"doc_id")
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang", $"source")
      t(s, dir, "documents")
        .select($"lang", $"source", $"doc_id")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .withColumn("split",
          when($"rn" * 10 <= $"n" * 8, "train")
            .when($"rn" * 10 <= $"n" * 9, "val")
            .otherwise("test"))
        .groupBy($"lang", $"source", $"split")
        .agg(count(lit(1)).as("n_docs"),
          min($"doc_id").as("min_doc_id"), max($"doc_id").as("max_doc_id"))
        .orderBy($"lang", $"source", $"split")
    }),

    // Corpus snapshot diff — the nightly-ingest question "what changed
    // since the last build?" answered content-addressed: two simulated
    // snapshot views of the same table (v1 drops doc_id%10=0, v2 drops
    // doc_id%13=5 and revises doc_id%7=0), full-outer join on doc_id,
    // status from md5 content hashes. At 100 TB both sides carry only
    // (id, source, hash, len) — never text — into one AQE-managed shuffle
    // join; the delta statuses drive incremental re-embedding (q78's
    // incremental index is the downstream consumer).
    "q140_snapshot_diff" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val v1 = docs.filter($"doc_id" % 10 =!= 0)
        .select($"doc_id", $"source".as("src1"), md5($"text").as("h1"))
      val v2 = docs.filter($"doc_id" % 13 =!= 5)
        .select($"doc_id", $"source".as("src2"),
          when($"doc_id" % 7 === 0, concat($"text", lit(" [rev2]")))
            .otherwise($"text").as("t2"))
        .select($"doc_id", $"src2", md5($"t2").as("h2"),
          length($"t2").cast("long").as("len2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(coalesce($"src1", $"src2").as("source"),
          when($"h1".isNull, "added")
            .when($"h2".isNull, "removed")
            .when($"h1" === $"h2", "unchanged")
            .otherwise("changed").as("status"),
          coalesce($"len2", lit(0L)).as("len2"))
        .groupBy($"source", $"status")
        .agg(count(lit(1)).as("n_docs"), sum($"len2").as("n_chars_v2"))
        .orderBy($"source", $"status")
    }),

    // Training-mixture weights (DoReMi-lite / temperature sampling, Xie et
    // al. 2023): per-source token shares reweighted at temperature τ=0.5
    // (w_i ∝ share_i^0.5, the multilingual-sampling convention). sqrt is
    // IEEE-exactly-rounded so quantizing each per-source sqrt to 1e-6 then
    // doing ONLY integer arithmetic (integer sums, integer division) makes
    // every weight engine- and partitioning-exact. One corpus scan for the
    // token counts; everything after is source-count-sized.
    "q141_mixture_weights" -> ((s, dir) => {
      import s.implicits._
      val per = t(s, dir, "documents")
        .select($"source",
          size(graft.operators.TextAnalysis.tokensCol($"text")).cast("long").as("nt"))
        .groupBy($"source").agg(sum($"nt").as("n_tok"))
        .localCheckpoint(false) // source-count-sized; three derived aggs
      val tot = per.agg(sum($"n_tok").as("tot"))
      val r = per.crossJoin(broadcast(tot))
        .withColumn("share_bp", expr("(n_tok * 10000) div tot"))
        .withColumn("share_u", expr("(n_tok * 1000000) div tot"))
        .withColumn("r_u", floor(sqrt($"n_tok".cast("double") / $"tot".cast("double"))
          * lit(1000000.0)).cast("long"))
      val sumr = r.agg(sum($"r_u").as("sum_r"))
      r.crossJoin(broadcast(sumr))
        .withColumn("w4_u", expr("(r_u * 10000) div sum_r"))
        .select($"source", $"n_tok", $"share_bp",
          ($"w4_u" / lit(10000.0)).as("w4"),
          (expr("(w4_u * 1000000) div share_u") / lit(10000.0)).as("epochs4"))
        .orderBy($"source")
    }),

    // Per-source distribution drift: unigram KL(source ‖ corpus) — the
    // monitoring metric that catches a crawler/source going off-topic
    // between corpus builds. Every source term exists in the corpus (the
    // corpus is the union), so no smoothing is needed. Per-term
    // contributions are floor-quantized to integer micro-nats the moment
    // the ln is computed (the suite's transcendental rule) so the
    // per-source sum is partitioning-exact. One corpus scan → one gram
    // hash-agg; the corpus-side tables derive from the SAME agg (no second
    // scan); everything after is vocab-sized.
    "q142_source_drift" -> ((s, dir) => {
      import s.implicits._
      val cs = t(s, dir, "documents")
        .select($"source", explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
        .groupBy($"source", $"w").agg(count(lit(1)).as("c_s"))
        .localCheckpoint(false) // one corpus shuffle; c_g/n_s/n_g derive from it
      val cg = cs.groupBy($"w").agg(sum($"c_s").as("c_g"))
      val ns = cs.groupBy($"source").agg(sum($"c_s").as("n_s"))
      val ng = cg.agg(sum($"c_g").as("n_g"))
      cs.join(cg, Seq("w"))
        .join(broadcast(ns), Seq("source"))
        .crossJoin(broadcast(ng))
        .select($"source",
          floor(($"c_s".cast("double") / $"n_s".cast("double"))
            * log(($"c_s".cast("double") * $"n_g".cast("double"))
              / ($"n_s".cast("double") * $"c_g".cast("double")))
            * lit(1000000.0)).cast("long").as("contrib_u"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_terms"), sum($"contrib_u").as("kl_u"))
        .select($"source", $"n_terms", $"kl_u",
          (floor($"kl_u" / 100.0) / 10000.0).as("kl4"))
        .orderBy($"source")
    }),

    // Document-level PMI pair mining (Church & Hanks 1990) over the
    // frequent vocabulary — collocation discovery for tokenizer/phrase
    // curation. The pair space is generated by a doc_id self-join of the
    // df-pruned (doc, word) table: the prune bounds per-doc fan-out by the
    // kept-vocab size, so the join output is docs × O(V_kept²) — the knob
    // that keeps this finite at 100 TB (raise the df floor as the corpus
    // grows). PMI quantized to micro-nats at computation.
    "q144_pmi_pairs" -> ((s, dir) => {
      import s.implicits._
      val dw = t(s, dir, "documents")
        .select($"doc_id", explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
        .distinct()
        .localCheckpoint(false) // doc×vocab sized; feeds df + the pair join
      val dfr = dw.groupBy($"w").agg(count(lit(1)).as("df"))
      val kept = dfr.filter($"df" >= 50).localCheckpoint(false)
      val nd = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val kdw = dw.join(broadcast(kept.select($"w")), Seq("w"))
      kdw.select($"doc_id", $"w".as("wa"))
        .join(kdw.select($"doc_id", $"w".as("wb")), Seq("doc_id"))
        .filter($"wa" < $"wb")
        .groupBy($"wa", $"wb").agg(count(lit(1)).as("c_ab"))
        .join(broadcast(kept.select($"w".as("wa"), $"df".as("df_a"))), Seq("wa"))
        .join(broadcast(kept.select($"w".as("wb"), $"df".as("df_b"))), Seq("wb"))
        .crossJoin(broadcast(nd))
        .select($"wa", $"wb", $"c_ab", $"df_a", $"df_b",
          floor(log(($"c_ab".cast("double") * $"n_docs".cast("double"))
            / ($"df_a".cast("double") * $"df_b".cast("double")))
            * lit(1000000.0)).cast("long").as("pmi_u"))
        .orderBy($"pmi_u".desc, $"wa", $"wb")
        .limit(50)
    }),

    // Mutual-kNN clustering + label purity — the unsupervised structure
    // check on an embedding table (does the geometry agree with the
    // labels?). kNN is CELL-RESTRICTED: neighbors are searched inside the
    // vector's own IVF cell (q109's deterministic cells), so the pair
    // space is Σ|cell|² — bucketed, never corpus×corpus. The cell count is
    // DATA-DRIVEN (k = 0 → IvfIndex.autoK: one count, k = max(8,
    // ceil(n/64))), so cell INTERIORS stay ~64 vectors and within-cell
    // scoring is O(n·64) — linear — at any corpus size; the oracle
    // reproduces the same integer-ceil k. Mutuality (a ∈ top3(b) ∧
    // b ∈ top3(a)) is a self-join of the k-sized top lists; components
    // resolve by min-label propagation (Dedup.resolveClusters — one join
    // per round).
    "q143_knn_cluster_purity" -> ((s, dir) => {
      import s.implicits._
      knnClusterPurity(t(s, dir, "embeddings"))
    }),

    // Hard-negative mining for contrastive training (in-batch negatives
    // are too easy; the mined set is same-similarity different-label).
    // Queries broadcast against one corpus scan (q111's shape); pos = top
    // same-label neighbor, neg = top different-label neighbor, margin =
    // their quantized-similarity gap, n_harder = negatives at or above the
    // positive (0 ⇒ the positive wins the retrieval). Every join after
    // the scan is query-count-sized.
    "q145_hard_negatives" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter($"vec_id" < 16)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"), $"label".as("qlabel"))
      val scored = emb.crossJoin(broadcast(qs))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"qlabel", $"vec_id", $"label",
          floor(graft.functions.VectorFunctions.cosineSim($"embedding", $"qv")
            * lit(10000.0)).cast("long").as("cos4"))
        .localCheckpoint(false) // one scored scan feeds pos/neg/n_harder
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cos4".desc, $"vec_id")
      val pos = scored.filter($"label" === $"qlabel")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"query_id", $"vec_id".as("pos_id"), $"cos4".as("pos_u"))
      val neg = scored.filter($"label" =!= $"qlabel")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"query_id", $"vec_id".as("neg_id"), $"cos4".as("neg_u"))
      val harder = scored.filter($"label" =!= $"qlabel")
        .join(broadcast(pos), Seq("query_id"))
        .filter($"cos4" >= $"pos_u")
        .groupBy($"query_id").agg(count(lit(1)).as("n_harder"))
      pos.join(neg, Seq("query_id"))
        .join(harder, Seq("query_id"), "left")
        .select($"query_id", $"pos_id", $"neg_id",
          (($"pos_u" - $"neg_u") / lit(10000.0)).as("margin4"),
          coalesce($"n_harder", lit(0L)).as("n_harder"))
        .orderBy($"query_id")
    }),

    // Zipf power-law fit of the corpus unigram distribution — the one-row
    // data-card statistic that tells you whether a corpus looks like
    // natural language (slope ≈ −1) or like templated boilerplate. Closed
    // -form least squares on (ln rank, ln freq): both logs are quantized
    // to integer micro-nats AT THE SCAN so every sum/product stays exact
    // integer algebra; only the final three divisions run in doubles
    // (identical op order on both engines). The vocab-sized rank runs
    // through [[graft.operators.Batching.globalRowNumber]] — one range
    // exchange + parallel local sorts, byte-identical to row_number()
    // under the same total (f desc, w) order, instead of an unpartitioned
    // Window funneling the vocabulary through one task (the q199 hazard
    // class; plan-pinned in SparkOpsSpec).
    "q146_zipf_fit" -> ((s, dir) => {
      import s.implicits._
      val counts = t(s, dir, "documents")
        .select(explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("f"))
      graft.operators.Batching
        .globalRowNumber(counts, Seq($"f".desc, $"w"), 32, "rk")
        .select(floor(log($"rk".cast("double")) * 1000000.0).cast("long").as("x"),
          floor(log($"f".cast("double")) * 1000000.0).cast("long").as("y"))
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
          sum($"y" * $"y").as("syy"))
        .withColumn("num", $"n" * $"sxy" - $"sx" * $"sy")
        .withColumn("denx", $"n" * $"sxx" - $"sx" * $"sx")
        .withColumn("deny", $"n" * $"syy" - $"sy" * $"sy")
        .withColumn("slope", $"num".cast("double") / $"denx".cast("double"))
        .select($"n".as("n_terms"),
          (floor($"slope" * 10000.0) / 10000.0).as("slope4"),
          (floor((($"sy".cast("double") - $"slope" * $"sx".cast("double"))
            / $"n".cast("double") / 1000000.0) * 10000.0) / 10000.0).as("icept4"),
          (floor(($"num".cast("double") * $"num".cast("double"))
            / ($"denx".cast("double") * $"deny".cast("double")) * 10000.0)
            / 10000.0).as("r2_4"))
    }),

    // Per-document n-gram novelty — the inverse of the dup profile: what
    // fraction of a doc's distinct 5-grams appear NOWHERE else in the
    // corpus (high novelty = unique content worth keeping; near-zero =
    // boilerplate assembled from shared runs). Spark shuffles 64-bit gram
    // hashes, never text (q85's convention, 2^-64 collision residual —
    // the oracle rebuilds the same decisions from gram text); one gram
    // hash-agg + one join back, both on the hash key.
    "q148_novelty_score" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val g = docs
        .select($"doc_id", explode(graft.operators.QualitySignals.ngramsStrict(
          graft.operators.TextAnalysis.tokensCol($"text"), 5)).as("g"))
        .select($"doc_id", xxhash64($"g").as("h")).distinct()
        .localCheckpoint(false) // distinct doc-gram set feeds df + per-doc agg
      val df5 = g.groupBy($"h").agg(count(lit(1)).as("nd"))
      val per = g.join(df5, Seq("h"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"nd" === 1, 1L).otherwise(0L)).as("n_unique"))
      docs.select($"doc_id").join(per, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_grams", lit(0L)).as("n_grams"),
          coalesce($"n_unique", lit(0L)).as("n_unique"))
        .withColumn("novelty4",
          when($"n_grams" > 0, expr("(n_unique * 10000) div n_grams") / lit(10000.0))
            .otherwise(lit(0.0)))
        .orderBy($"doc_id")
    }),

    // Label-confusion pairs from embedding geometry: for each vector, its
    // nearest DIFFERENT-label neighbor within its own IVF cell; counts per
    // (label, neighbor label) say which classes blur together — the
    // go-look-here report before training a classifier on the labels.
    // Cell-restricted like q143 (Σ|cell|² pair space, no corpus×corpus).
    "q149_label_confusion" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val cents = graft.operators.IvfIndex.centroids(emb, k = 8, iters = 0)
      val cells = graft.operators.IvfIndex.assign(emb, cents, "vec_id", "embedding")
        .join(emb.select($"vec_id", $"label".cast("long").as("label")), Seq("vec_id"))
        .localCheckpoint(false) // assignment feeds both pair-join sides
      val a = cells.select($"centroid_id", $"vec_id".as("src"),
        $"label".as("label_a"), $"embedding".as("va"))
      val b = cells.select($"centroid_id", $"vec_id".as("dst"),
        $"label".as("label_b"), $"embedding".as("vb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"src").orderBy($"cos4".desc, $"dst")
      a.join(b, Seq("centroid_id"))
        .filter($"src" =!= $"dst" && $"label_a" =!= $"label_b")
        .select($"src", $"dst", $"label_a", $"label_b",
          floor(graft.functions.VectorFunctions.cosineSim($"va", $"vb")
            * lit(10000.0)).cast("long").as("cos4"))
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .groupBy($"label_a", $"label_b").agg(count(lit(1)).as("n_vecs"))
        .orderBy($"label_a", $"label_b")
    }),

    // The WHOLE curation pipeline as one DAG — near-dup survivor filter
    // (q39/q118 LSH clusters, keep min-id) → repetition-quality gate
    // (q136's rule) → stratified 80/10/10 split (q139's rule, stratum
    // sizes computed on the POST-filter population) → per-split token
    // accounting. Proves the operators compose lazily: one submission,
    // Catalyst sees the full lineage, nothing materializes between stages
    // except the deliberate checkpoints inside the reused operators.
    "q150_clean_pipeline" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.nearDupPairs(
        docs, "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 1.0)
      val keep = graft.operators.Dedup.resolveClustersSparse(pairs, docs.select($"doc_id"))
        .filter($"id" === $"keeper_id").select($"id".as("doc_id"))
      val base = docs.join(keep, Seq("doc_id"))
        .select($"doc_id", $"lang", $"source",
          graft.operators.TextAnalysis.tokensCol($"text").as("w"))
        .select($"doc_id", $"lang", $"source", size($"w").cast("long").as("n_tok"), $"w")
        .localCheckpoint(false) // survivors feed three gram profiles + split
      val qs = graft.operators.QualitySignals
      def topCnt(n: Int, out: String) = base
        .select($"doc_id", explode(qs.ngramsStrict($"w", n)).as("g"))
        .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(max($"c").as(out))
      val dup5 = base
        .select($"doc_id", explode(qs.ngramsStrict($"w", 5)).as("g"))
        .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(sum(when($"c" > 1, $"c").otherwise(0L)).as("dup5_cnt"))
      val good = base.select($"doc_id", $"lang", $"source", $"n_tok")
        .join(topCnt(1, "top1_cnt"), Seq("doc_id"), "left")
        .join(topCnt(2, "top2_cnt"), Seq("doc_id"), "left")
        .join(dup5, Seq("doc_id"), "left")
        .withColumn("top1_u", when($"n_tok" > 0,
          expr("(coalesce(top1_cnt, 0) * 10000) div n_tok")).otherwise(lit(0L)))
        .withColumn("top2_u", when($"n_tok" >= 2,
          expr("(coalesce(top2_cnt, 0) * 2 * 10000) div n_tok")).otherwise(lit(0L)))
        .withColumn("dup5_u", when($"n_tok" >= 5,
          expr("(coalesce(dup5_cnt, 0) * 10000) div (n_tok - 4)")).otherwise(lit(0L)))
        .filter(!($"top1_u" > 800 || $"top2_u" > 1000 || $"dup5_u" > 3000))
        .select($"doc_id", $"lang", $"source", $"n_tok")
      val ws = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang", $"source")
        .orderBy(md5(concat(lit("split:"), $"doc_id".cast("string"))), $"doc_id")
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang", $"source")
      good
        .withColumn("rn", row_number().over(ws).cast("long"))
        .withColumn("nn", count(lit(1)).over(wn))
        .withColumn("split",
          when($"rn" * 10 <= $"nn" * 8, "train")
            .when($"rn" * 10 <= $"nn" * 9, "val")
            .otherwise("test"))
        .groupBy($"lang", $"source", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tok"))
        .orderBy($"lang", $"source", $"split")
    }),

    // Per-source quantile normalization of a quality signal — the cross-
    // source calibration step before mixing corpora (a "good" score in a
    // clean source ≠ the same number in a noisy one; percentiles within
    // source are comparable). Score is integer mean-word-length micro;
    // percent_rank is (rank−1)/(n−1) per SOURCE window (strata parallelize
    // — no global window), quantized at 1e-4; the decile is pure integer
    // arithmetic on (rank, n).
    "q151_quality_quantiles" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"score_u")
      val wn = org.apache.spark.sql.expressions.Window.partitionBy($"source")
      t(s, dir, "documents")
        .select($"doc_id", $"source",
          graft.operators.TextAnalysis.tokensCol($"text").as("w"))
        .select($"doc_id", $"source", size($"w").cast("long").as("n_tok"),
          aggregate($"w", lit(0L), (acc, x) => acc + length(x)).as("sum_len"))
        .filter($"n_tok" > 0)
        .withColumn("score_u", expr("(sum_len * 10000) div n_tok"))
        .withColumn("rk", rank().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .select($"doc_id", $"source", ($"score_u" / lit(10000.0)).as("score4"),
          when($"n" > 1, floor(($"rk" - 1).cast("double") / ($"n" - 1).cast("double")
            * lit(10000.0)) / 10000.0).otherwise(lit(0.0)).as("pr4"),
          when($"n" > 1, least(lit(9L), expr("((rk - 1) * 10) div (n - 1)")))
            .otherwise(lit(0L)).as("decile"))
        .orderBy($"doc_id")
    }),

    // Split-leakage audit for q139's stratified split: how many distinct
    // 5-grams do train/val/test SHARE? (A packing or near-dup bug shows up
    // here as a fat train∩test overlap before it shows up as inflated
    // eval numbers.) Spark shuffles 64-bit gram hashes (q85's convention,
    // 2^-64 residual; the oracle replays with gram text); overlap is one
    // hash-keyed self-join of the per-split distinct-gram tables.
    "q152_split_leakage" -> ((s, dir) => {
      import s.implicits._
      val ws = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang", $"source")
        .orderBy(md5(concat(lit("split:"), $"doc_id".cast("string"))), $"doc_id")
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang", $"source")
      // One hash-keyed aggregation carries BOTH the per-split set sizes and
      // every pairwise overlap: collect_set over ≤3 split tags per gram
      // replaces the distinct + hash self-join (three 1M-row shuffles → one
      // shuffle of the raw gram stream); the ≤3-element set explodes into
      // ordered pairs driver-free.
      val sg = t(s, dir, "documents")
        .withColumn("rn", row_number().over(ws).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .withColumn("split",
          when($"rn" * 10 <= $"n" * 8, "train")
            .when($"rn" * 10 <= $"n" * 9, "val")
            .otherwise("test"))
        .select($"split", explode(graft.operators.QualitySignals.ngramsStrict(
          graft.operators.TextAnalysis.tokensCol($"text"), 5)).as("g"))
        .select($"split", xxhash64($"g").as("h"))
        .groupBy($"h").agg(collect_set($"split").as("ss"))
        .localCheckpoint(false) // per-gram split sets feed sizes + overlap
      val sizes = sg.select(explode($"ss").as("split"))
        .groupBy($"split").agg(count(lit(1)).as("n"))
      sg.select(explode($"ss").as("split_a"), $"ss")
        .select($"split_a", explode($"ss").as("split_b"))
        .filter($"split_a" < $"split_b")
        .groupBy($"split_a", $"split_b").agg(count(lit(1)).as("n_shared"))
        .join(broadcast(sizes.select($"split".as("split_a"), $"n".as("n_a"))), Seq("split_a"))
        .join(broadcast(sizes.select($"split".as("split_b"), $"n".as("n_b"))), Seq("split_b"))
        .select($"split_a", $"split_b", $"n_a", $"n_b", $"n_shared",
          (expr("(n_shared * 10000) div (n_a + n_b - n_shared)") / lit(10000.0))
            .as("jac4"))
        .orderBy($"split_a", $"split_b")
    }),

    // Heaps-law vocabulary-growth fit — how fast the type inventory grows
    // as the corpus streams in doc_id order (sizes tokenizer vocab and
    // dedup state for an ingest; β≈0.5-0.8 is healthy natural text, β→1
    // flags ID-heavy or synthetic content). The 20 order-respecting
    // checkpoints come from pure doc_id arithmetic against the (min,max)
    // scalar — NO global window touches the token stream; a type's first
    // bucket is min(bkt) because the bucket map is monotone in doc_id.
    // Cumulative sums run over the 20-row checkpoint table; the fit is
    // q146's integer-sum regression on micro-nat logs.
    "q153_heaps_fit" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val mm = docs.agg(min($"doc_id").as("lo"), (max($"doc_id") + 1L).as("hi"))
      val tok = docs.crossJoin(broadcast(mm))
        .select(expr("((doc_id - lo) * 20) div (hi - lo)").as("bkt"),
          explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
      val perTok = tok.groupBy($"bkt").agg(count(lit(1)).as("n_tok"))
      val perNew = tok.groupBy($"w").agg(min($"bkt").as("bkt"))
        .groupBy($"bkt").agg(count(lit(1)).as("n_new"))
      val wb = org.apache.spark.sql.expressions.Window.orderBy($"bkt")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      perTok.join(perNew, Seq("bkt"), "left")
        .select($"bkt", $"n_tok", coalesce($"n_new", lit(0L)).as("n_new"))
        .select(sum($"n_tok").over(wb).as("ct"), sum($"n_new").over(wb).as("cv"))
        .select(floor(log($"ct".cast("double")) * 1000000.0).cast("long").as("x"),
          floor(log($"cv".cast("double")) * 1000000.0).cast("long").as("y"))
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
          sum($"y" * $"y").as("syy"))
        .withColumn("num", $"n" * $"sxy" - $"sx" * $"sy")
        .withColumn("denx", $"n" * $"sxx" - $"sx" * $"sx")
        .withColumn("deny", $"n" * $"syy" - $"sy" * $"sy")
        // deny = 0 ⇔ the vocabulary saturated before the second checkpoint
        // (constant y): the horizontal line is then the exact fit — slope
        // 0, r² defined as 1. Guarded on BOTH engines (ANSI errors on the
        // 0 divisor instead of yielding NaN).
        .withColumn("slope", when($"denx" > 0,
          $"num".cast("double") / $"denx".cast("double")).otherwise(lit(0.0)))
        .select($"n".as("n_points"),
          (floor($"slope" * 10000.0) / 10000.0).as("beta4"),
          (floor((($"sy".cast("double") - $"slope" * $"sx".cast("double"))
            / $"n".cast("double") / 1000000.0) * 10000.0) / 10000.0).as("icept4"),
          when($"denx" > 0 && $"deny" > 0,
            floor(($"num".cast("double") * $"num".cast("double"))
              / ($"denx".cast("double") * $"deny".cast("double")) * 10000.0)
              / 10000.0).otherwise(lit(1.0)).as("r2_4"))
    }),

    // Winsorized robust stats per source — rank-exact p05/p95 clipping of
    // the length signal before the mean: the robust alternative to
    // DROPPING outlier docs (clip, don't discard — keeps token mass).
    // Nearest-rank percentiles with a doc_id tie-break are exact and
    // engine-agnostic (no interpolation); the rank window partitions by
    // source so strata parallelize, the cut table is source-count-sized
    // and broadcast back, and everything after the rank is integer
    // arithmetic quantized at 1e-4.
    "q154_winsorize" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"n_chars", $"doc_id")
      val wn = org.apache.spark.sql.expressions.Window.partitionBy($"source")
      val r = t(s, dir, "documents")
        .select($"source", $"doc_id", $"n_chars")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
      val cuts = r.groupBy($"source")
        .agg(max(when($"rn" === expr("(n * 5 + 99) div 100"), $"n_chars")).as("p05"),
          max(when($"rn" === expr("(n * 95 + 99) div 100"), $"n_chars")).as("p95"))
      r.join(broadcast(cuts), Seq("source"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), max($"p05").as("p05"), max($"p95").as("p95"),
          expr("(sum(n_chars) * 10000) div count(1)").as("mr"),
          expr("(sum(least(greatest(n_chars, p05), p95)) * 10000) div count(1)")
            .as("mw"))
        .select($"source", $"n_docs", $"p05", $"p95",
          ($"mr" / lit(10000.0)).as("mean_raw4"),
          ($"mw" / lit(10000.0)).as("mean_wins4"))
        .orderBy($"source")
    }),

    // First-order Markov transition matrix over each user's event stream —
    // the behavioral fingerprint (what follows what) behind bot detection
    // (deterministic loops) and load simulation. Ordering is within-user
    // only (lead over the user window — strata parallelize; no global
    // sort); probabilities are integer arithmetic on pair/row counts; the
    // per-state totals table is state-count-sized and broadcast. Timestamps
    // compare in the µs domain (NANOS parquet, DuckDB truncates on read)
    // with event_id breaking equal-ts ties on both engines.
    "q155_event_transitions" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"tu", $"event_id")
      val pairs = t(s, dir, "events")
        .select($"user_id", $"event_id", expr("ts div 1000").as("tu"),
          $"event_type".as("cur"))
        .withColumn("nxt", lead($"cur", 1).over(w))
        .filter($"nxt".isNotNull)
        .groupBy($"cur", $"nxt").agg(count(lit(1)).as("n_pair"))
      val tot = pairs.groupBy($"cur").agg(sum($"n_pair").as("n_cur"))
      pairs.join(broadcast(tot), Seq("cur"))
        .select($"cur", $"nxt", $"n_pair", $"n_cur",
          (expr("(n_pair * 10000) div n_cur") / lit(10000.0)).as("p4"))
        .orderBy($"cur", $"nxt")
    }),

    // Corpus-balance audit: entropies of the lang and source marginals,
    // their joint, and the mutual information between the two fields —
    // MI ≈ 0 means language mix is uniform across sources (safe to sample
    // by either alone); high NMI means a source IS a language and mixture
    // weights must be set jointly. Everything reduces on the (lang,
    // source) cell table (tens of rows); each -p·ln p term floor-quantizes
    // to integer micro-nats the moment it is computed, so the distributed
    // sums and the MI subtraction are exact cross-engine.
    "q156_lang_source_mi" -> ((s, dir) => {
      import s.implicits._
      def entU(cnt: Column, n: Column): Column =
        floor(-(cnt.cast("double") / n.cast("double"))
          * log(cnt.cast("double") / n.cast("double")) * lit(1000000.0)).cast("long")
      val cells = t(s, dir, "documents")
        .groupBy($"lang", $"source").agg(count(lit(1)).as("c"))
        .localCheckpoint(false) // cell table feeds all three entropy aggs
      val nRow = broadcast(cells.agg(sum($"c").as("n")))
      val hj = cells.crossJoin(nRow).agg(sum(entU($"c", $"n")).as("hj_u"))
      val hl = cells.groupBy($"lang").agg(sum($"c").as("cl")).crossJoin(nRow)
        .agg(sum(entU($"cl", $"n")).as("hl_u"))
      val hs = cells.groupBy($"source").agg(sum($"c").as("cs")).crossJoin(nRow)
        .agg(sum(entU($"cs", $"n")).as("hs_u"))
      nRow.crossJoin(broadcast(hl)).crossJoin(broadcast(hs)).crossJoin(broadcast(hj))
        .withColumn("mi_u", $"hl_u" + $"hs_u" - $"hj_u")
        .select($"n".as("n_docs"),
          ($"hl_u" / lit(1000000.0)).as("h_lang6"),
          ($"hs_u" / lit(1000000.0)).as("h_source6"),
          ($"hj_u" / lit(1000000.0)).as("h_joint6"),
          ($"mi_u" / lit(1000000.0)).as("mi6"),
          (when(least($"hl_u", $"hs_u") > 0,
            expr("(mi_u * 10000) div least(hl_u, hs_u)"))
            .otherwise(lit(0L)) / lit(10000.0)).as("nmi4"))
    }),

    // Triangle census of the STRONG near-dup pair graph — the structural
    // honesty check on a candidate set: true duplicate clusters are
    // cliques (transitivity → 1); open wedges are banding artifacts /
    // chained borderline matches that cluster resolution would glue into
    // one spurious group. Threshold 0.75 (est_jac ≥ 6/8) picks the graph
    // worth auditing: triangle ENUMERATION is Θ(wedges) in any algorithm,
    // and this templated corpus's 0.5-graph is a near-clique soup (90M
    // oriented wedges at sf0.1, measured — vs 649k at 0.75) whose census
    // answers nothing a cluster audit asks. Degree-ordered orientation
    // bounds the wedge join's fan-out by O(√E) per node; counts are exact
    // integers, the one float division is pre-quantized. See
    // [[graft.operators.GraphMetrics]].
    "q147_dup_triangles" -> ((s, dir) => {
      val pairs = graft.operators.Dedup.nearDupPairs(
        t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.75)
      graft.operators.GraphMetrics.triangleSummary(pairs, "id_a", "id_b")
    }),

    // EWMA smoothing of the hourly event series with EXACT integer
    // arithmetic: weights are powers of two (α = 1/2 over a 24-hour
    // horizon), so numerator and denominator are order-free BIGINT sums —
    // no float pow, no engine-ordered accumulation, bit-identical on any
    // partitioning. The q72 z-score flags deviation from a flat mean; the
    // EWMA baseline discounts the past geometrically, the load-forecast
    // shape. Missing hours contribute nothing (sparse EWMA; q125's dense
    // spine is the zero-filled alternative). Scale: the fan-out join is
    // 24× a TIME-BUCKET-sized table, never corpus-sized.
    "q157_ewma_hourly" -> ((s, dir) => {
      import s.implicits._
      val hourly = t(s, dir, "events")
        .select(expr("ts div 3600000000000").as("hour_bucket"))
        .groupBy($"hour_bucket").agg(count(lit(1)).as("n"))
        .localCheckpoint(false) // contributions + the target join read it
      val contrib = hourly
        .select($"hour_bucket", $"n", explode(expr("sequence(1, 24)")).as("k"))
        .select(($"hour_bucket" + $"k").as("hour_bucket"),
          expr("n * shiftleft(cast(1 as bigint), 24 - k)").as("wn"),
          expr("shiftleft(cast(1 as bigint), 24 - k)").as("wt"))
        .groupBy($"hour_bucket")
        .agg(sum($"wn").as("num"), sum($"wt").as("den"),
          count(lit(1)).as("n_prior"))
      hourly.join(contrib, Seq("hour_bucket"), "left")
        .select($"hour_bucket", $"n",
          coalesce($"n_prior", lit(0L)).as("n_prior"),
          when($"den" > 0, expr("(num * 10000) div den") / lit(10000.0))
            .as("smooth4"),
          when($"den" > 0,
            when($"n" * $"den" > lit(2L) * $"num", lit(1L)).otherwise(lit(0L)))
            .as("spike"))
        .orderBy($"hour_bucket")
    }),

    // IVF nprobe sweep — the tuning report an ANN deployment reads before
    // fixing its recall/cost point: recall@10 vs the brute-force truth at
    // nprobe ∈ {1,2,4,8}. One corpus assignment scan + ONE candidate
    // scoring join feed all four sweep points (cell_rank ≤ nprobe filters
    // a shared scored relation — the sweep never rescans the corpus); the
    // brute truth is one more scan with the 16 queries broadcast. Output
    // is sweep-sized.
    "q158_ivf_probe_sweep" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter($"vec_id" < 16)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val cents = graft.operators.IvfIndex.centroids(emb, k = 0, iters = 0)
      val cells = graft.operators.IvfIndex.assign(emb, cents, "vec_id", "embedding")
      // every centroid ranked per query — the probe order, k-sized per query
      val wq = Window.partitionBy($"query_id").orderBy($"csc".desc, $"centroid_id")
      val qcells = queries.crossJoin(broadcast(cents))
        .select($"query_id", $"qv", $"centroid_id",
          VectorFunctions.cosineSim($"qv", $"centroid").as("csc"))
        .withColumn("cell_rank", row_number().over(wq))
        .select($"query_id", $"qv", $"centroid_id", $"cell_rank")
      val cand = cells.join(broadcast(qcells), Seq("centroid_id"))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"cell_rank", $"vec_id",
          VectorFunctions.cosineSim($"embedding", $"qv").as("sc"))
        .localCheckpoint(false) // one scored relation feeds all sweep points
      val wb = Window.partitionBy($"query_id").orderBy($"sc".desc, $"vec_id")
      val brute = emb.crossJoin(broadcast(queries))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id",
          VectorFunctions.cosineSim($"embedding", $"qv").as("sc"))
        .withColumn("rn", row_number().over(wb)).filter($"rn" <= 10)
        .select($"query_id", $"vec_id")
        .localCheckpoint(false) // k·queries-sized truth set
      val sweep = Seq(1L, 2L, 4L, 8L).toDF("nprobe")
      val wk = Window.partitionBy($"nprobe", $"query_id")
        .orderBy($"sc".desc, $"vec_id")
      val hits = cand.join(broadcast(sweep), $"cell_rank" <= $"nprobe")
        .withColumn("rn", row_number().over(wk)).filter($"rn" <= 10)
        .join(brute, Seq("query_id", "vec_id"))
        .groupBy($"nprobe").agg(count(lit(1)).as("n_hits"))
      val nq = queries.agg(count(lit(1)).as("n_q"))
      sweep.join(hits, Seq("nprobe"), "left").crossJoin(broadcast(nq))
        .select($"nprobe", coalesce($"n_hits", lit(0L)).as("n_hits"),
          (expr("(coalesce(n_hits, 0) * 10000) div (n_q * 10)") / lit(10000.0))
            .as("recall4"))
        .orderBy($"nprobe")
    }),

    // Exact corpus percentiles WITHOUT a global sort — two histogram-sized
    // shuffles locate each nearest-rank order statistic (the audit/SLA
    // numbers approx_percentile can't certify). See
    // [[graft.operators.ExactQuantiles]] for the refinement scheme.
    "q159_exact_quantiles" -> ((s, dir) =>
      graft.operators.ExactQuantiles.quantiles(
        t(s, dir, "documents"), "n_chars",
        probs4 = Seq(2500L, 5000L, 7500L, 9000L, 9900L), coarseWidth = 64L)),

    // Join-cardinality estimation from per-key statistics — the CBO
    // question ("how big is this join?") answered from k-row sketches
    // BEFORE paying the join: per side, a count histogram collapses to 5
    // exact heavy hitters (TopKAgg — the q129 diagnostic) plus residual
    // (n_rest, d_rest) scalars; the estimate is exact on HH∩HH, uniform
    // (n div d) on the residual — System-R's containment assumption with
    // the skew mass factored out, in integer arithmetic throughout. The
    // query ALSO runs the exact join (this is the estimator's validation
    // report; a deployment computes only the k-row statistics side).
    "q160_join_estimate" -> ((s, dir) => {
      import s.implicits._
      val topk = udaf(new graft.operators.TopKAgg(5),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
      def stats(df: DataFrame, key: String): (DataFrame, DataFrame) = {
        val counts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // one count shuffle feeds HH + totals
        val hh = counts.agg(topk($"c", $"k").as("top"))
          .select(posexplode($"top"))
          .select($"col._2".as("k"), $"col._1".as("c"))
        (hh, counts.agg(sum($"c").as("n"), count(lit(1)).as("d")))
      }
      val ev = t(s, dir, "events")
      val ord = t(s, dir, "orders")
      val (ha, ta) = stats(ev, "user_id")
      val (hb, tb) = stats(ord, "o_custkey")
      val sa = ha.agg(coalesce(sum($"c"), lit(0L)).as("n_hh_a"),
        count(lit(1)).as("d_hh_a"))
      val sb = hb.agg(coalesce(sum($"c"), lit(0L)).as("n_hh_b"),
        count(lit(1)).as("d_hh_b"))
      val bth = ha.join(hb.select($"k", $"c".as("cb")), Seq("k"))
        .agg(coalesce(sum($"c" * $"cb"), lit(0L)).as("est_hh"))
      val aon = ha.join(hb.select($"k"), Seq("k"), "left_anti")
        .agg(coalesce(sum($"c"), lit(0L)).as("ca_only"))
      val bon = hb.join(ha.select($"k"), Seq("k"), "left_anti")
        .agg(coalesce(sum($"c"), lit(0L)).as("cb_only"))
      val exact = ev.join(ord, $"user_id" === $"o_custkey")
        .agg(count(lit(1)).as("exact_rows"))
      broadcast(ta.select($"n".as("n_a"), $"d".as("d_a")))
        .crossJoin(broadcast(tb.select($"n".as("n_b"), $"d".as("d_b"))))
        .crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
        .crossJoin(broadcast(bth)).crossJoin(broadcast(aon))
        .crossJoin(broadcast(bon)).crossJoin(broadcast(exact))
        .withColumn("nra", $"n_a" - $"n_hh_a")
        .withColumn("dra", $"d_a" - $"d_hh_a")
        .withColumn("nrb", $"n_b" - $"n_hh_b")
        .withColumn("drb", $"d_b" - $"d_hh_b")
        .withColumn("est_rows",
          $"est_hh"
            + $"ca_only" * expr("nrb div greatest(drb, 1)")
            + $"cb_only" * expr("nra div greatest(dra, 1)")
            + expr("(nra * nrb) div greatest(greatest(dra, drb), 1)"))
        .select($"n_a", $"d_a", $"n_b", $"d_b", $"est_rows", $"exact_rows",
          (expr("(abs(est_rows - exact_rows) * 10000) div exact_rows")
            / lit(10000.0)).as("err4"))
    }),

    // Robust anomaly flags — median/MAD instead of mean/σ (q72's z-score
    // breaks down exactly when it matters: a burst inflates the trailing
    // mean AND the variance, masking itself; the median ignores up to 50%
    // contamination). Per event type over its hourly counts: med =
    // nearest-rank median, MAD = nearest-rank median of |n − med|, flag
    // when |n − med| · 10 > 3 · 10 · MAD computed as exact integer
    // cross-multiplication (the 1.4826 σ-consistency constant folds into
    // the threshold: 3·MAD here ≈ 2σ under normality). Windows partition
    // by TYPE — strata parallelize; the per-type relations are
    // hour-count-sized.
    "q161_robust_anomaly" -> ((s, dir) => {
      import s.implicits._
      val hourly = t(s, dir, "events")
        .select($"event_type", expr("ts div 3600000000000").as("hour_bucket"))
        .groupBy($"event_type", $"hour_bucket").agg(count(lit(1)).as("n"))
        .localCheckpoint(false) // feeds the median, the MAD and the flags
      val wm = Window.partitionBy($"event_type").orderBy($"n", $"hour_bucket")
      val wc = Window.partitionBy($"event_type")
      val med = hourly
        .withColumn("rn", row_number().over(wm).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wc))
        .filter($"rn" === expr("(cnt + 1) div 2"))
        .select($"event_type", $"n".as("med"))
      val dev = hourly.join(broadcast(med), Seq("event_type"))
        .withColumn("ad", abs($"n" - $"med"))
      val wd = Window.partitionBy($"event_type").orderBy($"ad", $"hour_bucket")
      val mad = dev
        .withColumn("rn", row_number().over(wd).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wc))
        .filter($"rn" === expr("(cnt + 1) div 2"))
        .select($"event_type", $"ad".as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_hours"), max($"med").as("med"),
          max($"mad").as("mad"),
          sum(when($"ad" > lit(3L) * $"mad", 1L).otherwise(0L)).as("n_anomalies"),
          // worst hour = argmax deviation, ties to the later hour — packed
          // as one integer so the same max is exact on any engine
          max(when($"ad" > lit(3L) * $"mad",
            $"ad" * lit(10000000L) + $"hour_bucket")).as("w"))
        .select($"event_type", $"n_hours", $"med", $"mad", $"n_anomalies",
          when($"w".isNotNull, pmod($"w", lit(10000000L))).as("worst_hour"))
        .orderBy($"event_type")
    }),

    // Two-proportion A/B test — the experimentation primitive: users hash
    // into cohorts (q58's stable split hash, so assignment is reproducible
    // and joins nothing), conversion = share of purchase events, and the
    // pooled two-proportion z-statistic decides significance. All counts
    // are exact integers; the z formula runs in doubles with IDENTICAL
    // operation order on both engines and floor-quantizes at 1e-4 (q72's
    // transcendental policy); the 1.96 significance gate compares the
    // QUANTIZED z so the decision is integer-exact. One scan, one
    // cohort-sized aggregate.
    "q162_ab_test" -> ((s, dir) => {
      import s.implicits._
      val cohort = pmod(graft.functions.HashFunctions
        .stableHash64(concat(lit("ab:"), $"user_id".cast("string"))), lit(2L))
      val g = t(s, dir, "events")
        .select(cohort.as("cohort"),
          ($"event_type" === "purchase").cast("long").as("is_conv"))
        .groupBy($"cohort")
        .agg(count(lit(1)).as("n"), sum($"is_conv").as("k"))
      val a = g.filter($"cohort" === 0).select($"n".as("n0"), $"k".as("k0"))
      val b = g.filter($"cohort" === 1).select($"n".as("n1"), $"k".as("k1"))
      broadcast(a).crossJoin(broadcast(b))
        .withColumn("p0_4", expr("(k0 * 10000) div n0"))
        .withColumn("p1_4", expr("(k1 * 10000) div n1"))
        // degenerate pooled rates (no conversions anywhere, or nothing
        // but conversions) put a 0 under the sqrt: Spark would yield
        // NaN/Infinity → null while DuckDB's floor(NaN)::BIGINT errors —
        // gate the z identically on both engines so the edge is DEFINED
        // (null z, null significance) rather than engine-divergent
        .withColumn("z4", when(
          ($"k0" + $"k1") > lit(0L) && ($"k0" + $"k1") < ($"n0" + $"n1"),
          floor(
            (($"k0".cast("double") / $"n0".cast("double"))
              - ($"k1".cast("double") / $"n1".cast("double")))
              / sqrt((($"k0" + $"k1").cast("double") / ($"n0" + $"n1").cast("double"))
                * (lit(1.0) - ($"k0" + $"k1").cast("double") / ($"n0" + $"n1").cast("double"))
                * (lit(1.0) / $"n0".cast("double") + lit(1.0) / $"n1".cast("double")))
              * lit(10000.0)).cast("long")))
        .select($"n0", $"k0", $"n1", $"k1", $"p0_4", $"p1_4", $"z4",
          when($"z4".isNotNull, (abs($"z4") > 19600L).cast("int"))
            .as("significant"))
    }),

    // Funnel latency percentiles — median/p90/p99 time from a user's first
    // 'view' to their first subsequent 'purchase', in EXACT order
    // statistics: the per-user delta table reduces from one scan (two
    // conditional min aggregates), and the percentiles come from
    // [[graft.operators.ExactQuantiles]] — two histogram-sized shuffles
    // with 1-hour coarse buckets, no global sort of the latency column.
    // The number an SLA quotes ("p99 conversion lag") certified exactly.
    "q163_conversion_lag" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"user_id", expr("ts div 1000").as("ts_us"), $"event_type")
      val firstView = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts_us").as("t_view"))
      // per-user relation joins on user_id — shuffle-hash at scale, NOT
      // broadcast: the user dimension grows with the corpus
      val deltas = ev.filter($"event_type" === "purchase")
        .join(firstView, Seq("user_id"))
        .filter($"ts_us" >= $"t_view")
        .groupBy($"user_id").agg(min($"ts_us" - $"t_view").as("lag_us"))
      graft.operators.ExactQuantiles.quantiles(
        deltas, "lag_us", probs4 = Seq(5000L, 9000L, 9900L),
        coarseWidth = 3600000000L)
    }),

    // Dedup component-size distribution — the audit a deployment reads
    // BEFORE committing cluster resolution: a healthy near-dup graph is
    // mostly singletons and small cliques; a giant component (here a
    // 102-doc cluster holding 20% of the corpus at sf0.01) is the
    // signature of chained borderline matches about to collapse a fifth
    // of the corpus into one survivor. Pairs → min-label components
    // (q53's machinery on q147's strong graph) → size histogram; the
    // distribution is component-count-sized, shares in exact 1e-4 units.
    "q164_component_sizes" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.75)
      val labels = graft.operators.Dedup
        .resolveClusters(pairs, docs.select($"doc_id"))
      val sizes = labels.groupBy($"keeper_id").agg(count(lit(1)).as("sz"))
      val tot = labels.agg(count(lit(1)).as("n"))
      sizes.groupBy($"sz".as("size")).agg(count(lit(1)).as("n_components"))
        .crossJoin(broadcast(tot))
        .select($"size", $"n_components",
          ($"size" * $"n_components").as("n_docs"),
          (expr("(size * n_components * 10000) div n") / lit(10000.0))
            .as("share4"))
        .orderBy($"size")
    }),

    // q164's audit wired to a REMEDY: Dedup.guardedClusters flags
    // components above 10% of the corpus and leaves them UNCOLLAPSED
    // (every member survives, keeper_id = id) instead of silently welding
    // a fifth of the corpus into one survivor — transitive band-collision
    // similarity is not similarity. Per-component report of the decision;
    // at sf0.01 the 102-doc chain (20% share) exercises the flagged path
    // while the small components keep collapsing. The guard costs one
    // component-sized aggregate + a scalar-count broadcast — never a
    // corpus-wide shuffle.
    "q165_guarded_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.75)
      val guarded = graft.operators.Dedup.guardedClusters(
        pairs, docs.select($"doc_id"), maxShare4 = 1000L)
      val tot = docs.agg(count(lit(1)).as("n"))
      guarded.groupBy($"component_id")
        .agg(count(lit(1)).as("n_members"), max($"flagged").as("flagged"),
          count_distinct($"keeper_id").as("n_survivors"))
        .filter($"n_members" >= 2)
        .crossJoin(broadcast(tot))
        .select($"component_id", $"n_members",
          (expr("(n_members * 10000) div n") / lit(10000.0)).as("share4"),
          $"flagged", $"n_survivors")
        .orderBy($"component_id")
    }),

    // Learned IVF centroids vs the seed grid — q158's sweep measured an
    // UNLEARNED grid (iters = 0: centroids are the k lowest-id vectors);
    // this query runs the same recall@10 sweep on BOTH grids after 2
    // deterministic Lloyd steps (assign → positional mean, empty cells
    // keep their centroid — all relational: the oracle replays the
    // posexplode+avg iteration in SQL, float-cast at each step like
    // meanVectors). Learned cells track the data distribution, so the
    // same nprobe budget recovers more of the brute-force truth — the
    // measured gap is the evidence the Lloyd machinery earns its cost.
    // One corpus assignment + one candidate-scoring join per grid; k is
    // data-driven (autoK) on both.
    "q166_ivf_learned" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter($"vec_id" < 16)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      // resolve the data-driven k ONCE: each centroids(k = 0) call would
      // otherwise run its own corpus count action
      val autoK = graft.operators.IvfIndex.autoK(emb)
      val cents0 = graft.operators.IvfIndex.centroids(emb, k = autoK, iters = 0)
      val cents2 = graft.operators.IvfIndex.centroids(emb, k = autoK, iters = 2)
      val wb = Window.partitionBy($"query_id").orderBy($"sc".desc, $"vec_id")
      val brute = emb.crossJoin(broadcast(queries))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id",
          VectorFunctions.cosineSim($"embedding", $"qv").as("sc"))
        .withColumn("rn", row_number().over(wb)).filter($"rn" <= 10)
        .select($"query_id", $"vec_id")
        .localCheckpoint(false) // 10·queries-sized truth feeds both sweeps
      def sweep(cents: DataFrame, grid: String): DataFrame = {
        val cells = graft.operators.IvfIndex.assign(emb, cents, "vec_id", "embedding")
        val wq = Window.partitionBy($"query_id").orderBy($"csc".desc, $"centroid_id")
        val qcells = queries.crossJoin(broadcast(cents))
          .select($"query_id", $"qv", $"centroid_id",
            VectorFunctions.cosineSim($"qv", $"centroid").as("csc"))
          .withColumn("cell_rank", row_number().over(wq))
          .select($"query_id", $"qv", $"centroid_id", $"cell_rank")
        val cand = cells.join(broadcast(qcells), Seq("centroid_id"))
          .filter($"vec_id" =!= $"query_id")
          .select($"query_id", $"cell_rank", $"vec_id",
            VectorFunctions.cosineSim($"embedding", $"qv").as("sc"))
          .localCheckpoint(false) // one scored relation feeds all sweep points
        val sweepDf = Seq(1L, 2L, 4L).toDF("nprobe")
        val wk = Window.partitionBy($"nprobe", $"query_id")
          .orderBy($"sc".desc, $"vec_id")
        val hits = cand.join(broadcast(sweepDf), $"cell_rank" <= $"nprobe")
          .withColumn("rn", row_number().over(wk)).filter($"rn" <= 10)
          .join(brute, Seq("query_id", "vec_id"))
          .groupBy($"nprobe").agg(count(lit(1)).as("n_hits"))
        val nq = queries.agg(count(lit(1)).as("n_q"))
        sweepDf.join(hits, Seq("nprobe"), "left").crossJoin(broadcast(nq))
          .select(lit(grid).as("grid"), $"nprobe",
            coalesce($"n_hits", lit(0L)).as("n_hits"),
            (expr("(coalesce(n_hits, 0) * 10000) div (n_q * 10)") / lit(10000.0))
              .as("recall4"))
      }
      sweep(cents0, "seed").unionByName(sweep(cents2, "lloyd2"))
        .orderBy($"grid", $"nprobe")
    }),

    // Nightly incremental span-dedup as a shipped query: docs >= 400 are
    // tonight's delta, the spanIndex of the base (< 400) stands in for
    // the stored parquet gram index (ScaleProbe materializes the same
    // relation). The oracle IS the parity property: the full-corpus
    // keep-first apply (q131's recursive SQL) restricted to the delta —
    // the driver gate certifies the combined-rank drop rule
    // (n_base >= 1 ∨ rn_delta >= 2 under append-only id order) end to
    // end. Timed cost at scale: the delta's gram stream + one probe of
    // the index — never a base re-scan (10× probe row).
    "q167_span_incremental" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val idx = graft.operators.SpanDedup.spanIndex(
        docs.filter($"doc_id" < 400), "doc_id",
        graft.operators.TextAnalysis.tokensCol($"text"), k = 5)
      graft.operators.SpanDedup.applySpanDedupIncremental(
        idx, docs.filter($"doc_id" >= 400), "doc_id",
        graft.operators.TextAnalysis.tokensCol($"text"), k = 5, minCount = 2)
        .orderBy($"doc_id")
    }),

    // The join advisor over real tables — three scenarios through
    // Salting.adviseJoin's decision ladder (broadcast budget → hot-key
    // salt → plain shuffle), each reported with the k-row sketch scalars
    // the decision read. `has_hot_*` is the EXISTS(count > threshold)
    // predicate (exactly oracle-replicable: any key above the threshold
    // is by definition inside the top-k probe). The advice costs two
    // distinct-key-sized count shuffles per scenario; every strategy is a
    // row-identical join, so a wrong guess costs time, never correctness.
    "q168_join_advice" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"user_id".as("k"))
      val ord = t(s, dir, "orders").select($"o_custkey".as("k"))
      val cust = t(s, dir, "customer").select($"c_nationkey".as("k"))
      val nat = t(s, dir, "nation").select($"n_nationkey".as("k"))
      def row(name: String, l: DataFrame, r: DataFrame,
          bRows: Long, hThresh: Long) = {
        val a = graft.operators.Salting.adviseJoin(l, r, "k", bRows, hThresh)
        (name, a.left.rows, a.left.distinctKeys, a.right.rows,
          a.right.distinctKeys, if (a.left.hot.nonEmpty) 1 else 0,
          if (a.right.hot.nonEmpty) 1 else 0, a.strategy, a.broadcastSide)
      }
      Seq(
        row("fact_fact", ev, ord, 1000L, 1000000000000L),
        row("fact_dim", cust, nat, 1000L, 1000000000000L),
        row("forced_salt", ev, ord, 0L, 0L))
        .toDF("scenario", "n_left", "d_left", "n_right", "d_right",
          "has_hot_left", "has_hot_right", "strategy", "broadcast_side")
        .orderBy($"scenario")
    }),

    // Distributed runtime-filter join: a mergeable Bloom Aggregator built
    // on the FILTERED dim side (partial+final word-OR; the build shuffle
    // carries numWords longs per partition, never keys), broadcast as one
    // array row, prunes the fact side BEFORE the join's exchange — at
    // 100 TB the join shuffle carries (matching + ~1-2% fp) lineitems
    // instead of the full fact table, and the exact join that follows
    // makes false positives a time cost, never a correctness one, so the
    // oracle is the PLAIN join. The probe check is pure built-in
    // shift/AND arithmetic (whole-stage codegen; no UDF on the fact
    // scan). Unlike q87's df.stat.bloomFilter the filter is never
    // driver-merged. Filter is auto-sized from one count of the dim side
    // (~10 bits/key, power-of-two words).
    "q169_bloom_prune" -> ((s, dir) => {
      import s.implicits._
      val ordF = t(s, dir, "orders")
        .filter($"o_orderstatus" === "F" &&
          $"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      val pruned = graft.operators.BloomSketch.prune(
        t(s, dir, "lineitem"),
        graft.functions.HashFunctions.stableHash64($"l_orderkey"),
        ordF, graft.functions.HashFunctions.stableHash64($"o_orderkey"))
      pruned.join(ordF, pruned("l_orderkey") === ordF("o_orderkey"))
        .groupBy($"o_orderpriority",
          date_format($"o_orderdate", "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_items"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4)
            .as("revenue"))
        .orderBy($"o_orderpriority", $"month")
    }),

    // 2-core of the borderline near-dup graph (threshold 0.5 — the graph
    // where chains live): iterative degree peel, 8 bounded rounds. Read
    // NEXT TO q164's component sizes: a big component that vanishes under
    // peeling was a fragile chain of borderline matches (raise the
    // threshold), one that survives densely is a template farm
    // (genuinely one document). Each round is a node-sized degree agg +
    // two semi-joins, edge set shrinks monotonically; a no-op round
    // changes nothing, so the oracle replays exactly 8 peels.
    "q170_dup_kcore" -> ((s, dir) => {
      import s.implicits._
      val pairs = graft.operators.Dedup.nearDupPairs(
        t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.5)
      graft.operators.GraphMetrics.kCore(pairs, "id_a", "id_b", k = 2, rounds = 8)
        .select($"v".as("doc_id"), $"core_degree")
        .orderBy($"doc_id")
    }),

    // Declarative data-constraint report (the Deequ/Great-Expectations
    // gate a 100 TB ingest runs BEFORE publishing a snapshot): six
    // constraint metrics fused into ONE partial+final aggregation pass
    // over the event scan — completeness, key uniqueness, value domain,
    // range, enum membership, and an SLO share — plus one referential
    // check as a lineitem→orders anti-join count. Fusing is the point at
    // scale: a naive validator runs one job per constraint (6 scans of
    // the fact table); here every metric is a conditional count riding
    // the same scan, and the report explodes from the ONE-ROW aggregate.
    // All metrics are integer-quantized fractions (exact on both
    // engines); error_share deliberately FAILS on this corpus (20%
    // errors vs a 1% SLO) so the unsatisfied path is exercised.
    "q171_constraint_report" -> ((s, dir) => {
      import s.implicits._
      val allowed = Seq("view", "click", "purchase", "signup", "error")
      val m = broadcast(t(s, dir, "events").agg(
        count(lit(1)).as("n"),
        count($"props").as("n_props"),
        count_distinct($"event_id").as("n_eid"),
        sum(($"value" >= 0).cast("long")).as("n_nonneg"),
        sum($"event_type".isin(allowed: _*).cast("long")).as("n_domain"),
        // engine-side ts is epoch NANOS (Tables.load); bounds are the UTC
        // nano instants of 2024-01-01 / 2024-02-01 — the oracle compares
        // the same instants as TIMESTAMP literals
        sum(($"ts" >= lit(1704067200000000000L) &&
          $"ts" < lit(1706745600000000000L)).cast("long")).as("n_window"),
        sum(($"event_type" === "error").cast("long")).as("n_err")))
      def fr(cnt: String) = (expr(s"($cnt * 10000) div n") / lit(10000.0))
      def row(name: String, metric: Column, op: String, thresh: Double) = {
        val sat = (if (op == ">=") metric >= lit(thresh) else metric <= lit(thresh))
        struct(lit(name).as("check_name"), metric.as("metric4"),
          lit(op).as("op"), lit(thresh).as("threshold4"),
          sat.cast("int").as("satisfied"))
      }
      val evRows = m.select(explode(array(
        row("complete_props", fr("n_props"), ">=", 0.999),
        row("domain_event_type", fr("n_domain"), ">=", 0.999),
        row("error_share_slo", fr("n_err"), "<=", 0.01),
        row("nonneg_value", fr("n_nonneg"), ">=", 0.999),
        row("ts_in_window", fr("n_window"), ">=", 0.999),
        row("unique_event_id", fr("n_eid"), ">=", 0.9999))).as("c"))
        .select($"c.*")
      val li = t(s, dir, "lineitem")
      val orphans = broadcast(
        li.join(t(s, dir, "orders"), li("l_orderkey") === $"o_orderkey", "left_anti")
          .agg(count(lit(1)).as("n_orphan"))
          .crossJoin(broadcast(li.agg(count(lit(1)).as("n")))))
      // zero-tolerance rule: the metric is the RAW orphan COUNT, never a
      // quantized share — (5 orphans · 10⁴) div 10⁶ rows floors to 0.0 and
      // would report a violated FK as satisfied
      val fkRow = orphans.select(
        lit("fk_lineitem_orders").as("check_name"),
        $"n_orphan".cast("double").as("metric4"),
        lit("<=").as("op"), lit(0.0).as("threshold4"),
        ($"n_orphan".cast("double") <= lit(0.0)).cast("int").as("satisfied"))
      evRows.unionByName(fkRow).orderBy($"check_name")
    }),

    // Sketch-rollup table: per-(source, lang) HLL registers built ONCE
    // from the token scan, then re-aggregated to per-source and global
    // distinct-vocabulary estimates by element-wise register max — the
    // raw key stream is never rescanned for the coarser grains. This is
    // the storage pattern a 100 TB nightly job wants: persist the
    // fine-grain register table (groups × 64 ints), answer every
    // coarser distinct question from it exactly as the fine scan would
    // have (registers are a max-monoid — rollup is lossless, not an
    // approximation of the approximation). Exact distinct counts ride
    // along from one checkpointed vocab relation as calibration.
    "q172_sketch_rollup" -> ((s, dir) => {
      import s.implicits._
      val p = 6
      val hll = udaf(new graft.operators.HllAgg(p),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Int)]())
      val tok = t(s, dir, "documents")
        .select($"source", $"lang",
          explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
      val base = tok
        .select($"source", $"lang",
          graft.functions.HashFunctions.stableHash64(concat(lit("hll:"), $"w")).as("h"))
        .withColumn("bkt", graft.operators.HllSketch.bucketCol($"h", p))
        .withColumn("rnk", graft.operators.HllSketch.rankExpr("h", p))
        .groupBy($"source", $"lang").agg(hll($"bkt", $"rnk").as("regs"))
        .localCheckpoint(false) // the register table — all rollups read this
      val vocab = tok.distinct().localCheckpoint(false) // exact sidecar
      def e4 = fq4(graft.operators.HllSketch.estimateExpr("regs", p)).as("est4")
      val lvl0 = base
        .join(vocab.groupBy($"source", $"lang").agg(count(lit(1)).as("n_exact")),
          Seq("source", "lang"))
        .select(lit("1_source_lang").as("level"), $"source", $"lang", $"n_exact", e4)
      val lvl1 = graft.operators.HllSketch.rollupRegisters(base, Seq("source"), "regs")
        .join(vocab.select($"source", $"w").distinct()
          .groupBy($"source").agg(count(lit(1)).as("n_exact")), Seq("source"))
        .select(lit("2_source").as("level"), $"source", lit("").as("lang"),
          $"n_exact", e4)
      val lvl2 = graft.operators.HllSketch.rollupRegisters(base, Seq.empty, "regs")
        .crossJoin(broadcast(
          vocab.select($"w").distinct().agg(count(lit(1)).as("n_exact"))))
        .select(lit("3_global").as("level"), lit("").as("source"),
          lit("").as("lang"), $"n_exact", e4)
      lvl0.unionByName(lvl1).unionByName(lvl2)
        .orderBy($"level", $"source", $"lang")
    }),

    // Temporal embargo split — the backtest-hygiene complement of q83's
    // entity-hash split: train strictly before T1, test strictly after
    // T2, the embargo gap between them DROPPED so near-boundary
    // correlations (a session straddling midnight) can't leak future
    // signal into training. The audit quantifies the residual
    // entity-level leakage an embargo cannot remove: users active on
    // both sides, and the share of test events they produce. One scan
    // classifies; the overlap is a distinct-user self-semi-join (user-
    // dimension-sized shuffles — users grow with the corpus, so this is
    // deliberately NOT broadcast).
    "q173_embargo_split" -> ((s, dir) => {
      import s.implicits._
      // 2024-01-20 / 2024-01-22 UTC as epoch nanos (engine ts contract)
      val t1 = lit(1705708800000000000L)
      val t2 = lit(1705881600000000000L)
      val ev = t(s, dir, "events")
        .select($"user_id",
          when($"ts" < t1, "train").when($"ts" >= t2, "test")
            .otherwise("embargo").as("split"))
        .localCheckpoint(false) // feeds split stats + both overlap sides
      val trainUsers = ev.filter($"split" === "train")
        .select($"user_id").distinct().localCheckpoint(false)
      val overlap = broadcast(ev.filter($"split" === "test")
        .select($"user_id").distinct()
        .join(trainUsers, Seq("user_id"), "left_semi")
        .agg(count(lit(1)).as("n_overlap_users")))
      val testEv = ev.filter($"split" === "test")
      val leak = broadcast(testEv
        .join(trainUsers, Seq("user_id"), "left_semi")
        .agg(count(lit(1)).as("n_leak"))
        .crossJoin(broadcast(testEv.agg(count(lit(1)).as("n_test")))))
      ev.groupBy($"split")
        .agg(count(lit(1)).as("n_events"),
          count_distinct($"user_id").as("n_users"))
        .crossJoin(overlap).crossJoin(leak)
        .select($"split", $"n_events", $"n_users", $"n_overlap_users",
          (expr("(n_leak * 10000) div n_test") / lit(10000.0))
            .as("overlap_test_share4"))
        .orderBy($"split")
    }),

    // Posting-list compression planner — the storage-engineering read on
    // q113's inverted index: per term, the delta-gap stream's cost under
    // byte-aligned varint vs whole-list bitpacking (bits = ⌈log2⌉ of the
    // worst gap × df), and which encoding wins. Every quantity is exact
    // integer arithmetic (length(bin(gap)) IS floor(log2)+1 on both
    // engines). Shape: one (term, doc) distinct shuffle, then a
    // WITHIN-TERM window — the order a real index build already has per
    // shard — and a TakeOrderedAndProject top-20; gap text never moves,
    // only (term, doc_id) pairs. The decision a 100 TB index build makes
    // per posting block, modeled per term.
    "q174_postings_size" -> ((s, dir) => {
      import s.implicits._
      val dl = graft.query.InvertedIndex
        .postings(t(s, dir, "documents"), "doc_id", "text")
        .select($"term", $"doc_id").distinct()
      val w = Window.partitionBy($"term").orderBy($"doc_id")
      val gaps = dl.withColumn("gap",
        $"doc_id" - coalesce(lag($"doc_id", 1).over(w), lit(-1L)))
      val st = gaps.groupBy($"term").agg(
        count(lit(1)).as("df"), max($"gap").as("max_gap"),
        sum(when($"gap" < 128L, 1L).when($"gap" < 16384L, 2L)
          .when($"gap" < 2097152L, 3L).otherwise(4L)).as("varint_bytes"))
      st.withColumn("bitpack_bytes",
          expr("(df * length(bin(max_gap)) + 7) div 8"))
        .withColumn("winner",
          when($"bitpack_bytes" < $"varint_bytes", "bitpack").otherwise("varint"))
        .orderBy($"df".desc, $"term").limit(20)
    }),

    // k-anonymity audit over quasi-identifiers — the data-governance gate
    // before releasing a corpus slice: every (lang, source, length-bucket)
    // combination is an equivalence class; classes with one member
    // re-identify a document, small classes nearly so. One groupBy over
    // the scan builds the class histogram, a 3-row rollup classifies it
    // (unique / small / anonymous at k = 5) with exact corpus shares.
    // Shuffles carry (quasi-id, count) rows only.
    "q175_k_anonymity" -> ((s, dir) => {
      import s.implicits._
      val classes = t(s, dir, "documents")
        .groupBy($"lang", $"source", expr("n_chars div 100").as("len_bucket"))
        .agg(count(lit(1)).as("sz"))
      val tot = broadcast(t(s, dir, "documents").agg(count(lit(1)).as("n")))
      classes
        .select(when($"sz" === 1, "1_unique").when($"sz" < 5, "2_small")
          .otherwise("3_anonymous").as("risk_class"), $"sz")
        .groupBy($"risk_class")
        .agg(count(lit(1)).as("n_classes"), sum($"sz").as("n_docs"))
        .crossJoin(tot)
        .select($"risk_class", $"n_classes", $"n_docs",
          (expr("(n_docs * 10000) div n") / lit(10000.0)).as("docs_share4"))
        .orderBy($"risk_class")
    }),

    // Incremental materialized-aggregate maintenance (warehouse IVM): the
    // stored per-(event_type, day) rollup is REFRESHED by merging the old
    // aggregate table with the delta batch's aggregate — count/sum by
    // re-summation, distinct-users by the q172 register max — never by
    // rescanning history. The oracle recomputes from the FULL event
    // stream, so hash equality IS the maintenance-correctness proof:
    // merge(agg(old), agg(delta)) ≡ agg(old ∪ delta), exactly (HLL
    // registers are a max-monoid — the merged estimate is bit-identical
    // to the full-scan estimate, not an approximation of it). At 100 TB
    // the delta is a day and history is the other 10 years; this is the
    // only refresh shape that works.
    "q176_incremental_agg" -> ((s, dir) =>
      incrementalDailyAgg(t(s, dir, "events"))),

    // Last-touch attribution — each purchase credited to the user's most
    // recent preceding non-purchase event within a 7-day window, 'direct'
    // otherwise: the q49 as-of machinery pointed at marketing analytics.
    // Touches reduce to one deterministic row per (user, instant) first
    // (max_by event_id — robust even if the generator ever emits
    // same-instant events), then ONE user-keyed sort-merge as-of carries
    // struct(ts, type) so the window cut and the channel read the same
    // matched row. Revenue is exact micro-units; the rollup is
    // channel-sized.
    "q177_attribution" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts",
          expr("cast(floor(value * 1000000) as bigint)").as("vu"))
      val touches = ev.filter($"event_type" =!= "purchase")
        .groupBy($"user_id", $"ts")
        .agg(max_by($"event_type", $"event_id").as("et"))
        .select($"user_id", $"ts", struct($"ts".as("t"), $"et").as("touch"))
      val joined = graft.operators.AsOfJoin.lastPriorValue(
        purchases, touches, "user_id", "ts", "touch")
      joined
        .select(
          when($"asof_touch".isNull ||
            ($"ts" - $"asof_touch.t") > lit(604800000000000L), "direct")
            .otherwise($"asof_touch.et").as("channel"),
          $"vu")
        .groupBy($"channel")
        .agg(count(lit(1)).as("n_purchases"), sum($"vu").as("sum_value_u"))
        .orderBy($"channel")
    }),

    // Product-quantization ANN (Jégou, Douze & Schmid, "Product
    // quantization for nearest neighbor search", TPAMI 2011) — the
    // memory-compression member of the ANN family (q30 brute / q31-q52
    // LSH / q32-q158 IVF / q80 int8 / q111 matryoshka): 64-dim vectors
    // become EIGHT 4-bit-ish codes (one per 8-dim subspace, 16-centroid
    // codebook), and search scans codes with an asymmetric-distance LUT —
    // the raw vectors are never touched after encoding. Everything is
    // relational and deterministic: codebooks are the 16 lowest-id
    // vectors' sub-blocks (q158's seed-grid convention; q166 shows the
    // Lloyd upgrade path), encoding argmin-L2 is the argmax of
    // (dot − ‖c‖²/2) — exactly equivalent for a fixed input, and
    // expressible with the native codegen'd DotProduct — and ADC sums
    // micro-quantized LUT entries as BIGINTs so the score is
    // order-independent. Scale shape: the code table is n×8 small ints
    // (the 100 TB point — ~8 bytes/vector resident vs 256), the LUT is
    // queries×128 rows broadcast, and ADC is one broadcast join + a
    // partial-agg sum keyed (query, vec). Output: recall@10 of the
    // compressed scan vs the exact MIPS truth per query.
    "q178_pq_ann" -> ((s, dir) => {
      import s.implicits._
      val m = 8; val sub = 8; val kcode = 16
      val emb = t(s, dir, "embeddings")
      val subs = broadcast((0 until m).map(_.toLong).toDF("s"))
      val seeds = emb.orderBy($"vec_id").limit(kcode)
        .withColumn("code",
          (row_number().over(Window.orderBy($"vec_id")) - 1).cast("long"))
      val cb = seeds.crossJoin(subs)
        .select($"s", $"code",
          slice($"embedding", ($"s" * sub + 1).cast("int"), lit(sub)).as("cent"))
        .localCheckpoint(false) // m×kcode rows; feeds encode + LUT
      val cbScore = cb.withColumn("half_norm2",
        VectorFunctions.dotProduct($"cent", $"cent") / lit(2.0))
      val codes = emb.crossJoin(subs)
        .select($"vec_id", $"s",
          slice($"embedding", ($"s" * sub + 1).cast("int"), lit(sub)).as("sv"))
        .join(broadcast(cbScore), Seq("s"))
        .select($"vec_id", $"s", $"code",
          (VectorFunctions.dotProduct($"sv", $"cent") - $"half_norm2").as("sc"))
        .groupBy($"vec_id", $"s")
        .agg(max_by($"code", struct($"sc", -$"code")).as("code"))
        .localCheckpoint(false) // the compressed index — ADC reads ONLY this
      val queries = emb.filter($"vec_id" < 16)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val lut = queries.crossJoin(subs)
        .select($"query_id", $"s",
          slice($"qv", ($"s" * sub + 1).cast("int"), lit(sub)).as("qs"))
        .join(broadcast(cb), Seq("s"))
        .select($"query_id", $"s", $"code",
          floor(VectorFunctions.dotProduct($"qs", $"cent") * lit(1000000.0))
            .cast("long").as("dot_u"))
      val adc = codes.join(broadcast(lut), Seq("s", "code"))
        .filter($"vec_id" =!= $"query_id")
        .groupBy($"query_id", $"vec_id")
        .agg(sum($"dot_u").as("adc_u"))
      val wq = Window.partitionBy($"query_id").orderBy($"adc_u".desc, $"vec_id")
      val pqTop = adc.withColumn("rn", row_number().over(wq)).filter($"rn" <= 10)
        .select($"query_id", $"vec_id")
      val wb = Window.partitionBy($"query_id").orderBy($"dot_u".desc, $"vec_id")
      val brute = emb.crossJoin(broadcast(queries))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id",
          floor(VectorFunctions.dotProduct($"embedding", $"qv") * lit(1000000.0))
            .cast("long").as("dot_u"))
        .withColumn("rn", row_number().over(wb)).filter($"rn" <= 10)
        .select($"query_id", $"vec_id")
      pqTop.join(brute, Seq("query_id", "vec_id"))
        .groupBy($"query_id").agg(count(lit(1)).as("nh"))
        .join(queries.select($"query_id"), Seq("query_id"), "right")
        .select($"query_id", coalesce($"nh", lit(0L)).as("n_hits"))
        .withColumn("recall4",
          expr("(n_hits * 10000) div 10") / lit(10000.0))
        .orderBy($"query_id")
    }),

    // Rolling 7-day active users from the daily register table — the
    // production face of q172's rollup: the raw event stream is scanned
    // ONCE into per-day HLL registers; every rolling window is then an
    // element-wise max over ≤ 7 register rows per target day (7 × days ×
    // 64 ints — trivially small), and the estimate is bit-identical to
    // scanning the window's raw events. At 100 TB the daily register
    // table is what persists; "MAU as of any day" never rescans history.
    // The exact sidecar (a (user, day)-distinct fan-out) rides along as
    // calibration; a deployment drops it.
    "q179_rolling_mau" -> ((s, dir) => {
      import s.implicits._
      val p = 6
      val hll = udaf(new graft.operators.HllAgg(p),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Int)]())
      val ev = t(s, dir, "events")
        .select(expr("ts div 86400000000000").as("day"),
          graft.functions.HashFunctions.stableHash64(
            concat(lit("mau:"), $"user_id".cast("string"))).as("h"))
      val daily = ev
        .withColumn("bkt", graft.operators.HllSketch.bucketCol($"h", p))
        .withColumn("rnk", graft.operators.HllSketch.rankExpr("h", p))
        .groupBy($"day").agg(hll($"bkt", $"rnk").as("regs"))
        .localCheckpoint(false) // the persisted register table
      val days = daily.select($"day").localCheckpoint(false)
      val fan = daily
        .withColumn("target_day", explode(sequence($"day", $"day" + 6)))
        .join(days.select($"day".as("target_day")), Seq("target_day"), "left_semi")
      val rolled = graft.operators.HllSketch.rollupRegisters(
        fan.select($"target_day", $"regs"), Seq("target_day"), "regs")
      val exact = t(s, dir, "events")
        .select(expr("ts div 86400000000000").as("day"), $"user_id").distinct()
        .withColumn("target_day", explode(sequence($"day", $"day" + 6)))
        .join(days.select($"day".as("target_day")), Seq("target_day"), "left_semi")
        .groupBy($"target_day")
        .agg(count_distinct($"user_id").as("mau_exact"))
      rolled.join(exact, Seq("target_day"))
        .select($"target_day".as("day"), $"mau_exact",
          fq4(graft.operators.HllSketch.estimateExpr("regs", p)).as("mau_est4"))
        .orderBy($"day")
    }),

    // Right-to-be-forgotten cascade audit — the governance complement of
    // q175/q137: a deletion-request list (deterministically synthetic,
    // q77's convention: every doc_id % 5 == 0) is propagated by anti-join
    // through the primary table AND its derived relations (the inverted
    // index's postings; the vector index, key-aligned by construction),
    // and the audit proves completeness: per relation, rows
    // before/deleted/after plus a residual-orphan probe that must read 0
    // — the evidence a compliance review actually asks for. Shape: the
    // delete list is checkpointed once; each relation pays one anti-join
    // keyed on the doc key (at 100 TB: broadcast the request list — it is
    // requests-sized, not corpus-sized) and aggregate-sized count probes.
    "q180_delete_cascade" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val del = docs.filter($"doc_id" % 5 === 0)
        .select($"doc_id".as("__del")).localCheckpoint(false)
      def audit(name: String, df: DataFrame, keyName: String): DataFrame = {
        val kept = df.join(broadcast(del), col(keyName) === $"__del", "left_anti")
          .localCheckpoint(false) // after-image feeds count + orphan probe
        broadcast(df.agg(count(lit(1)).as("n_before")))
          .crossJoin(broadcast(kept.agg(count(lit(1)).as("n_after"))))
          .crossJoin(broadcast(
            kept.join(broadcast(del), col(keyName) === $"__del", "left_semi")
              .agg(count(lit(1)).as("n_orphans_after"))))
          .select(lit(name).as("relation"), $"n_before",
            ($"n_before" - $"n_after").as("n_deleted"), $"n_after",
            $"n_orphans_after")
      }
      audit("1_documents", docs, "doc_id")
        .unionByName(audit("2_postings",
          graft.query.InvertedIndex.postings(docs, "doc_id", "text"), "doc_id"))
        .unionByName(audit("3_embeddings", t(s, dir, "embeddings"), "vec_id"))
        .orderBy($"relation")
    }),

    // Two-stage PQ retrieval — q178's ADC scan used the way production
    // systems actually use it (the re-ranking stage of Jégou et al. §V):
    // the compressed scan produces a CHEAP top-50 shortlist per query,
    // and only those ≤ 50 candidates are re-scored with the exact dot
    // against raw vectors. The measured point: re-ranking recovers most
    // of the recall the 32× compression lost (q178's mean 0.30 → the
    // shortlist's ceiling), while the exact-distance work drops from
    // n·queries to 50·queries — at 100 TB the raw vectors are touched
    // for 50 rows per query instead of the corpus. Output per query:
    // recall@10 of the raw ADC ranking vs recall@10 after re-ranking,
    // plus the shortlist ceiling (how many of the true top-10 the
    // shortlist contains at all — re-rank can never beat it).
    "q181_pq_rerank" -> ((s, dir) => {
      import s.implicits._
      val m = 8; val sub = 8; val kcode = 16; val shortlist = 50
      val emb = t(s, dir, "embeddings")
      val subs = broadcast((0 until m).map(_.toLong).toDF("s"))
      val seeds = emb.orderBy($"vec_id").limit(kcode)
        .withColumn("code",
          (row_number().over(Window.orderBy($"vec_id")) - 1).cast("long"))
      val cb = seeds.crossJoin(subs)
        .select($"s", $"code",
          slice($"embedding", ($"s" * sub + 1).cast("int"), lit(sub)).as("cent"))
        .localCheckpoint(false)
      val cbScore = cb.withColumn("half_norm2",
        VectorFunctions.dotProduct($"cent", $"cent") / lit(2.0))
      val codes = emb.crossJoin(subs)
        .select($"vec_id", $"s",
          slice($"embedding", ($"s" * sub + 1).cast("int"), lit(sub)).as("sv"))
        .join(broadcast(cbScore), Seq("s"))
        .select($"vec_id", $"s", $"code",
          (VectorFunctions.dotProduct($"sv", $"cent") - $"half_norm2").as("sc"))
        .groupBy($"vec_id", $"s")
        .agg(max_by($"code", struct($"sc", -$"code")).as("code"))
      val queries = emb.filter($"vec_id" < 16)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val lut = queries.crossJoin(subs)
        .select($"query_id", $"s",
          slice($"qv", ($"s" * sub + 1).cast("int"), lit(sub)).as("qs"))
        .join(broadcast(cb), Seq("s"))
        .select($"query_id", $"s", $"code",
          floor(VectorFunctions.dotProduct($"qs", $"cent") * lit(1000000.0))
            .cast("long").as("dot_u"))
      val wq = Window.partitionBy($"query_id").orderBy($"adc_u".desc, $"vec_id")
      val short = codes.join(broadcast(lut), Seq("s", "code"))
        .filter($"vec_id" =!= $"query_id")
        .groupBy($"query_id", $"vec_id")
        .agg(sum($"dot_u").as("adc_u"))
        .withColumn("rn", row_number().over(wq)).filter($"rn" <= shortlist)
        .select($"query_id", $"vec_id", $"rn")
        .localCheckpoint(false) // shortlist feeds raw-ADC top-10 + rerank
      // exact re-score of ONLY the shortlist: 50 raw-vector reads/query
      val wr = Window.partitionBy($"query_id").orderBy($"ex_u".desc, $"vec_id")
      val reranked = short
        .join(emb.select($"vec_id", $"embedding"), Seq("vec_id"))
        .join(broadcast(queries), Seq("query_id"))
        .select($"query_id", $"vec_id",
          floor(VectorFunctions.dotProduct($"embedding", $"qv") * lit(1000000.0))
            .cast("long").as("ex_u"))
        .withColumn("rn2", row_number().over(wr)).filter($"rn2" <= 10)
        .select($"query_id", $"vec_id")
      val wb = Window.partitionBy($"query_id").orderBy($"dot_u".desc, $"vec_id")
      val brute = emb.crossJoin(broadcast(queries))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id",
          floor(VectorFunctions.dotProduct($"embedding", $"qv") * lit(1000000.0))
            .cast("long").as("dot_u"))
        .withColumn("rn", row_number().over(wb)).filter($"rn" <= 10)
        .select($"query_id", $"vec_id")
        .localCheckpoint(false) // truth feeds all three recall columns
      def hits(cand: DataFrame, name: String) = cand
        .join(brute, Seq("query_id", "vec_id"))
        .groupBy($"query_id").agg(count(lit(1)).as(name))
      val adcTop = short.filter($"rn" <= 10).select($"query_id", $"vec_id")
      queries.select($"query_id")
        .join(hits(adcTop, "nh_pq"), Seq("query_id"), "left")
        .join(hits(reranked, "nh_rr"), Seq("query_id"), "left")
        .join(hits(short.select($"query_id", $"vec_id"), "nh_ceil"),
          Seq("query_id"), "left")
        .select($"query_id",
          coalesce($"nh_pq", lit(0L)).as("n_hits_pq"),
          coalesce($"nh_rr", lit(0L)).as("n_hits_rerank"),
          coalesce($"nh_ceil", lit(0L)).as("n_in_shortlist"))
        .withColumn("recall_pq4", expr("(n_hits_pq * 10000) div 10") / lit(10000.0))
        .withColumn("recall_rerank4",
          expr("(n_hits_rerank * 10000) div 10") / lit(10000.0))
        .orderBy($"query_id")
    }),

    // Pareto frontier over (token count, type-token ratio) — the
    // "longest AND most lexically diverse" docs no other doc beats on
    // both axes, the curriculum build's skyline. Grid pruning
    // (Skyline.frontier) keeps the dominance join frontier-band-sized;
    // the pruning is pure cost, so the oracle is the plain NOT-EXISTS
    // dominance query over all docs (the q169 convention).
    "q182_pareto_frontier" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "documents")
        .select($"doc_id",
          graft.operators.TextAnalysis.tokensCol($"text").as("toks"))
        .select($"doc_id", size($"toks").cast("long").as("n_tok"),
          size(array_distinct($"toks")).cast("long").as("n_types"))
        .filter($"n_tok" > 0)
        .select($"doc_id", $"n_tok", expr("(n_types * 10000) div n_tok").as("ttr4"))
      graft.operators.Skyline.frontier(base, "n_tok", "ttr4")
        .orderBy($"doc_id")
    }),

    // Cell-balanced corpus subsample — diversity sampling in EMBEDDING
    // space (the curation counterpart of q76's metadata strata): assign
    // the corpus to data-driven IVF cells (autoK, the q105/q143 grid),
    // then take a fixed quota per cell by bottom-k stable hash — the
    // deterministic "equal coverage of every semantic region" draw that
    // prevents a head-heavy corpus from drowning the tail topics. One
    // map-side argmax assignment + one cell-keyed WindowGroupLimit; no
    // global sort, membership a pure function of the data.
    "q183_cell_balanced_sample" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val cents = graft.operators.IvfIndex.centroids(emb, k = 0, iters = 0)
      val cells = graft.operators.IvfIndex.assign(emb, cents, "vec_id", "embedding")
      val w = Window.partitionBy($"centroid_id").orderBy($"h", $"vec_id")
      cells.select($"centroid_id", $"vec_id",
          graft.functions.HashFunctions.stableHash64(
            concat(lit("bal:"), $"vec_id".cast("string"))).as("h"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 4)
        .select($"centroid_id", $"rk", $"vec_id")
        .orderBy($"centroid_id", $"rk")
    }),

    // IVFADC — the q32 IVF cell index COMPOSED with the q178 PQ codes
    // (Jégou et al. §VI; the FAISS-default shape): the coarse quantizer
    // prunes the corpus to the query's nprobe nearest cells, and only
    // those candidates' 8-byte codes are ADC-scored — neither raw
    // vectors nor the full code table are touched per query. The sweep
    // measures the two-level trade: candidates examined (the cost) vs
    // recall@10 against the exact MIPS truth, per nprobe ∈ {1,2,4,8}.
    // Both levels are data-driven-k and deterministic; ADC sums are
    // BIGINT micro-units (order-free).
    "q184_ivfadc" -> ((s, dir) => {
      import s.implicits._
      val m = 8; val sub = 8; val kcode = 16
      val emb = t(s, dir, "embeddings")
      val subs = broadcast((0 until m).map(_.toLong).toDF("s"))
      val cents = graft.operators.IvfIndex.centroids(emb, k = 0, iters = 0)
      val cells = graft.operators.IvfIndex
        .assign(emb, cents, "vec_id", "embedding")
        .select($"vec_id", $"centroid_id")
        .localCheckpoint(false) // coarse index; candidate filter reads it
      val seeds = emb.orderBy($"vec_id").limit(kcode)
        .withColumn("code",
          (row_number().over(Window.orderBy($"vec_id")) - 1).cast("long"))
      val cb = seeds.crossJoin(subs)
        .select($"s", $"code",
          slice($"embedding", ($"s" * sub + 1).cast("int"), lit(sub)).as("cent"))
        .localCheckpoint(false)
      val cbScore = cb.withColumn("half_norm2",
        VectorFunctions.dotProduct($"cent", $"cent") / lit(2.0))
      val codes = emb.crossJoin(subs)
        .select($"vec_id", $"s",
          slice($"embedding", ($"s" * sub + 1).cast("int"), lit(sub)).as("sv"))
        .join(broadcast(cbScore), Seq("s"))
        .select($"vec_id", $"s", $"code",
          (VectorFunctions.dotProduct($"sv", $"cent") - $"half_norm2").as("sc"))
        .groupBy($"vec_id", $"s")
        .agg(max_by($"code", struct($"sc", -$"code")).as("code"))
        .join(cells, Seq("vec_id")) // codes carry their cell — the index layout
        .localCheckpoint(false)
      val queries = emb.filter($"vec_id" < 16)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val wc = Window.partitionBy($"query_id").orderBy($"csc".desc, $"centroid_id")
      val qcells = queries.crossJoin(broadcast(cents))
        .select($"query_id", $"centroid_id",
          VectorFunctions.cosineSim($"qv", $"centroid").as("csc"))
        .withColumn("cell_rank", row_number().over(wc))
        .select($"query_id", $"centroid_id", $"cell_rank")
      val lut = queries.crossJoin(subs)
        .select($"query_id", $"s",
          slice($"qv", ($"s" * sub + 1).cast("int"), lit(sub)).as("qs"))
        .join(broadcast(cb), Seq("s"))
        .select($"query_id", $"s", $"code",
          floor(VectorFunctions.dotProduct($"qs", $"cent") * lit(1000000.0))
            .cast("long").as("dot_u"))
      // one scored relation at the widest nprobe feeds every sweep point
      val maxProbe = 8
      val cand = codes
        .join(broadcast(qcells.filter($"cell_rank" <= maxProbe)), Seq("centroid_id"))
        .filter($"vec_id" =!= $"query_id")
        .join(broadcast(lut), Seq("query_id", "s", "code"))
        .groupBy($"query_id", $"vec_id", $"cell_rank")
        .agg(sum($"dot_u").as("adc_u"))
        .localCheckpoint(false)
      val wb = Window.partitionBy($"query_id").orderBy($"dot_u".desc, $"vec_id")
      val brute = emb.crossJoin(broadcast(queries))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id",
          floor(VectorFunctions.dotProduct($"embedding", $"qv") * lit(1000000.0))
            .cast("long").as("dot_u"))
        .withColumn("rn", row_number().over(wb)).filter($"rn" <= 10)
        .select($"query_id", $"vec_id")
        .localCheckpoint(false)
      val sweep = Seq(1L, 2L, 4L, 8L).toDF("nprobe")
      val wk = Window.partitionBy($"nprobe", $"query_id")
        .orderBy($"adc_u".desc, $"vec_id")
      val scored = cand.join(broadcast(sweep), $"cell_rank" <= $"nprobe")
        .localCheckpoint(false) // candidate counts + top-k both read it
      val hits = scored
        .withColumn("rn", row_number().over(wk)).filter($"rn" <= 10)
        .join(brute, Seq("query_id", "vec_id"))
        .groupBy($"nprobe").agg(count(lit(1)).as("n_hits"))
      val candCounts = scored.groupBy($"nprobe")
        .agg(count(lit(1)).as("n_candidates"))
      val nq = broadcast(queries.agg(count(lit(1)).as("n_q")))
      sweep.join(candCounts, Seq("nprobe"), "left")
        .join(hits, Seq("nprobe"), "left").crossJoin(nq)
        .select($"nprobe",
          coalesce($"n_candidates", lit(0L)).as("n_candidates"),
          coalesce($"n_hits", lit(0L)).as("n_hits"),
          (expr("(coalesce(n_hits, 0) * 10000) div (n_q * 10)") / lit(10000.0))
            .as("recall4"))
        .orderBy($"nprobe")
    }),

    // Proximity (minimum-span) ranking — the IR scorer between q113's
    // exact phrase match and q66's bag-of-words BM25: for docs containing
    // BOTH query terms, the smallest distance between an occurrence of
    // each. The minimum is always achieved by an ADJACENT opposite-term
    // pair in the merged position order, so ONE doc-keyed window pass
    // computes it exactly: two conditional `last(..., ignoreNulls)`
    // running carries (nearest preceding position of each term), and
    // each row's gap is its position minus the OTHER term's carry. No
    // position×position self-join — the per-doc cost is the posting
    // length, the order an index shard already has.
    "q185_proximity_rank" -> ((s, dir) => {
      import s.implicits._
      val post = graft.query.InvertedIndex
        .postings(t(s, dir, "documents"), "doc_id", "text")
        .filter($"term".isin("hash", "join"))
        .select($"doc_id", $"pos".cast("long").as("pos"), $"term")
      val w = Window.partitionBy($"doc_id").orderBy($"pos", $"term")
        .rowsBetween(Window.unboundedPreceding, -1)
      val gaps = post
        .withColumn("prev_a",
          last(when($"term" === "hash", $"pos"), ignoreNulls = true).over(w))
        .withColumn("prev_b",
          last(when($"term" === "join", $"pos"), ignoreNulls = true).over(w))
        .withColumn("gap",
          when($"term" === "hash", $"pos" - $"prev_b")
            .otherwise($"pos" - $"prev_a"))
      gaps.groupBy($"doc_id")
        .agg(min($"gap").as("min_span"),
          sum(($"term" === "hash").cast("long")).as("n_a"),
          sum(($"term" === "join").cast("long")).as("n_b"))
        .filter($"min_span".isNotNull)
        .orderBy($"min_span", $"doc_id").limit(20)
    }),

    // U-shaped multi-touch attribution — q177's single-touch model
    // upgraded to the position-based industry standard: EVERY touch in
    // the 7-day window before a purchase shares the credit (40% first /
    // 40% last / 20% split across the middle; 100% single, 50/50 pair),
    // in exact integer micro-units with the rounding remainder assigned
    // to the last touch so credits sum to the purchase value EXACTLY.
    // The purchase×touch pairing is the keyed bucketed interval join
    // (q124's operator, auto bucket size) — never a per-user cross
    // product; purchases with an empty window fall out as 'direct' via
    // anti-join. The invariant a finance reconciliation checks —
    // Σ credit == Σ purchase value — holds by construction.
    "q186_multitouch" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("p_id"),
          expr("cast(floor(value * 1000000) as bigint)").as("value_u"),
          ($"ts" - lit(604800000000000L)).as("lo"), $"ts".as("hi"))
        .localCheckpoint(false) // interval side + the direct anti-join
      val touches = ev.filter($"event_type" =!= "purchase")
        .select($"user_id", $"ts".as("t_ts"), $"event_id".as("t_id"),
          $"event_type".as("channel"))
      val joined = graft.operators.IntervalJoin.joinPointsToIntervals(
        touches, "t_ts", purchases, "lo", "hi", 0L, Seq("user_id"))
      val wp = Window.partitionBy($"p_id").orderBy($"t_ts", $"t_id")
      val base = joined
        .withColumn("rn", row_number().over(wp))
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"p_id")))
        .withColumn("bp",
          when($"n" === 1, lit(10000L)).when($"n" === 2, lit(5000L))
            .when($"rn" === 1 || $"rn" === $"n", lit(4000L))
            .otherwise(expr("2000 div (n - 2)")))
        .withColumn("credit0", expr("(value_u * bp) div 10000"))
      val credited = base
        .withColumn("tot0", sum($"credit0").over(Window.partitionBy($"p_id")))
        .withColumn("credit_u", $"credit0" +
          when($"rn" === $"n", $"value_u" - $"tot0").otherwise(lit(0L)))
        .localCheckpoint(false) // channel rollup + the direct anti-join
      val attributed = credited.groupBy($"channel")
        .agg(count(lit(1)).as("n_touchpoints"), sum($"credit_u").as("credit_u"))
      val direct = purchases
        .join(credited.select($"p_id").distinct(), Seq("p_id"), "left_anti")
        .agg(count(lit(1)).as("n_touchpoints"),
          coalesce(sum($"value_u"), lit(0L)).as("credit_u"))
        .select(lit("direct").as("channel"), $"n_touchpoints", $"credit_u")
      attributed.unionByName(direct).orderBy($"channel")
    }),

    // Medoid survivor selection — the principled upgrade of min-id
    // survivors (q118): per near-dup component, keep the member with the
    // greatest total similarity to its neighbors (graph strength = Σ of
    // 1e-4-quantized edge weights, ties to the lower id) — the "most
    // representative copy", not the accidentally-lowest id. Strength is
    // one node-keyed aggregation over the EDGE list (never all-pairs —
    // at 100 TB the pair graph is the sparse LSH output), the argmax is
    // a component-keyed WindowGroupLimit. Read with q164/q165: sizes
    // audit → guard → THEN choose survivors this way.
    "q187_medoid_survivors" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.75)
        .localCheckpoint(false) // labels + strengths both read it
      val lab = graft.operators.Dedup
        .resolveClusters(pairs, docs.select($"doc_id"))
      val strength = pairs
        .select($"id_a".as("id"), expr("cast(floor(est_jac * 10000) as bigint)").as("w4"))
        .unionByName(pairs
          .select($"id_b".as("id"), expr("cast(floor(est_jac * 10000) as bigint)").as("w4")))
        .groupBy($"id").agg(sum($"w4").as("strength4"), count(lit(1)).as("degree"))
      val labeled = lab.join(strength, Seq("id")).localCheckpoint(false)
      val wm = Window.partitionBy($"keeper_id").orderBy($"strength4".desc, $"id")
      labeled.withColumn("rk", row_number().over(wm)).filter($"rk" === 1)
        .join(labeled.groupBy($"keeper_id").agg(count(lit(1)).as("n_members")),
          Seq("keeper_id"))
        .filter($"n_members" >= 2)
        .select($"keeper_id".as("component_id"), $"id".as("medoid_id"),
          $"n_members", $"strength4", $"degree")
        .orderBy($"component_id")
    }),

    // Small-file compaction planner — nightly lakehouse maintenance: the
    // manifest (one file per document here — the worst-case tiny-file
    // layout the reference's per-run CSV drops decay into) is packed into
    // ~target-sized rewrite groups by a cumulative-sum window PER SOURCE
    // partition, large files left untouched. The plan runs entirely on
    // file-level METADATA (~10⁻⁶ of data bytes at 100 TB); no global sort —
    // each partition group plans independently, exactly how a distributed
    // compactor parallelizes.
    "q188_compaction_plan" -> ((s, dir) => {
      import s.implicits._
      val manifest = t(s, dir, "documents")
        .select($"source", $"doc_id".as("file_id"), $"n_chars".as("bytes"))
      graft.operators.CompactionPlanner.planSummary(
          manifest, "source", "file_id", "bytes",
          targetBytes = 1500L, smallThreshold = 400L)
        .orderBy($"source")
    }),

    // CUPED variance-reduced A/B readout (Deng et al., WSDM 2013) — the
    // experimentation upgrade over q162: each user's PRE-period activity is
    // the control covariate, θ = cov(X,Y)/var(X) over all users, and each
    // arm reports its raw and adjusted mean. Moments accumulate as EXACT
    // integer sums (micro-unit BIGINTs; the Σxy/Σxx products in
    // decimal(38,0) so 10⁹-microunit users cannot overflow — the oracle's
    // HUGEINT twin is exact the same way), so the only doubles are the
    // final scalar ratios, computed in one pinned operation order on both
    // engines. Two scans of the per-user rollup (moments + arms) off one
    // localCheckpoint; everything after the user-keyed aggregate is
    // cohort-sized. θ's denominator is gated: a zero-variance covariate
    // yields null θ and null adjusted means, identically on both engines.
    "q189_cuped" -> ((s, dir) => {
      import s.implicits._
      val cut = 1705276800000000000L // 2024-01-15 00:00 UTC, epoch-ns
      val users = t(s, dir, "events")
        .select($"user_id", $"ts",
          expr("cast(floor(value * 1000000) as bigint)").as("vu"))
        .groupBy($"user_id")
        .agg(sum(when($"ts" < lit(cut), $"vu").otherwise(0L)).as("xu"),
          sum(when($"ts" >= lit(cut), $"vu").otherwise(0L)).as("yu"))
        .localCheckpoint(false) // moments + arm rollup both read it
      val mom = broadcast(users.agg(
        count(lit(1)).as("n"), sum($"xu").as("sx"), sum($"yu").as("sy"),
        sum($"xu".cast("decimal(19,0)") * $"yu".cast("decimal(19,0)")).as("sxy"),
        sum($"xu".cast("decimal(19,0)") * $"xu".cast("decimal(19,0)")).as("sxx")))
      val arms = users
        .select(pmod(graft.functions.HashFunctions.stableHash64(
          concat(lit("ab:"), $"user_id".cast("string"))), lit(2L)).as("cohort"),
          $"xu", $"yu")
        .groupBy($"cohort")
        .agg(count(lit(1)).as("n_users"),
          sum($"xu").as("sx_a"), sum($"yu").as("sy_a"))
      arms.crossJoin(mom)
        .withColumn("denom",
          $"n".cast("double") * $"sxx".cast("double")
            - $"sx".cast("double") * $"sx".cast("double"))
        .withColumn("theta", when($"denom" > 0.0,
          ($"n".cast("double") * $"sxy".cast("double")
            - $"sx".cast("double") * $"sy".cast("double")) / $"denom"))
        .select($"cohort", $"n_users",
          floor(($"sx_a".cast("double") / $"n_users".cast("double")) / 100.0)
            .cast("long").as("mean_x4u"),
          floor(($"sy_a".cast("double") / $"n_users".cast("double")) / 100.0)
            .cast("long").as("mean_y4u"),
          floor($"theta" * 1000000.0).cast("long").as("theta6"),
          floor((($"sy_a".cast("double") / $"n_users".cast("double"))
            - $"theta" * ($"sx_a".cast("double") / $"n_users".cast("double")
              - $"sx".cast("double") / $"n".cast("double"))) / 100.0)
            .cast("long").as("mean_yadj4u"))
        .orderBy($"cohort")
    }),

    // l-diversity audit — q175's k-anonymity asks "is the equivalence
    // class big enough?"; this asks the stronger privacy question: does
    // each quasi-identifier class (lang, 20-char length bucket) span
    // enough DISTINCT values of the sensitive attribute (source)? A class
    // of 50 rows all from one source still re-identifies the source.
    // Exact per-class distinct (classes are bounded by the quasi-id grid,
    // not the corpus; swap in the q73 KMV sketch when the sensitive domain
    // explodes), then a risk-level rollup.
    "q190_l_diversity" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy($"lang", expr("n_chars div 20").as("len_bucket"))
        .agg(countDistinct($"source").as("ndv"), count(lit(1)).as("sz"))
        .select(when($"ndv" < 3, "1_risky").otherwise("2_diverse")
          .as("risk_class"), $"ndv", $"sz")
        .groupBy($"risk_class")
        .agg(count(lit(1)).as("n_classes"), sum($"sz").as("n_docs"),
          min($"ndv").as("min_ndv"), max($"ndv").as("max_ndv"))
        .orderBy($"risk_class")
    }),

    // Semantic decontamination — q60/q87 catch EXACT eval-set leaks; this
    // catches paraphrased ones: every training vector's max cosine against
    // the held-out eval set (vec_id ≡ 0 mod 50 within the FIXED id range
    // [0, 25000) — eval benchmarks are fixed-size suites, ≤ 500 vectors
    // here no matter how large the corpus grows, the q195 isin pattern),
    // flag ≥ 0.30. The id cap is what makes the forced broadcast sound:
    // a pure mod-50 slice is 2% of the corpus and would outgrow any
    // broadcast threshold, while the capped slice is constant-sized by
    // construction — so the probe stays one pass over training embeddings
    // with a map-side max, no shuffle of the corpus at all (the only
    // exchange is the label-sized rollup). Doubles quantize at 1e-4 after
    // the max (q30's policy).
    "q191_semantic_decontam" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val isEval = pmod($"vec_id", lit(50L)) === 0 && $"vec_id" < 25000L
      val eval = emb.filter(isEval)
        .select($"vec_id".as("eval_id"), $"embedding".as("ev"))
      emb.filter(!isEval)
        .join(broadcast(eval), lit(true))
        .withColumn("sc",
          graft.functions.VectorFunctions.cosineSim($"embedding", $"ev"))
        .groupBy($"vec_id", $"label").agg(max($"sc").as("ms"))
        .withColumn("ms4", floor($"ms" * 10000.0).cast("long"))
        .groupBy($"label")
        .agg(count(lit(1)).as("n_train"),
          sum(($"ms4" >= 3000L).cast("long")).as("n_contaminated"),
          max($"ms4").as("max_ms4"))
        .orderBy($"label")
    }),

    // Peak session concurrency per day — the capacity-planning number
    // (max simultaneous open sessions) via a DISTRIBUTED sweep-line:
    // q65's sessions become ±1 endpoint deltas, per-day windows compute
    // local prefix peaks in parallel, and a calendar-sized carry-in
    // (one row per day — bounded by time, not data) stitches them into
    // the exact global sweep. No total order anywhere; see
    // [[graft.operators.SweepLine]].
    "q192_peak_concurrency" -> ((s, dir) =>
      peakConcurrency(t(s, dir, "events"))),

    // Per-source boilerplate stripping — the RefinedWeb template pass
    // q68's paragraph dedup does NOT cover: dedup keeps first occurrences,
    // but a nav bar or license footer stamped on 1%+ of a source's docs
    // must go from EVERY document, first included. Frequency is counted on
    // 8-byte paragraph hashes (text never shuffles); within-doc repeats
    // count once toward document frequency but every instance strips.
    // See [[graft.operators.Boilerplate]].
    "q193_boilerplate_strip" -> ((s, dir) =>
      boilerplateStrip(t(s, dir, "documents"))),

    // Fixed-size uniform sample PER GROUP — the eval-set builder ("exactly
    // 5 docs per language") that q76's Bernoulli fractions and q104's
    // global weighted draw cannot express. Uniformity comes from ranking
    // on the salted content hash; the selection reuses the q103 TopKAgg
    // Aggregator, so each map-side partition reduces to ≤ k pairs per
    // group BEFORE the exchange — O(groups·k·partitions) shuffle state,
    // never the corpus through a row_number window.
    "q194_group_sample" -> ((s, dir) => {
      import s.implicits._
      val topk = udaf(new graft.operators.TopKAgg(5),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
      t(s, dir, "documents")
        .select($"lang", $"doc_id",
          graft.functions.HashFunctions.stableHash64(
            concat(lit("samp:"), $"doc_id".cast("string"))).as("h"))
        .groupBy($"lang")
        .agg(topk($"h", $"doc_id").as("top"))
        .select($"lang", posexplode($"top").as(Seq("i", "p")))
        .select($"lang", ($"i" + 1).cast("long").as("rk"),
          $"p._2".as("doc_id"), $"p._1".as("h"))
        .orderBy($"lang", $"rk")
    }),

    // Rocchio pseudo-relevance feedback (Rocchio 1971; the PRF move every
    // IR stack layers over its first-pass retriever): round-1 top-5 per
    // query → positional mean of the neighbor vectors (q166's exact float
    // policy: DOUBLE avg, FLOAT cast) → q' = 0.5·q + 0.5·mean → round-2
    // retrieval with the expanded query, top-8 over the 5-doc feedback
    // set (the PRF convention: the expanded list outsizes its seed).
    // Both retrieval passes broadcast the query side (queries are
    // thousands; the corpus is the 100 TB scan), and the feedback algebra
    // runs on queries×dim rows — negligible. `is_new` marks neighbors PRF
    // surfaced that round 1's top-5 missed: the query-drift audit a
    // deployed PRF ships with.
    "q195_rocchio_feedback" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter($"vec_id".isin(0, 1, 2))
        .select($"vec_id".as("query_id"), $"embedding")
      val r1 = graft.operators.SimilaritySearch.bruteForceTopK(emb, queries, 5)
        .select($"query_id", $"neighbor_id").localCheckpoint(false)
      val fb = r1
        .join(emb.select($"vec_id".as("neighbor_id"), $"embedding"), Seq("neighbor_id"))
        .select($"query_id", posexplode($"embedding").as(Seq("pos", "comp")))
        .groupBy($"query_id", $"pos")
        .agg(avg($"comp".cast("double")).as("m"))
      val q2 = queries
        .select($"query_id", posexplode($"embedding").as(Seq("pos", "qc")))
        .join(fb, Seq("query_id", "pos"))
        .groupBy($"query_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, " +
          "cast(0.5D * cast(qc as double) + 0.5D * m as float) as c))), x -> x.c)")
          .as("embedding"))
      graft.operators.SimilaritySearch.bruteForceTopK(emb, q2, 8)
        .select($"query_id", $"neighbor_id", fq4($"score").as("score4"),
          $"rank".cast("long").as("rank"))
        .join(r1.withColumn("seen", lit(0L)), Seq("query_id", "neighbor_id"), "left")
        .select($"query_id", $"rank", $"neighbor_id", $"score4",
          when($"seen".isNull, 1).otherwise(0).cast("int").as("is_new"))
        .orderBy($"query_id", $"rank")
    }),

    // CUSUM changepoint detection (Page 1954) over daily event volumes —
    // the drift detector behind q142's distributional drift: per event
    // type, the running sum of (n_day·D − N) — the mean-centered residual
    // scaled by D so every term stays an exact integer — peaks at the day
    // the level shifts. The argmax packs (|cusum|, earlier-day tiebreak)
    // into one BIGINT so the same max is exact on any engine (q161's
    // trick). Day counts are calendar-bounded: the per-type window runs
    // over ~10³ rows at any corpus scale.
    "q196_cusum_changepoint" -> ((s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .groupBy($"event_type", expr("ts div 86400000000000").as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = daily.groupBy($"event_type")
        .agg(sum($"n").as("total"), count(lit(1)).as("n_days"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(broadcast(tot), Seq("event_type"))
        .withColumn("cusum", sum($"n" * $"n_days" - $"total").over(w))
        .groupBy($"event_type")
        .agg(max($"n_days").as("n_days"), max($"total").as("total"),
          max(abs($"cusum") * lit(10000000L) + (lit(9999999L) - $"day")).as("wmax"))
        .select($"event_type", $"n_days", $"total",
          (lit(9999999L) - pmod($"wmax", lit(10000000L))).as("cp_day"),
          // integral div (wmax is non-negative, so div == floor): the
          // double-division path misrounds once wmax > 2^53
          expr("wmax div 10000000").as("cusum_abs"))
        .orderBy($"event_type")
    }),

    // RM3 lexical query expansion (Lavrenko & Croft 2001; the BM25-side
    // twin of q195's dense Rocchio): round-1 BM25 top-5 docs → top-3
    // expansion terms by feedback tf (stopwords/base terms excluded, ties
    // lexicographic) → round-2 BM25 over base ∪ expansion → top-10 with
    // the is_new drift audit. Scores use bm25MicroScores — per-term
    // contributions floor-quantized to BIGINT micro-units BEFORE the sum,
    // because with data-derived terms the oracle must aggregate
    // per-(doc, term) rows in scan order and a double sum would be
    // order-dependent. The two driver collects are QUERY PROCESSING, not
    // data movement: 5 feedback ids and 3 terms, invariant at any corpus
    // size; both scoring passes stay scan-side with one broadcast stats
    // row each (q66's shape).
    "q197_rm3_expansion" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val baseTerms = Bm25Terms
      val r1 = graft.query.LexicalRetriever.bm25MicroScores(
        docs, "doc_id", "text", baseTerms).localCheckpoint(false)
      val fbIds = r1.orderBy($"score_u".desc, $"doc_id").limit(5)
        .select($"doc_id").as[Long].collect().toSeq
      val stop = (baseTerms ++
        graft.operators.TextAnalysis.Markers.values.flatten).distinct
      val expTerms = docs.filter($"doc_id".isin(fbIds: _*))
        .select(explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
        .filter(!$"w".isin(stop.map(_.asInstanceOf[Any]): _*) && length($"w") >= 3)
        .groupBy($"w").agg(count(lit(1)).as("c"))
        .orderBy($"c".desc, $"w").limit(3)
        .select($"w").as[String].collect().toSeq
      val r2 = graft.query.LexicalRetriever.bm25MicroScores(
        docs, "doc_id", "text", baseTerms ++ expTerms)
      r2.orderBy($"score_u".desc, $"doc_id").limit(10)
        .withColumn("rank", row_number()
          .over(Window.orderBy($"score_u".desc, $"doc_id")).cast("long"))
        .join(r1.orderBy($"score_u".desc, $"doc_id").limit(10)
          .select($"doc_id", lit(0L).as("seen")), Seq("doc_id"), "left")
        .select($"rank", $"doc_id", $"score_u",
          when($"seen".isNull, 1).otherwise(0).cast("int").as("is_new"))
        .orderBy($"rank")
    }),

    // Two-sample Kolmogorov–Smirnov drift test — each source's document-
    // length distribution against the rest of the corpus, EXACT: the KS
    // statistic is max |CDF₁ − CDF₂| over the jump points, cross-
    // multiplied to integers (|c1·n2 − c2·n1|, never a float CDF), so D
    // and the α=0.05 decision reproduce bit-for-bit. Complements q142's
    // binned KL with the exact nonparametric test a data-quality gate
    // wants. Scale shape: the grid is sources × distinct values — BOTH
    // dims bounded (length takes bounded values; sources are an
    // enumeration), so the per-source cumulative windows and the one
    // global-value window run on grid-sized relations regardless of
    // corpus size; the corpus contributes one (source, v) count shuffle.
    "q198_ks_drift" -> ((s, dir) =>
      ksDrift(t(s, dir, "documents"))),

    // Gini concentration of the token distribution per language — the
    // single-number vocabulary-inequality audit next to q146's Zipf slope
    // (a corpus whose Gini drifts up is collapsing onto template text).
    // With ascending (count, word) ranks the numerator 2·Σ(i·cᵢ) −
    // (V+1)·ΣC is an EXACT non-negative integer, so gini4 is pure integer
    // division — no float CDF. Σ(i·cᵢ) is computed WITHOUT ranking the
    // vocab: within a tie-run of equal counts c the sum Σ i·c is
    // order-invariant, with the closed form c·(m·start + m(m−1)/2) over
    // the run's size m and exclusive-prefix start — so the query groups
    // to the count-of-counts table (~O(√tokens) rows, the ExactQuantiles
    // convention), ranks only DISTINCT (lang, c) pairs, and every window
    // input is histogram-sized. No per-lang vocab ever funnels through
    // one task. Moment products accumulate in decimal(38,0) (HUGEINT on
    // the oracle side) — at 100 TB Σ i·c ≈ V·N ~ 10²² overflows BIGINT.
    "q199_token_gini" -> ((s, dir) => {
      import s.implicits._
      val cnt = t(s, dir, "documents")
        .select($"lang",
          explode(graft.operators.TextAnalysis.tokensCol($"text")).as("w"))
        .groupBy($"lang", $"w").agg(count(lit(1)).as("c"))
      val cc = cnt.groupBy($"lang", $"c").agg(count(lit(1)).as("m"))
      val w = Window.partitionBy($"lang").orderBy($"c")
        .rowsBetween(Window.unboundedPreceding, -1)
      cc.withColumn("start", coalesce(sum($"m").over(w), lit(0L)) + lit(1L))
        .withColumn("run_ic", expr(
          "cast(c as decimal(38,0)) * (cast(m as decimal(38,0)) * start" +
            " + (cast(m as decimal(38,0)) * (m - 1)) div 2)"))
        .groupBy($"lang")
        .agg(sum($"m").as("vocab"),
          sum(expr("cast(c as decimal(38,0)) * m")).as("ntd"),
          sum($"run_ic").as("ic"))
        .select($"lang", $"vocab", $"ntd".cast("long").as("n_tok"),
          expr("((2 * ic - (cast(vocab as decimal(38,0)) + 1) * ntd) * 10000)" +
            " div (cast(vocab as decimal(38,0)) * ntd)").as("gini4"))
        .orderBy($"lang")
    }),

    // Personalized PageRank (random walk with restart — Jeh & Widom 2003's
    // "more like this" through graph structure): teleport mass lands only
    // on the two seed docs, so rank_u measures near-dup-graph PROXIMITY to
    // the seeds — the graph-walk complement of embedding ANN (a doc can be
    // zero-cosine from the seed yet two dedup hops away). Same integer ppm
    // arithmetic, staging, and node-broadcast strategy as q108; unreachable
    // docs stay exactly 0 and are filtered, so the output is the seeds'
    // graph neighborhood ranked by walk probability.
    "q201_personalized_pagerank" -> ((s, dir) => {
      import s.implicits._
      val pairs = graft.operators.Dedup.nearDupPairs(
        t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.5)
      graft.operators.PageRank.personalizedRanks(
          pairs, "id_a", "id_b", Seq(0L, 7L), iters = 3)
        .filter($"rank_u" > 0)
        .select($"id".as("doc_id"), $"deg", $"rank_u")
        .orderBy($"rank_u".desc, $"doc_id").limit(20)
    }),

    // CUBE with grouping_id — the full OLAP grouping-sets surface next to
    // q46's one-dim rollup: all four (status, priority) granularities in
    // ONE Expand + partial/final aggregate pass (never four scans), with
    // grouping_id disambiguating a real value from the aggregated-out
    // NULL. The 2-dim cube is 4× Expand rows into a partial agg —
    // map-side combine keeps the exchange grouped-rows-sized at 100 TB.
    "q202_cube_revenue" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("rev"))
        .select($"gid",
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n", $"rev")
        .orderBy($"gid", $"status", $"priority")
    }),

    // Per-language exact quantile table — q159's no-sort two-histogram
    // refinement GENERALIZED to groups ([[graft.operators.ExactQuantiles
    // .groupedQuantiles]]): every cumulative window now PARTITIONS BY the
    // group, so even the bucket-table pass parallelizes and the global
    // form's one documented single-partition window disappears — the
    // strictly better shape for the per-stratum SLA read ("p99 doc length
    // per language") over 100 TB. Exact nearest-rank integer arithmetic
    // throughout; two scans + two histogram-sized shuffles regardless of
    // corpus size.
    "q208_group_quantiles" -> ((s, dir) => {
      import s.implicits._
      graft.operators.ExactQuantiles.groupedQuantiles(
          t(s, dir, "documents"), "lang", "n_chars",
          probs4 = Seq(2500L, 5000L, 9000L, 9900L), coarseWidth = 64L)
        .orderBy($"lang", $"prob4")
    }),

    // Perceptual-hash image near-dup — the multimodal dedup leg over REAL
    // codec work: a deterministic 8×8 grayscale PNG per doc (actual
    // ImageIO.write bytes; same-group docs differ by ~2 perturbed pixels),
    // REAL ImageIO decode back to the luma grid, aHash/dHash bands
    // ([[graft.operators.Multimodal.perceptualHashes]]), band-bucket
    // candidate join (the SimHash q75 shape — never all-pairs), exact
    // hamming verify ≤ 12. PNG grayscale is lossless and the integer luma
    // weights sum to 256, so the decoded grid equals the md5 closed form
    // and the whole encode→decode→hash→join path is oracle-checkable with
    // no codec on the oracle side. Scale: candidates are bounded by
    // 16-bit band-bucket collisions; the image corpus shuffles only as
    // eight small ints per image, never as pixels.
    "q209_image_phash_neardup" -> ((s, dir) => {
      import s.implicits._
      imagePhashPairs(t(s, dir, "documents").select($"doc_id"))
        .filter($"ham_a" <= 12)
        .orderBy($"id_a", $"id_b")
    }),

    // Image dedup CLUSTERS — q209's perceptual-hash pairs composed with
    // the engine's own cluster resolution (q53's label propagation),
    // closing the multimodal dedup loop: tight pairs (hamming ≤ 6) become
    // components, each electing its lowest-id survivor, with the pair
    // census (n_pairs, max_ham) a reviewer reads before deleting. The
    // oracle replays the pixels arithmetically and resolves components
    // with a recursive CTE. Scale: hashes shuffle as eight ints per
    // image; label propagation runs on the pair-endpoint subgraph only
    // (resolveClustersSparse — the singleton majority never iterates).
    "q213_image_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id")
      val pairs = imagePhashPairs(docs)
        .filter($"ham_a" <= 6)
        .localCheckpoint(false) // labels + the pair census both read it
      val lab = graft.operators.Dedup.resolveClustersSparse(
        pairs.select($"id_a", $"id_b"), docs)
      val sizes = lab.groupBy($"keeper_id")
        .agg(count(lit(1)).as("n_members"))
        .filter($"n_members" >= 2)
      val pstat = pairs
        .join(lab.select($"id".as("id_a"), $"keeper_id"), "id_a")
        .groupBy($"keeper_id")
        .agg(count(lit(1)).as("n_pairs"), max($"ham_a").as("max_ham"))
      sizes.join(pstat, Seq("keeper_id"))
        .select($"keeper_id".as("cluster_id"), $"n_members",
          $"n_pairs", $"max_ham")
        .orderBy($"cluster_id")
    }),

    // Persisted ANN build/serve split — q184's IVFADC restructured the
    // way production runs it (the build-once/query-many lifecycle of
    // pipeline 2's index, `pipeline2.py:117-150`, applied to the
    // COMPRESSED index): [[graft.index.AnnIndex.build]] scans the corpus
    // ONCE into centroids + PQ codebook + cell-PARTITIONED codes parquet;
    // [[graft.index.AnnIndex.query]] serves top-10 from the persisted
    // relations alone — the codes scan is partition-pruned to the probed
    // cells via a static isin over the partition column, and the raw
    // embedding corpus is never read on the serve path (plan-pinned in
    // AnnIndexSpec). Arithmetic is bit-identical to q184's inline index
    // (same encode argmax, BIGINT LUT micro-units, tie order), which the
    // oracle replays relationally at nprobe = 4.
    "q210_ann_index_serve" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft_annidx").toString
      graft.index.AnnIndex.build(emb, idxDir)
      val queries = emb.filter($"vec_id" < 16)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      graft.index.AnnIndex.query(s, idxDir, queries, k = 10, nprobe = 4,
          excludeSelf = true)
        .orderBy($"query_id", $"rank")
    }),

    // Cross-modal dedup agreement — the audit a multimodal corpus runs
    // before trusting either signal alone: the TEXT near-dup pairs (q39's
    // verified LSH at 0.75) and the IMAGE perceptual-hash pairs (q213's
    // tight hamming ≤ 6) full-outer-joined into a 3-way census (both /
    // text-only / image-only). By construction the synthetic image groups
    // (doc_id div 4) are independent of text similarity, so the overlap
    // measures exactly what a production audit would: how often the two
    // modalities nominate the same pair. Both pipelines shuffle
    // hash-sized rows only; the join is pair-keyed.
    "q214_multimodal_agreement" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val tp = graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text",
          numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.75)
        .select($"id_a", $"id_b", lit(1L).as("is_text"))
      val ip = imagePhashPairs(docs.select($"doc_id"))
        .filter($"ham_a" <= 6)
        .select($"id_a", $"id_b", lit(1L).as("is_image"))
      tp.join(ip, Seq("id_a", "id_b"), "full_outer")
        .select(coalesce($"is_text", lit(0L)).as("t"),
          coalesce($"is_image", lit(0L)).as("i"))
        .groupBy($"t", $"i").agg(count(lit(1)).as("n_pairs"))
        .select(when($"t" === 1 && $"i" === 1, "1_both")
          .when($"t" === 1, "2_text_only")
          .otherwise("3_image_only").as("agreement"), $"n_pairs")
        .orderBy($"agreement")
    }),

    // Windowed audio features over REAL codec work — the audio twin of
    // q209, closing the "no audio codecs" claim the same way: a
    // deterministic 16-bit PCM WAV per doc (actual AudioSystem.write
    // bytes), REAL javax.sound decode back to samples, then per-16-sample
    // window integer features (energy Σs², in-window sign changes, peak
    // |s|). WAV PCM is stored verbatim, so the decoded samples equal the
    // md5 closed form and the oracle replays the whole
    // encode→decode→feature path codec-free. Scale: features shuffle as
    // four ints per window; audio bytes never leave their scan task.
    "q212_audio_features" -> ((s, dir) => {
      import s.implicits._
      // spread the per-row WAV encode+decode before the mapPartitions
      // (the q90 single-partition-codec lesson, as in imagePhashPairs)
      val docs = t(s, dir, "documents").select($"doc_id")
        .repartition(32, $"doc_id")
      val wavs = graft.operators.Multimodal
        .synthAudioCorpus(docs, "doc_id", nSamples = 64, sampleRate = 8000)
      graft.operators.Multimodal.audioFeatures(wavs, "wav", windowSize = 16)
        .select($"doc_id", $"sample_rate".cast("long").as("sample_rate"),
          $"n_samples", $"win", $"energy", $"n_zc", $"peak")
        .orderBy($"doc_id", $"win")
    }),

    // Incremental ANN index refresh — the nightly-delta story (q167's
    // cost model applied to q210's persisted index): yesterday's corpus
    // (vec_id % 4 ≠ 0) is built once; tonight's arrivals (% 4 = 0) are
    // encoded against the STORED centroids + codebook — broadcast-sized
    // reads, the base corpus never rescanned, no existing code file
    // rewritten — and appended as new cell-partition files. The serve
    // read then sees the union. Quantization drift (deltas far from the
    // codebook's training corpus) is the documented rebuild trigger; the
    // oracle replays base-derived codebook + full-corpus codes.
    "q211_ann_delta_append" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val base = emb.filter(pmod($"vec_id", lit(4L)) =!= 0)
      val delta = emb.filter(pmod($"vec_id", lit(4L)) === 0)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft_anndelta").toString
      graft.index.AnnIndex.build(base, idxDir)
      graft.index.AnnIndex.appendDelta(s, idxDir, delta)
      val queries = emb.filter($"vec_id" < 16)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      graft.index.AnnIndex.query(s, idxDir, queries, k = 10, nprobe = 4,
          excludeSelf = true)
        .orderBy($"query_id", $"rank")
    }),

    // Dedup pipeline EVALUATION — the scorecard a deployment reads before
    // trusting q39's knobs: on a hash-sampled doc subset (1/8 of the
    // corpus — all-pairs exact Jaccard is affordable there and ONLY
    // there), the production LSH pipeline's predictions are scored
    // against exact char-4-gram Jaccard at three thresholds.
    // Precision/recall/F1 are exact integer ratios; the exact-Jaccard
    // cut is cross-multiplied (ni·10⁴ ≥ t4·|A∪B| — no float division),
    // and est_jac thresholds compare exactly (k/8 is binary-exact).
    // The result is the real finding every 8-hash MinHash deployment
    // rediscovers: at est ≥ 0.5 the estimator over-predicts near the
    // cut (precision collapses) while banding bounds recall at loose
    // cuts — signatures GENERATE candidates, exact verification decides
    // (q115's division of labor), and this query measures exactly why.
    //
    // HOT-GRAM CAP: the truth side's gram self-join fans out df² per
    // gram, and a stopword-grade gram present in most sampled docs turns
    // it into sample² — so grams with in-sample df > 64 are dropped from
    // BOTH sides of the exact-truth computation (the standard eval-side
    // frequent-gram cut) and the scorecard DISCLOSES the cut as
    // n_grams_capped. The cap bounds fan-out at 64²·n_grams; the sample
    // fraction must still shrink as the corpus grows (1/8 is a bench-
    // scale setting — at 100 TB the same absolute sample comes from a
    // much smaller fraction).
    "q207_dedup_eval" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val sub = docs.filter(pmod(graft.functions.HashFunctions.stableHash64(
          concat(lit("de:"), $"doc_id".cast("string"))), lit(8L)) === 0)
        .select($"doc_id", $"text").localCheckpoint(false)
      val gramsAll = sub.select($"doc_id",
          explode(graft.operators.Dedup.shinglesCol($"text", 4)).as("g"))
        .select($"doc_id",
          pmod(graft.functions.HashFunctions.stableHash64($"g"),
            lit(2147483647L)).as("gh"))
        .distinct().localCheckpoint(false)
      val hot = gramsAll.groupBy($"gh").agg(count(lit(1)).as("df"))
        .filter($"df" > 64L).select($"gh").localCheckpoint(false)
      val nCapped = broadcast(hot.agg(count(lit(1)).as("n_grams_capped")))
      val grams = gramsAll.join(hot, Seq("gh"), "left_anti")
        .localCheckpoint(false)
      val sizes = grams.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
      val inter = grams.as("a").join(grams.as("b"),
          $"a.gh" === $"b.gh" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
        .agg(count(lit(1)).as("ni"))
        .join(sizes.select($"doc_id".as("id_a"), $"sz".as("sza")), "id_a")
        .join(sizes.select($"doc_id".as("id_b"), $"sz".as("szb")), "id_b")
        .localCheckpoint(false) // three thresholds read it
      val th = Seq(2500L, 5000L, 7500L).toDF("t4")
      val truth = inter.crossJoin(broadcast(th))
        .filter($"ni" * 10000L >= $"t4" * ($"sza" + $"szb" - $"ni"))
        .select($"t4", $"id_a", $"id_b")
      val predAll = graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text",
          numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.0)
        .join(sub.select($"doc_id".as("id_a")), "id_a")
        .join(sub.select($"doc_id".as("id_b")), "id_b")
        .localCheckpoint(false)
      val pred = predAll.crossJoin(broadcast(th))
        .filter($"est_jac" * 10000.0 >= $"t4".cast("double"))
        .select($"t4", $"id_a", $"id_b")
      val nt = truth.groupBy($"t4").agg(count(lit(1)).as("n_true"))
      val np = pred.groupBy($"t4").agg(count(lit(1)).as("n_pred"))
      val ntp = pred.join(truth, Seq("t4", "id_a", "id_b"))
        .groupBy($"t4").agg(count(lit(1)).as("n_tp"))
      th.join(nt, Seq("t4"), "left").join(np, Seq("t4"), "left")
        .join(ntp, Seq("t4"), "left")
        .na.fill(0L, Seq("n_true", "n_pred", "n_tp"))
        .crossJoin(broadcast(sub.agg(count(lit(1)).as("n_docs"))))
        .crossJoin(nCapped)
        .select($"t4", $"n_docs", $"n_grams_capped", $"n_true", $"n_pred", $"n_tp",
          when($"n_pred" > 0, expr("(n_tp * 10000) div n_pred")).as("precision4"),
          when($"n_true" > 0, expr("(n_tp * 10000) div n_true")).as("recall4"),
          when($"n_pred" + $"n_true" > 0,
            expr("(2 * n_tp * 10000) div (n_pred + n_true)")).as("f1_4"))
        .orderBy($"t4")
    }),

    // Association lift between event types co-occurring in a session
    // (the market-basket read over q65's sessions): support counts are
    // exact integers from one session-keyed self-join of the DISTINCT
    // (session, type) stream — baskets are bounded by the type enumeration,
    // so the join fan-out per session is ≤ |types|², never corpus² — and
    // lift = (N·n_ab)/(n_a·n_b) quantizes as one integer division. The
    // pair matrix a recommender or anomaly rule-miner starts from.
    "q205_assoc_lift" -> ((s, dir) => {
      import s.implicits._
      val st = graft.operators.Sessionize.assignSessions(
          t(s, dir, "events").select($"user_id", $"ts", $"event_id", $"event_type"),
          "user_id", "ts", "event_id", gap = 21600000000000L)
        .select($"user_id", $"session_seq", $"event_type").distinct()
        .localCheckpoint(false) // singles, pairs, and N all read it
      val n = broadcast(st.select($"user_id", $"session_seq").distinct()
        .agg(count(lit(1)).as("n_sess")))
      val singles = st.groupBy($"event_type").agg(count(lit(1)).as("n_t"))
      val pairs = st.as("a")
        .join(st.as("b"),
          $"a.user_id" === $"b.user_id" && $"a.session_seq" === $"b.session_seq" &&
            $"a.event_type" < $"b.event_type")
        .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(singles.select($"event_type".as("type_a"), $"n_t".as("n_a"))), "type_a")
        .join(broadcast(singles.select($"event_type".as("type_b"), $"n_t".as("n_b"))), "type_b")
        .crossJoin(n)
        .select($"type_a", $"type_b", $"n_ab", $"n_a", $"n_b",
          // decimal(38,0) accumulation (q189/q200 policy): n_sess·n_ab
          // silently wraps BIGINT past ~9.2e12·10^6 in non-ANSI mode
          expr("(cast(n_sess as decimal(38,0)) * n_ab * 1000000)" +
            " div (cast(n_a as decimal(38,0)) * n_b)").as("lift6"))
        .orderBy($"type_a", $"type_b")
    }),

    // RFM segmentation (Hughes 1994 — the marketing-analytics primitive):
    // recency/frequency/monetary per user, banded by FIXED thresholds
    // (scan-side CASE — no ntile window over the user universe, the shape
    // that survives a billion users), rolled up to segment counts.
    // Recency is exact integer hours against the corpus max timestamp
    // (one broadcast scalar); monetary is exact micro-units.
    "q206_rfm" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val mx = broadcast(ev.agg(max($"ts").as("mx")))
      ev.groupBy($"user_id")
        .agg(max($"ts").as("last_ts"), count(lit(1)).as("freq"),
          sum(expr("cast(floor(value * 1000000) as bigint)")).as("mon_u"))
        .crossJoin(mx)
        .select(
          when(expr("(mx - last_ts) div 3600000000000") < 6, 3L)
            .when(expr("(mx - last_ts) div 3600000000000") < 24, 2L)
            .otherwise(1L).as("r"),
          when($"freq" >= 70, 3L).when($"freq" >= 55, 2L).otherwise(1L).as("f"),
          when($"mon_u" >= 4000000000L, 3L)
            .when($"mon_u" >= 2500000000L, 2L).otherwise(1L).as("m"),
          $"freq", $"mon_u")
        .groupBy($"r", $"f", $"m")
        .agg(count(lit(1)).as("n_users"), sum($"freq").as("n_events"),
          sum($"mon_u").as("sum_mon_u"))
        .orderBy($"r", $"f", $"m")
    }),

    // Benford first-digit audit (Newcomb 1881 / Benford 1938 — the
    // telemetry-fraud screen: organically-generated magnitudes follow
    // log10(1+1/d); fabricated or clipped feeds don't). The first digit
    // comes from EXACT integer math — cent-units, then leading digit via
    // the decimal string length (both engines render integers
    // identically) — and the Benford expectations are nine LITERAL
    // 1e-6-quantized constants, so no transcendental runs anywhere.
    // Per-digit χ² contributions floor-quantize to BIGINT micro-units
    // before any sum (the bm25Micro policy), keeping every downstream
    // aggregate order-free. One scan, a 9-row aggregate.
    "q203_benford" -> ((s, dir) => {
      import s.implicits._
      // floor(log10(1+1/d) * 1e6) for d = 1..9 — precomputed literals
      val benfordU = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
        66946L, 57991L, 51152L, 45757L)
      val expCol = benfordU.zipWithIndex.foldLeft(lit(0L)) {
        case (acc, (p, i)) => when($"digit" === (i + 1), lit(p)).otherwise(acc)
      }
      val digits = t(s, dir, "events")
        .select(expr("cast(floor(value * 100) as bigint)").as("vc"))
        .filter($"vc" > 0)
        .select(expr("vc div cast(pow(10, length(cast(vc as string)) - 1) as bigint)")
          .as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
      val tot = broadcast(digits.agg(sum($"n_obs").as("n")))
      digits.crossJoin(tot)
        .withColumn("p_u", expCol)
        .select($"digit", $"n_obs",
          // expected count in micro-units: n · p (exact integer product)
          ($"n" * $"p_u").as("exp_u"),
          // χ² contribution (obs − n·p)²/(n·p), micro-quantized: all
          // inputs exact, one pinned double expression per digit
          floor(
            (($"n_obs".cast("double") - $"n".cast("double") * ($"p_u".cast("double") / 1000000.0))
              * ($"n_obs".cast("double") - $"n".cast("double") * ($"p_u".cast("double") / 1000000.0)))
              / ($"n".cast("double") * ($"p_u".cast("double") / 1000000.0))
              * 1000000.0).cast("long").as("chi2_u"))
        .orderBy($"digit")
    }),

    // Pairwise Pearson correlation matrix of the q70 quality signals —
    // the corpus-science companion to q156's (lang × source) MI: which
    // quality dimensions are redundant (|r| high → one filter threshold
    // implies the other) and which are independent evidence. Signals
    // quantize to exact integer micro-units at the scan; every moment is
    // an exact decimal(38,0) sum (q189's policy, HUGEINT oracle twin);
    // one pinned double ratio per pair, floor-quantized at 1e-6. The
    // matrix is signals² rows from ONE single-row moment aggregate — no
    // per-pair scans.
    "q204_signal_corr" -> ((s, dir) => {
      import s.implicits._
      val sigs = t(s, dir, "documents")
        .select(graft.operators.TextAnalysis.tokensCol($"text").as("tk"))
        .filter(size($"tk") > 0)
        .select(
          size($"tk").cast("long").as("s1"),
          // mean token length, micro-units: (Σlen · 1e6) div n_tok
          expr("(aggregate(tk, 0L, (a, x) -> a + length(x)) * 1000000) div size(tk)").as("s2"),
          // distinct-token ratio, micro-units
          expr("(size(array_distinct(tk)) * 1000000) div size(tk)").as("s3"))
      def d(c: Column) = c.cast("decimal(19,0)")
      val mom = sigs.agg(
        count(lit(1)).as("n"),
        sum($"s1").as("m1"), sum($"s2").as("m2"), sum($"s3").as("m3"),
        sum(d($"s1") * d($"s1")).as("m11"), sum(d($"s2") * d($"s2")).as("m22"),
        sum(d($"s3") * d($"s3")).as("m33"), sum(d($"s1") * d($"s2")).as("m12"),
        sum(d($"s1") * d($"s3")).as("m13"), sum(d($"s2") * d($"s3")).as("m23"))
      val pairs = Seq(
        ("n_tok", "mean_len", "m1", "m2", "m11", "m22", "m12"),
        ("n_tok", "ttr", "m1", "m3", "m11", "m33", "m13"),
        ("mean_len", "ttr", "m2", "m3", "m22", "m33", "m23"))
      pairs.map { case (na, nb, a, b, aa, bb, ab) =>
        mom.select(lit(na).as("sig_a"), lit(nb).as("sig_b"),
          floor(
            ($"n".cast("double") * col(ab).cast("double")
              - col(a).cast("double") * col(b).cast("double"))
              / sqrt(($"n".cast("double") * col(aa).cast("double")
                - col(a).cast("double") * col(a).cast("double"))
                * ($"n".cast("double") * col(bb).cast("double")
                  - col(b).cast("double") * col(b).cast("double")))
              * 1000000.0).cast("long").as("r6"))
      }.reduce(_ unionByName _).orderBy($"sig_a", $"sig_b")
    }),

    // Degree assortativity (Newman 2002) of the strong near-dup graph —
    // the last graph-science audit next to q147's triangles, q164's
    // component sizes and q170's k-core: TEMPLATE corpora (hub docs
    // duplicated everywhere) are disassortative, clone FARMS (uniform
    // cliques) assortative, so r separates the two contamination shapes
    // the size histogram alone cannot. Newman's r over directed stubs
    // (each undirected edge both ways, so Σx = Σy and one moment triple
    // suffices) from EXACT integer moments — degrees are ints; Σxy/Σxx in
    // decimal(38,0) vs the oracle's HUGEINT (q189's policy) — with one
    // double ratio in pinned operation order, floor-quantized at 1e-6.
    // Graph build is the q147 LSH pass (bounded buckets, never corpus²);
    // moments are one node-sized join + aggregate.
    "q200_dup_assortativity" -> ((s, dir) => {
      import s.implicits._
      val pairs = graft.operators.Dedup.nearDupPairs(
        t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.75)
      graft.operators.GraphMetrics.degreeAssortativity(pairs, "id_a", "id_b")
    }),

    // EXACT set-similarity self-join with prefix filtering (AllPairs/
    // PPJoin, Bayardo'07/Xiao'08) — the exact complement to q39's
    // MinHash-LSH: every pair with true shingle-set Jaccard ≥ 0.5 and
    // nothing else, no banding luck. Runs over the q57 window corpus
    // (overlapping windows of one doc genuinely share shingles — the raw
    // corpus has no true near-dups: max exact J = 0.29). The prefix-
    // filter lemma makes the candidate equi-join lossless, so the oracle
    // is the straight brute-force all-pairs — identical rows proves the
    // filter dropped nothing. Scale: shuffles keyed by element and by id
    // only; rarest-first canonical order keeps prefix fan-out on low-df
    // elements (see [[graft.operators.SetSimJoin]]).
    "q215_setsim_exact" -> ((s, dir) => {
      import s.implicits._
      val win = t(s, dir, "documents")
        .filter($"doc_id" < 200)
        .withColumn("stride", greatest(lit(1L), floor(length($"text") / lit(8.0))))
        .withColumn("wlen", greatest(lit(4L), floor(length($"text") / lit(2.0))))
        .select(($"doc_id" * 3).as("base"), $"text", $"stride", $"wlen",
          explode(sequence(lit(0L), lit(2L))).as("w"))
        .select(($"base" + $"w").as("win_id"),
          $"text".substr(($"w" * $"stride" + 1).cast("int"), $"wlen".cast("int")).as("wtext"))
      graft.operators.SetSimJoin
        .selfJoin(win, "win_id", "wtext", shingleN = 5, tau4 = 5000L)
        .orderBy($"id_a", $"id_b")
    }),

    // Blocked record linkage (entity resolution): a deterministic "dirty
    // feed" — every customer name with one digit deleted at a key-derived
    // position — is linked back to the clean table via rarest-2 q-gram
    // blocking + Levenshtein verify ([[graft.operators.RecordLinkage]]).
    // Both engines run the SAME classic DP levenshtein, so the verify is
    // exact; blocking is the replayable-heuristic contract (like LSH
    // banding). Measured here: rarest-2 blocking (≈14 candidates/record)
    // elects the IDENTICAL best matches as brute-force all-pairs — and
    // n_ties discloses the genuinely ambiguous deletions (a deleted
    // significant digit is equidistant from two source names).
    "q216_record_linkage" -> ((s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val clean = cust.select($"c_custkey".as("rid"), $"c_name".as("name"))
      val dirty = cust.select(($"c_custkey" + 10000000L).as("rid"),
        concat(
          $"c_name".substr(lit(1), (lit(9) + pmod($"c_custkey", lit(8))).cast("int")),
          expr("substring(c_name, cast(11 + c_custkey % 8 as int))")).as("name"))
      graft.operators.RecordLinkage
        .linkage(clean, dirty, "rid", "name", "rid", "name",
          q = 4, rarest = 2, maxDist = 2)
        .select($"rid".as("dirty_id"), $"lid".as("match_key"),
          $"dist", $"n_cands", $"n_ties")
        .orderBy($"dirty_id")
    }),

    // Bigram-LM fluency scoring (stupid backoff, Brants'07) — the
    // held-out counterpart to q107's interpolated LM: q107 smooths by
    // mixing bigram+unigram and scores the training corpus itself (no
    // branch ever misses); this trains on an 80% hash split and scores
    // the HELD-OUT 20%, so the hit/backoff/OOV branches — the decision
    // structure a deployment actually filters on — genuinely fire and
    // are counted per doc. Integer-exact throughout: every conditional
    // probability quantizes to basis points via integral division the
    // moment it is computed and sums as BIGINT; no transcendental at
    // all (vs q107's quantized micro-nats). See
    // [[graft.operators.NgramLm]] for the 100 TB shape: the model is two
    // Heaps-sublinear count tables; scoring is linear joins keyed by
    // bigram/unigram.
    "q217_bigram_lm_score" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val h = graft.functions.HashFunctions.stableHash64(
        concat(lit("lm:"), $"doc_id".cast("string")))
      val train = docs.filter(pmod(h, lit(5L)) =!= 0)
      val evalDocs = docs.filter(pmod(h, lit(5L)) === 0)
      graft.operators.NgramLm.bigramScore(train, evalDocs, "doc_id", "text")
        .select($"id".as("doc_id"), $"n_pairs", $"n_hit", $"n_backoff",
          $"n_oov", $"sum_bps", $"mean_bps")
        .orderBy($"doc_id")
    }),

    // CDC MERGE apply ([[graft.operators.Cdc]]) — the upsert/delete log
    // pattern next to SCD2 (q124) and IVM (q176): events become a change
    // log (error = tombstone, else upsert; seq = (µs ts, event_id)), the
    // pre-cutoff log collapses to a live base snapshot, the post-cutoff
    // delta collapses per key, and the merge classifies every key's
    // outcome (carry/insert/update/delete/noop_delete) before it lands.
    // All latest-wins elections are window row_number under a total
    // order; µs seq per the ts-precision policy. Scale: two key-sharded
    // windows + one key join — history is never rescanned.
    "q218_cdc_merge" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      def logOf(df: org.apache.spark.sql.DataFrame) = df.select(
        $"user_id".as("key"), expr("ts div 1000").as("seq"),
        $"event_id".as("tiebreak"),
        when($"event_type" === "error", lit("D")).otherwise(lit("U")).as("op"),
        expr("cast(floor(value * 1000000) as bigint)").as("val"))
      val cutUs = 1706140800000000L // the q176 cutoff, in µs
      graft.operators.Cdc.mergeClassify(
          logOf(ev.filter(expr("ts div 1000") < cutUs)),
          logOf(ev.filter(expr("ts div 1000") >= cutUs)))
        .select($"key".as("user_id"), $"action",
          $"live_val".as("live_val_u"), $"n_base_ops", $"n_delta_ops")
        .orderBy($"user_id")
    }),

    // Weighted πps sampling (sequential Poisson, Ohlsson 1998) — the
    // PER-STRATUM sibling of q104's global A-ES draw, and a different
    // estimator family: q104 ranks by -ln(u)/w (nano-quantized ln),
    // this ranks by the raw u48/w priority — one IEEE double division,
    // bit-identical on any IEEE engine, no transcendental at all — with
    // k = 10 winners per source. The rank filter sits directly on the
    // row_number window so Spark plans WindowGroupLimit — map tasks
    // forward ≤ k rows per source, the per-stratum hazard q199 removed
    // never appears. See [[graft.operators.WeightedSample]].
    "q219_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      graft.operators.WeightedSample
        .perStratum(t(s, dir, "documents"), "source", "doc_id", "n_chars",
          k = 10, salt = "wps")
        .select($"stratum".as("source"), $"rank", $"id".as("doc_id"),
          $"weight".as("n_chars"), $"pri4")
        .orderBy($"source", $"rank")
    }),

    // Join-cardinality probe ([[graft.operators.Salting.estimateJoinSize]])
    // — the SAMPLING estimator next to q160's sketch estimator: q160
    // answers from k-row heavy-hitter sketches under the containment
    // assumption; this draws a deterministic 1-in-4 hash sample of KEYS
    // and scales rate·Σ d·d′ — no distributional assumption, error from
    // sampling variance instead (key sampling keeps each degree product
    // exact; row sampling would bias quadratically). Degrees for all
    // three probed pairs come from ONE grouped pass over events; actual
    // vs estimate vs err4 in exact integers. At 100 TB the degree
    // aggregate is the only row-sized shuffle and the probe reads the
    // sampled slice.
    "q220_join_size_probe" -> ((s, dir) => {
      import s.implicits._
      val deg = t(s, dir, "events").groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("d"))
        .localCheckpoint(false) // six filtered views read it
      Seq(("click", "view"), ("error", "signup"), ("purchase", "view"))
        .map { case (a, b) =>
          graft.operators.Salting.estimateJoinSize(
              deg.filter($"event_type" === a).select($"user_id", $"d"),
              deg.filter($"event_type" === b).select($"user_id", $"d"),
              "user_id", rate = 4L)
            .select(lit(a).as("side_a"), lit(b).as("side_b"),
              $"n_keys_sampled", $"est_rows", $"actual_rows", $"err4")
        }
        .reduce(_ unionByName _)
        .orderBy($"side_a", $"side_b")
    }),

    // Bounded-hop harmonic centrality (Boldi & Vigna 2014, truncated) on
    // the strong near-dup graph — the node-local companion to PageRank
    // (q108) / k-core (q170): how much near-duplicate mass sits within 3
    // hops of each doc, with reciprocal distances in exact micro-units so
    // the sum is order-free. Each hop is one frontier ⋈ edges join + one
    // anti-join against known distances ([[graft.operators.GraphMetrics
    // .harmonicCentralityGuarded]]) — edge-sized rounds, no all-pairs
    // closure. GIANT-COMPONENT GUARD (round 11): components over 10% of
    // the corpus (the q165 share gate) are flagged and never traversed —
    // a welded LSH chain would otherwise blow each BFS hop quadratic;
    // flagged members report NULL centrality + flagged = 1 for review.
    "q221_harmonic_centrality" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.nearDupPairs(
        docs, "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2, threshold = 0.75)
      graft.operators.GraphMetrics
        .harmonicCentralityGuarded(pairs, "id_a", "id_b", hops = 3,
          maxShare4 = 1000L, totalIds = docs.select($"doc_id"))
        .orderBy($"id")
    }),

    // Repeated-span census ([[graft.operators.RepeatedSpans]]) — the
    // memorization audit (Lee et al. 2022's concern, measured): for a
    // ladder of lengths L ∈ {4, 8, 16, 32}, how many L-token windows
    // occur ≥ 2× corpus-wide and how hot is the hottest. Rising repeat
    // mass at large L = template/boilerplate contamination that per-doc
    // dedup misses; this instrument picks SpanDedup's k. Window text is
    // hashed at the scan; only (L, hash) longs shuffle.
    "q222_repeated_spans" -> ((s, dir) => {
      import s.implicits._
      graft.operators.RepeatedSpans
        .census(t(s, dir, "documents"), "doc_id", "text", Seq(4, 8, 16, 32))
        .orderBy($"span_len")
    }),

    // Graded nDCG@10 for the multi-probe ANN index — the metric q101's
    // recall/MRR scorecard lacks: POSITION-WEIGHTED credit with graded
    // relevance (true-NN = 3, top-3 = 2, top-10 = 1 from brute-force
    // ground truth). The log2 discounts are ten LITERAL micro-quantized
    // constants (the q203 Benford treatment — no transcendental runs),
    // gains are 2^g − 1, and the ideal DCG is the constant
    // 7w₁+3w₂+3w₃+Σw₄₋₁₀ = 12805412 because every query's truth set
    // carries the same grade multiset — so nDCG is one exact integral
    // division. Eval cost: two corpus scans (truth + index), queries
    // broadcast; at 100 TB this runs on a sampled query set (q101's
    // contract).
    "q223_ndcg_eval" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter($"vec_id" < 8)
        .select($"vec_id".as("query_id"), $"embedding")
      val truth = graft.operators.SimilaritySearch
        .bruteForceTopK(emb, queries, 10)
        .select($"query_id", $"neighbor_id",
          when($"rank" === 1, 3L).when($"rank" <= 3, 2L).otherwise(1L).as("grade"))
      val got = graft.operators.SimilaritySearch
        .lshTopKMultiProbe(emb, queries, 10, 64, 4)
        .select($"query_id", $"neighbor_id", $"rank")
      val wArr = lit(Array(1000000L, 630929L, 500000L, 430676L, 386852L,
        356207L, 333333L, 315464L, 301029L, 289064L))
      got.join(truth, Seq("query_id", "neighbor_id"), "left")
        .select($"query_id", coalesce($"grade", lit(0L)).as("grade"),
          element_at(wArr, $"rank".cast("int")).as("wt"))
        .select($"query_id", ($"grade" > 0).cast("long").as("hit"),
          (when($"grade" === 3, 7L).when($"grade" === 2, 3L)
            .when($"grade" === 1, 1L).otherwise(0L) * $"wt").as("contrib"))
        .groupBy($"query_id")
        .agg(sum($"hit").as("n_hit"), sum($"contrib").as("dcg_u"))
        .select($"query_id", $"n_hit", $"dcg_u",
          expr("dcg_u * 1000000 div 12805412").as("ndcg_micro"))
        .orderBy($"query_id")
    }),

    // Difference-in-differences — the experimentation family's quasi-
    // experimental member next to q162 (A/B) and q189 (CUPED): hash-
    // assigned "treatment" users vs control, purchase value µ-units
    // before/after the Jan-25 cut, DiD = (ΔT − ΔC) of cell means — plus
    // the PLACEBO check real DiD analyses run (the same estimator across
    // a Jan-12 pseudo-cut entirely inside the pre-period must be ≈ 0,
    // the parallel-trends evidence). ONE conditional-aggregation scan
    // produces all six cells; means are integral division of exact
    // µ-unit sums, so both engines agree bit-for-bit.
    "q224_diff_in_diff" -> ((s, dir) => {
      import s.implicits._
      val cutMain = 1706140800000000L // 2024-01-25 in µs
      val cutPlacebo = 1705017600000000L // 2024-01-12 in µs
      val ev = t(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select(expr("ts div 1000").as("tsu"), $"user_id",
          expr("cast(floor(value * 1000000) as bigint)").as("vu"))
        .withColumn("tr",
          (pmod(graft.functions.HashFunctions.stableHash64(
            concat(lit("did:"), $"user_id".cast("string"))), lit(2L)) === 0)
            .cast("long"))
        .withColumn("per",
          when($"tsu" >= cutMain, lit("post"))
            .when($"tsu" >= cutPlacebo, lit("mid")).otherwise(lit("early")))
      def cell(tr: Int, per: String, of: Column) =
        sum(when($"tr" === tr && $"per" === per, of).otherwise(lit(0L)))
      ev.agg(
          cell(1, "early", lit(1L)).as("n_t_early"),
          cell(1, "mid", lit(1L)).as("n_t_mid"),
          cell(1, "post", lit(1L)).as("n_t_post"),
          cell(0, "early", lit(1L)).as("n_c_early"),
          cell(0, "mid", lit(1L)).as("n_c_mid"),
          cell(0, "post", lit(1L)).as("n_c_post"),
          cell(1, "early", $"vu").as("s_t_early"),
          cell(1, "mid", $"vu").as("s_t_mid"),
          cell(1, "post", $"vu").as("s_t_post"),
          cell(0, "early", $"vu").as("s_c_early"),
          cell(0, "mid", $"vu").as("s_c_mid"),
          cell(0, "post", $"vu").as("s_c_post"))
        .select(
          ($"n_t_early" + $"n_t_mid").as("n_t_pre"), $"n_t_post",
          ($"n_c_early" + $"n_c_mid").as("n_c_pre"), $"n_c_post",
          expr("(s_t_early + s_t_mid) div (n_t_early + n_t_mid)").as("m_t_pre"),
          expr("s_t_post div n_t_post").as("m_t_post"),
          expr("(s_c_early + s_c_mid) div (n_c_early + n_c_mid)").as("m_c_pre"),
          expr("s_c_post div n_c_post").as("m_c_post"),
          expr("(s_t_post div n_t_post - (s_t_early + s_t_mid) div (n_t_early + n_t_mid))" +
            " - (s_c_post div n_c_post - (s_c_early + s_c_mid) div (n_c_early + n_c_mid))")
            .as("did_u"),
          expr("(s_t_mid div n_t_mid - s_t_early div n_t_early)" +
            " - (s_c_mid div n_c_mid - s_c_early div n_c_early)")
            .as("placebo_did_u"))
    }),

    // Perceptual-hash scale robustness — the multimodal invariance census
    // a dedup deployment reads before trusting q209's bands across
    // re-encodes: REAL decode → EXACT 2×2 integral average-pool (8×8 →
    // 4×4, each cell Σ4 div 4) → 12-bit pooled dHash, compared against
    // the full-resolution 56-bit dHash per perturbation group. Pooling
    // averages out isolated pixel flips, so same-group images collapse
    // to fewer distinct pooled hashes than full-res ones — measured per
    // group, not asserted. Oracle replays the whole decode→pool→hash
    // path from the md5 pixel closed form, codec-free. Scale: images
    // shuffle as one long each after the scan-side decode.
    "q225_phash_pooling" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id")
        .repartition(32, $"doc_id") // spread the codec work (q90 lesson)
      val imgs = graft.operators.Multimodal
        .synthImageCorpus(docs, "doc_id", groupDiv = 4)
      // ONE decode pass: perceptualHashes carries the pooled dHash along
      // with the full-res bands (formerly two decodes + a join)
      graft.operators.Multimodal.perceptualHashes(imgs, "img")
        .select($"doc_id",
          ($"d0" + shiftleft($"d1", 14) + shiftleft($"d2", 28)
            + shiftleft($"d3", 42)).as("full_hash"),
          $"pool_hash")
        .groupBy(expr("doc_id div 4").as("group_id"))
        .agg(count(lit(1)).as("n_members"),
          countDistinct($"full_hash").as("n_distinct_full"),
          countDistinct($"pool_hash").as("n_distinct_pooled"))
        .orderBy($"group_id")
    }),

    // Incremental EXACT set-similarity join — q215's operator under the
    // q78/q167 nightly-delta cost model: only pairs TOUCHING tonight's
    // arrivals (delta×base, delta×delta) are computed, ordered by the
    // STORED base df table alone. Exactness survives the stale order
    // because the prefix lemma needs only a CONSISTENT total order on
    // both sides — df drift costs prefix selectivity, never a pair
    // ([[graft.operators.SetSimJoin.deltaJoin]]; the spec proves output
    // equality with the full self-join restricted to touching pairs).
    "q226_setsim_incremental" -> ((s, dir) => {
      import s.implicits._
      val win = t(s, dir, "documents")
        .filter($"doc_id" < 200)
        .withColumn("stride", greatest(lit(1L), floor(length($"text") / lit(8.0))))
        .withColumn("wlen", greatest(lit(4L), floor(length($"text") / lit(2.0))))
        .select(($"doc_id" * 3).as("base"), $"text", $"stride", $"wlen",
          explode(sequence(lit(0L), lit(2L))).as("w"))
        .select(($"base" + $"w").as("win_id"),
          $"text".substr(($"w" * $"stride" + 1).cast("int"), $"wlen".cast("int")).as("wtext"))
        .localCheckpoint(false) // base and delta sides both read it
      graft.operators.SetSimJoin
        .deltaJoin(win.filter(pmod($"win_id", lit(4L)) =!= 0),
          win.filter(pmod($"win_id", lit(4L)) === 0),
          "win_id", "wtext", shingleN = 5, tau4 = 5000L)
        .orderBy($"id_a", $"id_b")
    }),

    // Unicode-normalization-aware dedup — the text-cleaning stage byte-
    // level dedup needs: precomposed "é" (U+00E9) and decomposed
    // "e"+U+0301 are different byte strings that render identically, so
    // md5 dedup misses them until both sides pass through NFC (the new
    // native [[org.apache.spark.sql.graft.expressions.NfcNormalize]],
    // byte-identical to DuckDB's nfc_normalize — both implement the
    // Unicode standard). A derived corpus plants 150 pairs differing
    // ONLY by normalization form among 150 genuinely-distinct pairs; the
    // census shows raw dedup finds 0 groups, normalized finds exactly
    // the planted 150. Scan-side expression; dedup shuffles hashes only.
    "q227_unicode_dedup" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.graft.Bridge
      val d = t(s, dir, "documents").filter($"doc_id" < 300)
      // explicit \u escapes, NOT raw source codepoints (an editor or
      // formatter could silently NFC the file): va carries the
      // PRECOMPOSED forms (U+00E9, U+00F1), vb the DECOMPOSED
      // (e+U+0301, n+U+0303) — byte-distinct until NFC unifies them
      val va = d.select(($"doc_id" * 2).as("id"),
        when(pmod($"doc_id", lit(2L)) === 0,
          concat($"text", lit(" caf\u00e9 jalape\u00f1o")))
          .otherwise(concat($"text", lit(" alpha"))).as("txt"))
      val vb = d.select(($"doc_id" * 2 + 1).as("id"),
        when(pmod($"doc_id", lit(2L)) === 0,
          concat($"text", lit(" cafe\u0301 jalapen\u0303o")))
          .otherwise(concat($"text", lit(" beta"))).as("txt"))
      val corpus2 = va.unionByName(vb).localCheckpoint(false)
      val nfc = Bridge.toColumn(
        org.apache.spark.sql.graft.expressions.NfcNormalize(Bridge.toExpr($"txt")))
      def census(h: org.apache.spark.sql.Column, pfx: String) = corpus2
        .groupBy(h.as("h")).agg(count(lit(1)).as("n")).filter($"n" >= 2)
        .agg(count(lit(1)).as(s"${pfx}_groups"),
          coalesce(sum($"n"), lit(0L)).as(s"${pfx}_members"))
      corpus2
        .agg(count(lit(1)).as("n_rows"),
          sum((nfc =!= $"txt").cast("long")).as("n_changed"))
        .crossJoin(census(md5($"txt"), "raw"))
        .crossJoin(census(md5(nfc), "norm"))
    }),

    // Bootstrap confidence intervals — the uncertainty layer under every
    // mean this suite reports, via the distributed-standard Poisson(1)
    // bootstrap (each row's weight in resample b drawn independently —
    // the multinomial approximation every large-scale bootstrap uses)
    // made DETERMINISTIC: the weight comes from a salted md5 micro-
    // uniform against four LITERAL Poisson-CDF thresholds (the q203
    // constant treatment), so both engines replay every resample
    // exactly. B = 32 resamples per event type; CI = ranks 2 and 31 of
    // the ordered resample means (~94% coverage), means exact µ-unit
    // integral division. Scale: one 32× row explode + a (type, draw)
    // aggregate — the window orders 32 rows per type, never the corpus.
    "q228_bootstrap_ci" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_type", $"event_id",
          expr("cast(floor(value * 1000000) as bigint)").as("vu"))
      val draws = ev.select($"event_type", $"event_id", $"vu",
          explode(sequence(lit(0L), lit(31L))).as("b"))
        .withColumn("u", pmod(graft.functions.HashFunctions.stableHash64(
          concat(lit("boot:"), $"b".cast("string"), lit(":"),
            $"event_id".cast("string"))), lit(1000000L)))
        .withColumn("w",
          when($"u" < 367879L, 0L).when($"u" < 735758L, 1L)
            .when($"u" < 919698L, 2L).when($"u" < 981011L, 3L).otherwise(4L))
      val means = draws.groupBy($"event_type", $"b")
        .agg(expr("sum(w * vu) div sum(w)").as("m"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"event_type").orderBy($"m", $"b")))
      val pt = ev.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), expr("sum(vu) div count(1)").as("mean_u"))
      pt.join(means.filter($"rk" === 2).select($"event_type", $"m".as("ci_lo_u")),
          "event_type")
        .join(means.filter($"rk" === 31).select($"event_type", $"m".as("ci_hi_u")),
          "event_type")
        .select($"event_type", $"n", $"mean_u", $"ci_lo_u", $"ci_hi_u")
        .orderBy($"event_type")
    }),

    // Theil–Sen robust trend (median of pairwise slopes) vs OLS on daily
    // event volume — the robust-statistics member next to q154
    // (winsorize) and q161 (robust anomaly): one wild day barely moves
    // the pairwise-slope median but drags the least-squares line, and
    // this query reports both so the divergence IS the outlier signal.
    // Pairwise slopes are a ONE pinned double expression floor-quantized
    // at 1e-6 (Δy may be negative — floor, never div); the median is a
    // row_number election over C(n_days, 2) ≈ 435 rows per type (the
    // day-pair space is calendar², never event-sized); OLS moments
    // accumulate in decimal(38,0) per the q189 policy.
    "q229_theil_sen" -> ((s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .groupBy($"event_type", expr("(ts div 1000) div 86400000000").as("day"))
        .agg(count(lit(1)).as("y"))
        .localCheckpoint(false) // pair join + OLS moments both read it
      val pairs = daily.as("a")
        .join(daily.as("b"),
          $"a.event_type" === $"b.event_type" && $"a.day" < $"b.day")
        .select($"a.event_type".as("event_type"), $"a.day".as("d1"),
          $"b.day".as("d2"),
          floor(($"b.y" - $"a.y").cast("double") / ($"b.day" - $"a.day")
            * 1000000.0).cast("long").as("slope6"))
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type")
      val med = pairs
        .withColumn("rk", row_number().over(
          wT.orderBy($"slope6", $"d1", $"d2")))
        .withColumn("np", count(lit(1)).over(wT))
        .filter($"rk" === expr("(np + 1) div 2"))
        .select($"event_type", $"np".as("n_pairs"), $"slope6".as("ts_slope6"))
      val ols = daily.groupBy($"event_type")
        .agg(count(lit(1)).as("nd"), sum($"day").as("sx"), sum($"y").as("sy"),
          sum($"day".cast("decimal(19,0)") * $"y".cast("decimal(19,0)")).as("sxy"),
          sum($"day".cast("decimal(19,0)") * $"day".cast("decimal(19,0)")).as("sxx"))
        .select($"event_type", $"nd".as("n_days"),
          floor((($"nd".cast("double") * $"sxy".cast("double")
            - $"sx".cast("double") * $"sy".cast("double"))
            / ($"nd".cast("double") * $"sxx".cast("double")
              - $"sx".cast("double") * $"sx".cast("double")))
            * 1000000.0).cast("long").as("ols_slope6"))
      ols.join(med, "event_type")
        .select($"event_type", $"n_days", $"n_pairs", $"ts_slope6", $"ols_slope6")
        .orderBy($"event_type")
    }),

    // Quantile normalization across sources — the feature-engineering
    // transform that makes per-source score distributions comparable
    // (each source's value maps to the POOLED value at its relative
    // rank), built the ExactQuantiles way: everything runs on COUNT
    // HISTOGRAMS (distinct-value-sized, Heaps-sublinear), never on the
    // row stream. Source-relative ranks are inclusive cumsums over the
    // per-source histogram; the target rank is the exact integer
    // ⌈r·n_pool/n_s⌉; the mapped value is the unique pooled-histogram
    // row covering that rank (cum − cnt < tr ≤ cum — a histogram ×
    // histogram band join, both sides tiny). The one global window
    // orders the pooled HISTOGRAM (the q198 KS exception), never the
    // corpus.
    "q230_quantile_normalize" -> ((s, dir) => {
      import s.implicits._
      val scores = t(s, dir, "documents").select($"source", $"n_chars".as("v"))
      val hist = scores.groupBy($"source", $"v")
        .agg(count(lit(1)).as("cnt")).localCheckpoint(false)
      val sizes = hist.groupBy($"source").agg(sum($"cnt").as("ns"))
      val srcCum = hist
        .withColumn("r", sum($"cnt").over(
          Window.partitionBy($"source").orderBy($"v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(sizes, "source")
      val poolCum = scores.groupBy($"v".as("pv")).agg(count(lit(1)).as("pcnt"))
        .withColumn("pcum", sum($"pcnt").over(
          Window.orderBy($"pv")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val nPool = broadcast(scores.agg(count(lit(1)).as("np")))
      srcCum.crossJoin(nPool)
        .withColumn("tr", expr("(r * np + ns - 1) div ns"))
        .join(poolCum,
          $"pcum" >= $"tr" && ($"pcum" - $"pcnt") < $"tr")
        .select($"source", $"v", $"cnt", $"r".as("src_rank"),
          $"pv".as("norm_v"))
        .orderBy($"source", $"v")
    }),

    // Audio near-dup — the q209 pipeline for SOUND, closing the
    // multimodal dedup matrix (text LSH / image phash / audio sign
    // bands): REAL WAV decode of a grouped corpus (same-group clips
    // share base samples, ~2 perturbed via the exact −s−1 involution),
    // four 16-bit SIGN bands as bucket keys (a few flipped samples
    // leave some band intact — the SimHash/dHash banding shape), exact
    // differing-sample count as the verify. PCM is verbatim, so the
    // oracle replays decode→bands→verify from the md5 closed form,
    // codec-free. Scale: candidate generation shuffles four longs per
    // clip; sample arrays move only for candidate pairs.
    "q231_audio_neardup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id")
        .repartition(32, $"doc_id") // spread the codec work (q90 lesson)
      val wavs = graft.operators.Multimodal.synthAudioGroups(
        docs, "doc_id", groupDiv = 4, nSamples = 64, sampleRate = 8000)
      val feats = graft.operators.Multimodal.audioSignBands(wavs, "wav")
        .localCheckpoint(false) // band explode + verify both read it
      val ex = feats.select($"doc_id",
        posexplode(array($"ab0", $"ab1", $"ab2", $"ab3")).as(Seq("band", "bh")))
      val cand = ex.as("a").join(ex.as("b"),
          $"a.band" === $"b.band" && $"a.bh" === $"b.bh" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b")).distinct()
      val smp = feats.select($"doc_id", $"samples")
      cand
        .join(smp.select($"doc_id".as("id_a"), $"samples".as("sa")), "id_a")
        .join(smp.select($"doc_id".as("id_b"), $"samples".as("sb")), "id_b")
        .select($"id_a", $"id_b",
          expr("size(filter(zip_with(sa, sb, (x, y) -> x != y), p -> p))")
            .cast("long").as("n_diff"))
        .filter($"n_diff" <= 6)
        .orderBy($"id_a", $"id_b")
    }),

    // Partition retention (TTL/VACUUM) plan — the lakehouse janitor next
    // to the compaction planner (q188) and delete cascade (q180): a
    // per-(day, slot) file manifest derived from events, a 7-day
    // retention horizon against the corpus max day, and a per-day plan
    // row (keep/expire, files, rows, reclaimable µ-bytes). Planning runs
    // ENTIRELY on the manifest (calendar × slots rows) — the day-grain
    // aggregate is the only event-sized pass, the same discipline as
    // q188 (plan on metadata, never rescan data to decide).
    "q232_retention_plan" -> ((s, dir) => {
      import s.implicits._
      val files = t(s, dir, "events")
        .groupBy(expr("(ts div 1000) div 86400000000").as("day"),
          expr("((ts div 1000) div 3600000000) % 6").as("slot"))
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("cast(floor(value * 1000000) as bigint)")).as("bytes_u"))
        .localCheckpoint(false) // horizon scalar + plan both read it
      val horizon = broadcast(files.agg(max($"day").as("mx")))
      files.crossJoin(horizon)
        .select($"day", $"n_rows", $"bytes_u",
          when($"day" <= $"mx" - 7, lit("expire")).otherwise(lit("keep"))
            .as("status"))
        .groupBy($"day", $"status")
        .agg(count(lit(1)).as("n_files"), sum($"n_rows").as("n_rows"),
          sum(when($"status" === "expire", $"bytes_u").otherwise(lit(0L)))
            .as("reclaim_u"))
        .orderBy($"day")
    }),

    // Dictionary-encoding advisor — the storage-layout probe next to
    // z-order (q106) and zone maps (q134): per candidate column, the
    // exact byte arithmetic of dictionary encoding (distinct values ×
    // avg length + rows × index width, width by dictionary size) vs raw,
    // in integers. Each column costs one grouped pass producing a
    // vocabulary-sized aggregate; the advisor output is four rows.
    "q233_dict_advisor" -> ((s, dir) => {
      import s.implicits._
      def advise(df: org.apache.spark.sql.DataFrame, table: String,
          colName: String) = {
        val v = df.select(col(colName).cast("string").as("v"))
        val d = v.groupBy($"v").agg(count(lit(1)).as("n"))
        d.agg(sum($"n").as("n_rows"), count(lit(1)).as("n_distinct"),
            sum(length($"v") * $"n").as("raw_bytes"),
            sum(length($"v")).as("dict_store"))
          .select(lit(table).as("tbl"), lit(colName).as("col_name"),
            $"n_rows", $"n_distinct",
            $"raw_bytes",
            ($"dict_store" + $"n_rows" *
              when($"n_distinct" <= 256, 1L)
                .when($"n_distinct" <= 65536, 2L).otherwise(4L))
              .as("dict_bytes"))
          .select($"tbl", $"col_name", $"n_rows", $"n_distinct",
            $"raw_bytes", $"dict_bytes",
            expr("(raw_bytes - dict_bytes) * 10000 div raw_bytes").as("save4"))
      }
      advise(t(s, dir, "documents"), "documents", "lang")
        .unionByName(advise(t(s, dir, "documents"), "documents", "source"))
        .unionByName(advise(t(s, dir, "events"), "events", "event_type"))
        .unionByName(advise(t(s, dir, "customer"), "customer", "c_mktsegment"))
        .orderBy($"tbl", $"col_name")
    }),

    // Watermark-lag census — the batch diagnostic that SIZES the
    // streaming twins' watermark slack: per user (the keyed-state
    // grain), how often does an event arrive (event_id order) with a
    // timestamp BEHIND the user's prior maximum, and by how much. The
    // inversion window is keyed by user — billions of users shard
    // cleanly; no global arrival window exists at any scale. Output per
    // event type: count, late share (bps), max and mean lateness in µs.
    "q234_watermark_lag" -> ((s, dir) => {
      import s.implicits._
      graft.operators.EvalMetrics.watermarkLag(t(s, dir, "events"))
        .orderBy($"event_type")
    }),

    // Exact AUC (Mann–Whitney with midrank ties) of n_chars as a one-vs-rest
    // lang discriminator — the threshold-free ranking metric next to the
    // calibration audit (q237) and nDCG (q223), computed the ExactQuantiles
    // way: entirely on COUNT HISTOGRAMS. AUC = Σ_v pos(v)·(2·cumneg(<v) +
    // neg(v)) / (2·n_pos·n_neg) — the midrank identity — so one histogram
    // groupBy, a 5-lang × distinct-value grid, and a histogram-sized window
    // give the EXACT statistic; no per-row rank ever materializes. The
    // numerator is Θ(N²) so it accumulates in decimal(38,0) (q189 policy).
    "q235_auc_rank" -> ((s, dir) => {
      import s.implicits._
      graft.operators.EvalMetrics
        .histAuc(t(s, dir, "documents"), "lang", "n_chars")
        .orderBy($"lang")
    }),

    // Two-feature OLS (daily volume ~ day trend + weekday) solved by
    // Cramer's rule over the 3×3 normal equations — multivariate regression
    // as ONE aggregation pass: nine decimal(38,0) moments per event type,
    // determinants in pinned-order doubles, coefficients floor-quantized at
    // 1e-6 (the q229 convention). Day is rebased to the corpus minimum
    // (broadcast scalar) so the moments stay well-conditioned. No row ever
    // leaves its scan partition except as a 9-number partial aggregate —
    // the shape a 100 TB regression must have. SINGULARITY GUARD: a type
    // observed on < 3 days, or with collinear features (all activity on
    // one weekday), has determinant 0 — 0/0 would be NaN/±Infinity, which
    // Spark (non-ANSI) silently casts to 0 / Long extremes while the
    // oracle's ::BIGINT errors. Both engines compute the determinant ONCE
    // and emit NULL coefficients when it is exactly 0.
    "q236_ols2_cramer" -> ((s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "events")
        .groupBy($"event_type",
          expr("(ts div 1000) div 86400000000").as("day"))
        .agg(count(lit(1)).as("y"))
      val d0 = broadcast(daily.agg(min($"day").as("d0")))
      val feat = daily.crossJoin(d0)
        .select($"event_type", ($"day" - $"d0").as("x1"),
          pmod($"day", lit(7L)).as("x2"), $"y")
      def dsum(c: Column) = sum(c.cast("decimal(38,0)"))
      val m = feat.groupBy($"event_type").agg(
        count(lit(1)).as("n"), dsum($"x1").as("s1"), dsum($"x2").as("s2"),
        dsum($"y").as("sy"), dsum($"x1" * $"x1").as("s11"),
        dsum($"x1" * $"x2").as("s12"), dsum($"x2" * $"x2").as("s22"),
        dsum($"x1" * $"y").as("s1y"), dsum($"x2" * $"y").as("s2y"))
      // pinned-order double arithmetic, mirrored character-for-character
      // in the oracle: the determinant ONCE, then each Cramer numerator;
      // det = 0 → NULL coefficients (singular normal equations)
      m.selectExpr("event_type", "cast(n as bigint) as n_days",
          """(
               cast(n as double) * (cast(s11 as double) * cast(s22 as double) - cast(s12 as double) * cast(s12 as double))
             - cast(s1 as double) * (cast(s1 as double) * cast(s22 as double) - cast(s12 as double) * cast(s2 as double))
             + cast(s2 as double) * (cast(s1 as double) * cast(s12 as double) - cast(s11 as double) * cast(s2 as double))
           ) as det""",
          """(
               cast(sy as double) * (cast(s11 as double) * cast(s22 as double) - cast(s12 as double) * cast(s12 as double))
             - cast(s1 as double) * (cast(s1y as double) * cast(s22 as double) - cast(s12 as double) * cast(s2y as double))
             + cast(s2 as double) * (cast(s1y as double) * cast(s12 as double) - cast(s11 as double) * cast(s2y as double))
           ) as num0""",
          """(
               cast(n as double) * (cast(s1y as double) * cast(s22 as double) - cast(s12 as double) * cast(s2y as double))
             - cast(sy as double) * (cast(s1 as double) * cast(s22 as double) - cast(s12 as double) * cast(s2 as double))
             + cast(s2 as double) * (cast(s1 as double) * cast(s2y as double) - cast(s1y as double) * cast(s2 as double))
           ) as num1""",
          """(
               cast(n as double) * (cast(s11 as double) * cast(s2y as double) - cast(s1y as double) * cast(s12 as double))
             - cast(s1 as double) * (cast(s1 as double) * cast(s2y as double) - cast(s1y as double) * cast(s2 as double))
             + cast(sy as double) * (cast(s1 as double) * cast(s12 as double) - cast(s11 as double) * cast(s2 as double))
           ) as num2""")
        .selectExpr("event_type", "n_days",
          "case when det = 0.0D then cast(null as bigint) else cast(floor(num0 / det * 1000000.0) as bigint) end as b0_6",
          "case when det = 0.0D then cast(null as bigint) else cast(floor(num1 / det * 1000000.0) as bigint) end as b1_6",
          "case when det = 0.0D then cast(null as bigint) else cast(floor(num2 / det * 1000000.0) as bigint) end as b2_6")
        .orderBy($"event_type")
    }),

    // Model-calibration audit (reliability diagram + ECE) — the eval-side
    // complement to nDCG (q223) and the bootstrap CI (q228): a synthetic
    // score from the md5 micro-uniform (deliberately informative but
    // miscalibrated: the positive class is shifted, not separated), cut
    // into ten fixed-width bins; each bin reports exact integer mean score
    // and positive rate, and the expected calibration error weights the
    // per-bin gap by bin mass. Everything past the scan is a 10-row
    // aggregate; the ECE scalar is a broadcast attach.
    "q237_calibration" -> ((s, dir) => {
      import s.implicits._
      graft.operators.EvalMetrics.calibration(t(s, dir, "events"))
        .orderBy($"bin")
    }),

    // t-closeness audit — the distribution-level privacy gate l-diversity
    // (q190) cannot express: a (lang, source) equivalence class may hold 5
    // distinct length buckets yet still leak if its length DISTRIBUTION
    // diverges from the corpus. For an ordered sensitive attribute the
    // earth-mover distance is the L1 of cumulative gaps, computed here as
    // EXACT integers: Σ_i |cumP_i·N − cumQ_i·n_g| over the bucket grid,
    // normalized by n_g·N·(m−1). Grid = classes × buckets (both
    // histogram-sized); no per-row work after the one grouped scan.
    "q238_t_closeness" -> ((s, dir) => {
      import s.implicits._
      graft.operators.EvalMetrics.tCloseness(
          t(s, dir, "documents")
            .select($"lang", $"source", expr("n_chars div 200").as("b")),
          "lang", "source", "b")
        .orderBy($"lang", $"source")
    }),

    // Link prediction on the near-dup graph — the graph-science member
    // that PREDICTS edges instead of analyzing them (Liben-Nowell &
    // Kleinberg 2003): for every non-adjacent 2-hop pair, common-neighbor
    // count, exact Jaccard over neighborhoods, and Adamic–Adar with the
    // micro-nat log convention (each 1/ln(deg) term is an integral
    // division by the floor-quantized log). All work is edge-sized
    // equi-joins on the verified-pair graph; the wedge join's fan-out is
    // Σ deg², the same bound every triangle/assortativity query already
    // carries.
    "q239_dup_linkpred" -> ((s, dir) => {
      import s.implicits._
      val pairs = graft.operators.Dedup.nearDupPairs(
        t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2,
        threshold = 0.75)
      val edges = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
        .union(pairs.select($"id_b".as("src"), $"id_a".as("dst")))
        .localCheckpoint(false) // wedge join reads it three ways
      val deg = edges.groupBy($"src".as("id")).agg(count(lit(1)).as("deg"))
      val wedges = edges.as("e1").join(edges.as("e2"),
          $"e1.dst" === $"e2.src" && $"e1.src" < $"e2.dst")
        .select($"e1.src".as("u"), $"e2.dst".as("v"), $"e1.dst".as("w"))
      val cand = wedges
        .join(edges.select($"src".as("u"), $"dst".as("v")), Seq("u", "v"),
          "left_anti")
        .join(deg.select($"id".as("w"), $"deg".as("degw")), "w")
        .groupBy($"u", $"v")
        .agg(count(lit(1)).as("cn"),
          sum(when($"degw" >= 2L,
            expr("1000000000000 div cast(floor(ln(cast(degw as double)) * 1000000.0) as bigint)"))
            .otherwise(lit(0L))).as("aa6"))
      cand
        .join(deg.select($"id".as("u"), $"deg".as("du")), "u")
        .join(deg.select($"id".as("v"), $"deg".as("dv")), "v")
        .select($"u", $"v", $"cn",
          expr("cn * 10000 div (du + dv - cn)").as("jac4"), $"aa6")
        .filter($"cn" >= 2L)
        .orderBy($"u", $"v")
    }),

    // Seasonal-naive backtest — the forecasting baseline audit a volume
    // pipeline runs before believing any model: per event type, last-week
    // (lag-7) vs yesterday (lag-1) forecasts of daily volume, scored by
    // MAPE in exact basis points. Lags are DAY-KEYED JOINS, not row-offset
    // windows, so calendar gaps can never misalign a forecast. Everything
    // runs on the calendar × type grid.
    "q240_seasonal_backtest" -> ((s, dir) => {
      import s.implicits._
      graft.operators.EvalMetrics.seasonalBacktest(t(s, dir, "events"))
        .orderBy($"event_type")
    }),

    // Population-stability drift (PSI) of the event-type mix between the
    // first and second half of the observation window — the monitoring
    // twin of the KS drift audit (q198), on shares instead of value
    // distributions. Shares are exact parts-per-million; each PSI term is
    // (p_new − p_old)·ln(p_new/p_old) with the ln floor-quantized to
    // micro-nats THE MOMENT it is computed (the q69 rule), so the sum is
    // exact integer arithmetic. One grouped pass; the split day is a
    // broadcast scalar off the same aggregate. ZERO-SHARE GUARD: an event
    // type absent from one half (or below 1 ppm) would make a share 0 and
    // the ln ±Infinity — Spark (non-ANSI) would cast that to a silently
    // wrong Long extreme while the oracle's ::BIGINT cast errors. Both
    // engines therefore clamp each share to max(p6, 1) INSIDE the term
    // (the standard PSI epsilon substitution); the reported p_old6/p_new6
    // columns keep the true unclamped shares.
    "q241_drift_psi" -> ((s, dir) => {
      import s.implicits._
      val days = t(s, dir, "events")
        .select($"event_type", expr("(ts div 1000) div 86400000000").as("day"))
      val d0 = broadcast(days.agg(min($"day").as("d0")))
      val halves = days.crossJoin(d0)
        .select($"event_type",
          when($"day" < $"d0" + 15L, lit("old")).otherwise(lit("new"))
            .as("half"))
        .groupBy($"event_type", $"half").agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      val tot = broadcast(halves.groupBy($"half").agg(sum($"n").as("tn"))
        .groupBy().pivot("half", Seq("old", "new")).agg(first($"tn"))
        .select($"old".as("n_old_tot"), $"new".as("n_new_tot")))
      val wide = halves.groupBy($"event_type")
        .pivot("half", Seq("old", "new")).agg(first($"n"))
        .select($"event_type", coalesce($"old", lit(0L)).as("n_old"),
          coalesce($"new", lit(0L)).as("n_new"))
        .crossJoin(tot)
        .select($"event_type", $"n_old", $"n_new",
          expr("n_old * 1000000 div n_old_tot").as("p_old6"),
          expr("n_new * 1000000 div n_new_tot").as("p_new6"))
      wide.select($"event_type", $"n_old", $"n_new", $"p_old6", $"p_new6",
          expr("""(greatest(p_new6, 1L) - greatest(p_old6, 1L)) *
            cast(floor(ln(cast(greatest(p_new6, 1L) as double) / cast(greatest(p_old6, 1L) as double)) * 1000000.0) as bigint)
            div 1000000""").as("term6"))
        .orderBy($"event_type")
    }),

    // EWMA control chart over daily volume — the anomaly instrument next
    // to CUSUM (q196) and the robust z-score (q161): an 8-term
    // exponentially-weighted average (α = 1/4) with weights generated by
    // the EXACT integer recurrence w₀ = 250000, wₖ₊₁ = wₖ·3 div 4, so both
    // engines carry identical literals and no float power ever runs. Each
    // day CONTRIBUTES to its 8 future anchors (one 8× explode of the
    // calendar grid); anchors missing any of their 8 terms are dropped by
    // exact count, so calendar gaps can never silently shorten the
    // window. Deviation is exact bps of the EWMA.
    "q242_ewma_control" -> ((s, dir) => {
      import s.implicits._
      val wts = Array(250000L, 187500L, 140625L, 105468L, 79101L, 59325L,
        44493L, 33369L) // w0 = 250000; w = w*3 div 4; sum = 899881
      val daily = t(s, dir, "events")
        .groupBy($"event_type",
          expr("(ts div 1000) div 86400000000").as("day"))
        .agg(count(lit(1)).as("y")).localCheckpoint(false)
      val contrib = daily
        .select($"event_type", $"day", $"y",
          posexplode(lit(wts)).as(Seq("k", "w")))
        .select($"event_type".as("c_type"), ($"day" + $"k").as("aday"),
          ($"w" * $"y").as("c"))
        .groupBy($"c_type", $"aday")
        .agg(count(lit(1)).as("nterms"), sum($"c").as("ewma_u"))
        .filter($"nterms" === 8L)
      daily.join(contrib,
          $"day" === $"aday" && $"event_type" === $"c_type")
        .select($"event_type", $"day", $"y",
          expr("ewma_u div 899881").as("ewma"),
          expr("abs(y * 899881 - ewma_u) * 10000 div ewma_u").as("dev_bps"))
        .select($"event_type", $"day", $"y", $"ewma", $"dev_bps",
          ($"dev_bps" > 2500L).cast("long").as("alarm"))
        .orderBy($"event_type", $"day")
    }),

    // MPEG (mp3) frame-header metadata — REAL pure-JVM header parsing
    // ([[graft.operators.Multimodal.MpegFrameParser]]: sync-walk, version/
    // layer/bitrate/samplerate tables, padding, channel mode) closing the
    // mp3-metadata gap the decode stub used to blanket: duration/bitrate/
    // samplerate/channels need only public header tables, no codec — full
    // payload decode stays honestly stubbed. Fixture frames are
    // constructible without an encoder (CBR headers + zero payloads of
    // the exact computed frame length), closed-form in doc_id, so the
    // oracle replays every field without parsing a byte. Bytes never
    // leave their scan task; only the 7-field meta shuffles.
    "q243_mpeg_metadata" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id")
        .repartition(32, $"doc_id") // spread the per-row framing (q90 lesson)
      val mp3s = graft.operators.Multimodal.synthMpegCorpus(docs, "doc_id")
      graft.operators.Multimodal.mpegMeta(mp3s, "mp3")
        .select($"doc_id", $"mpeg_meta.is_mpeg".cast("int").as("is_mpeg"),
          $"mpeg_meta.n_frames".cast("long").as("n_frames"),
          $"mpeg_meta.sample_rate".cast("long").as("sample_rate"),
          $"mpeg_meta.channels".cast("long").as("channels"),
          $"mpeg_meta.avg_bitrate_kbps".cast("long").as("kbps"),
          $"mpeg_meta.duration_us",
          $"mpeg_meta.n_junk_bytes".cast("long").as("n_junk_bytes"))
        .orderBy($"doc_id")
    }),

    // ANN-SERVED retrieval scorecard — the disclosure the index-served ask
    // path ([[graft.query.Retriever.askViaIndex]], q210's serve plumbing)
    // ships with: per query, the persisted-index top-10 joined against the
    // brute-force exact top-10 on the SAME queries, with the agreement
    // count and recall in exact basis points. Production reads this before
    // routing the ask path through the index: recall < 10000 bps is the
    // price of the partition-pruned serve (the q101 recall convention,
    // applied to the PERSISTED index). The serve side never scans the
    // embedding corpus (plan-pinned in AnnIndexSpec); the exact side is
    // the eval-only truth scan.
    "q244_ann_recall_serve" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft_annrecall").toString
      graft.index.AnnIndex.build(emb, idxDir)
      val queries = emb.filter($"vec_id" < 16)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val served = graft.index.AnnIndex
        .query(s, idxDir, queries, k = 10, nprobe = 4, excludeSelf = true)
        .select($"query_id", $"vec_id")
      val truth = graft.operators.SimilaritySearch
        .bruteForceTopK(emb,
          queries.select($"query_id", $"qv".as("embedding")), 10)
        .select($"query_id", $"neighbor_id".as("vec_id"), lit(1L).as("hit"))
      served.join(truth, Seq("query_id", "vec_id"), "left")
        .groupBy($"query_id")
        .agg(count(lit(1)).as("n_served"),
          sum(coalesce($"hit", lit(0L))).as("n_agree"))
        .select($"query_id", $"n_served", $"n_agree",
          expr("n_agree * 10000 div 10").as("recall_bps"))
        .orderBy($"query_id")
    }),

    // Kaplan–Meier survival curve (Kaplan & Meier 1958) for time-to-first-
    // purchase — the time-to-event family's first member, next to the
    // conversion-lag census (q163): per user, duration = days from first
    // event to first purchase (observed) or to the corpus horizon
    // (right-censored); the survival curve is the KM product-limit over
    // the DURATION GRID. Everything after the one per-user aggregate is
    // histogram-sized: at-risk counts are a reverse running sum over the
    // grid, each factor ln(1 − d/n) is floor-quantized to micro-nats the
    // moment it is computed (the q69 rule — the running SUM of integer
    // micro-nats replaces the floating product), and the survival point
    // s4 re-exponentiates the integer log-sum with one identically-
    // ordered double op per row. A grid point where everyone at risk
    // converts (d = n) sends survival exactly to 0 from there on — the
    // dead flag propagates by prefix-max, no ln(0) ever runs.
    "q245_kaplan_meier" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_type",
          expr("(ts div 1000) div 86400000000").as("day"))
      val horizon = broadcast(ev.agg(max($"day").as("hday")))
      val peru = ev.groupBy($"user_id")
        .agg(min($"day").as("t0"),
          min(when($"event_type" === "purchase", $"day")).as("tp"))
        .crossJoin(horizon)
        .select(
          when($"tp".isNotNull, $"tp" - $"t0")
            .otherwise($"hday" - $"t0").as("t"),
          $"tp".isNotNull.cast("long").as("obs"))
      val hist = peru.groupBy($"t")
        .agg(sum($"obs").as("d"), sum(lit(1L) - $"obs").as("c"))
      val wAt = org.apache.spark.sql.expressions.Window.orderBy($"t")
        .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val wCum = org.apache.spark.sql.expressions.Window.orderBy($"t")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      hist
        .withColumn("n_risk", sum($"d" + $"c").over(wAt))
        .withColumn("term_u",
          when($"d" > 0 && $"d" < $"n_risk",
            floor(log(($"n_risk" - $"d").cast("double") / $"n_risk".cast("double"))
              * 1000000.0).cast("long")).otherwise(lit(0L)))
        .withColumn("dead", ($"d" === $"n_risk").cast("long"))
        .withColumn("cum_u", sum($"term_u").over(wCum))
        .withColumn("any_dead", max($"dead").over(wCum))
        .select($"t".as("t_days"), $"n_risk", $"d".as("n_events"),
          $"c".as("n_censored"),
          when($"any_dead" === 1, lit(0.0))
            .otherwise(floor(exp($"cum_u".cast("double") / lit(1000000.0))
              * 10000.0) / 10000.0).as("s4"))
        .orderBy($"t_days")
    }),

    // Pearson χ² independence test of event type × weekday — the
    // contingency-table member of the stats wing (the categorical
    // counterpart of the KS drift audit q198): one grouped scan builds
    // the type×weekday cell counts; margins and the grand total derive
    // from the cell relation; each cell's (n·N − n_t·n_w)²/(n_t·n_w·N)
    // contribution is EXACT — the square is decimal(38,0)/HUGEINT (the
    // q189 widening policy: cell·N is corpus², its square is corpus⁴)
    // and quantized to 1e-4 by integer division, so the χ² statistic is
    // the exact sum of per-cell floors on both engines. The statistic
    // row carries dof = (T−1)(W−1) and the 0.001-level critical value
    // for the 5×7 grid as literals — the decision is part of the output.
    "q246_chi2_independence" -> ((s, dir) => {
      import s.implicits._
      val cells = t(s, dir, "events")
        .groupBy($"event_type",
          expr("((ts div 1000) div 86400000000) % 7").as("weekday"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(false) // margins + total + cells all read it
      val mt = cells.groupBy($"event_type").agg(sum($"n").as("n_t"))
      val mw = cells.groupBy($"weekday").agg(sum($"n").as("n_w"))
      val tot = broadcast(cells.agg(sum($"n").as("big_n")))
      val scored = cells
        .join(broadcast(mt), Seq("event_type"))
        .join(broadcast(mw), Seq("weekday"))
        .crossJoin(tot)
        .select($"event_type", $"weekday", $"n",
          expr("n_t * n_w * 1000 div big_n").as("exp_milli"),
          expr("""cast((cast(n as decimal(38,0)) * big_n - cast(n_t as decimal(38,0)) * n_w)
            * (cast(n as decimal(38,0)) * big_n - cast(n_t as decimal(38,0)) * n_w)
            * 10000 div (cast(n_t as decimal(38,0)) * n_w * big_n) as bigint)""")
            .as("cell4"))
        .localCheckpoint(false) // cell rows + the statistic both read it
      val stat = broadcast(scored.agg(sum($"cell4").as("chi2_4")))
      scored.crossJoin(stat)
        .select($"event_type", $"weekday", $"n", $"exp_milli", $"cell4",
          $"chi2_4", lit(24L).as("dof"),
          // χ²(24) upper 0.001 critical value, 1e-4-quantized literal
          ($"chi2_4" > 512792L).cast("long").as("reject_indep"))
        .orderBy($"event_type", $"weekday")
    }),

    // Fano-factor burstiness of daily event volume — the dispersion
    // instrument next to the EWMA control chart (q242) and CUSUM (q196):
    // a Poisson-like arrival process has variance ≈ mean (Fano ≈ 1);
    // Fano ≫ 1 is burst/campaign traffic, Fano ≪ 1 is rate-limited or
    // templated load. Exact integers end-to-end: with N days, S = Σy,
    // Q = Σy², the sample-variance-over-mean ratio is
    // (N·Q − S²)·10⁴ div (S·(N−1)) — Q and the products widen to
    // decimal(38,0) (q189 policy: y² at 100 TB daily volumes passes
    // BIGINT), single-day types disclose NULL instead of a 0/0.
    "q247_fano_burstiness" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type",
          expr("(ts div 1000) div 86400000000").as("day"))
        .agg(count(lit(1)).as("y"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"), sum($"y").as("sy"),
          sum(($"y" * $"y").cast("decimal(38,0)")).as("sq"))
        .select($"event_type", $"n_days",
          expr("sy * 1000 div n_days").as("mean_milli"),
          expr("""case when n_days < 2 then cast(null as bigint)
            else cast((cast(n_days as decimal(38,0)) * sq - cast(sy as decimal(38,0)) * sy) * 10000
              div (cast(sy as decimal(38,0)) * (n_days - 1)) as bigint) end""")
            .as("fano4"))
        .select($"event_type", $"n_days", $"mean_milli", $"fano4",
          when($"fano4".isNull, lit("undefined"))
            .when($"fano4" > 15000L, lit("overdispersed"))
            .when($"fano4" < 6667L, lit("underdispersed"))
            .otherwise(lit("poisson_like")).as("regime"))
        .orderBy($"event_type")
    }),

    // Session path census — the sequence-mining extension of q155's
    // bigram transitions to 3-step PATHS: per user, consecutive event-
    // type trigrams in (tu, event_id) order (one keyed window, two
    // leads), rolled into the global path frequency table with each
    // path's share in exact bps. The path vocabulary is at most T³ = 125
    // rows, so everything after the one keyed-window scan is constant-
    // sized; at 100 TB the window shuffles by user exactly like q155 and
    // the census stays tiny.
    "q248_session_paths" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"tu", $"event_id")
      val tri = t(s, dir, "events")
        .select($"user_id", $"event_id", expr("ts div 1000").as("tu"),
          $"event_type".as("e1"))
        .withColumn("e2", lead($"e1", 1).over(w))
        .withColumn("e3", lead($"e1", 2).over(w))
        .filter($"e3".isNotNull)
        .groupBy($"e1", $"e2", $"e3").agg(count(lit(1)).as("n_paths"))
        .localCheckpoint(false) // census + total share both read it
      val tot = broadcast(tri.agg(sum($"n_paths").as("n_tot")))
      tri.crossJoin(tot)
        .select(concat_ws(">", $"e1", $"e2", $"e3").as("path"), $"n_paths",
          expr("n_paths * 10000 div n_tot").as("share_bps"))
        .orderBy($"path")
    }),

    // Stationary distribution of the user-journey Markov chain — the
    // steady-state answer q155's one-step matrix only implies: row-
    // stochastic transition probabilities in exact ppm (c_ij·10⁶ div c_i),
    // then 16 power-iteration steps π·P carried ENTIRELY in integer ppm
    // (each step: Σ_i π_i·p_ij div 10⁶ — T-row × T²-cell joins, all
    // broadcast-sized for a 5-type vocabulary). Both engines run the
    // IDENTICAL literal iteration count from the identical uniform start,
    // so every intermediate vector is bit-equal; the output discloses the
    // L1 residual of the last step in ppm as the convergence evidence.
    "q249_markov_stationary" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"tu", $"event_id")
      val pairs = t(s, dir, "events")
        .select($"user_id", $"event_id", expr("ts div 1000").as("tu"),
          $"event_type".as("cur"))
        .withColumn("nxt", lead($"cur", 1).over(w))
        .filter($"nxt".isNotNull)
        .groupBy($"cur", $"nxt").agg(count(lit(1)).as("c"))
      val rows = pairs.groupBy($"cur").agg(sum($"c").as("c_cur"))
      val p = pairs.join(broadcast(rows), Seq("cur"))
        .select($"cur", $"nxt", expr("c * 1000000 div c_cur").as("p6"))
        .localCheckpoint(false) // re-joined every iteration
      val states = p.select($"cur".as("st")).distinct()
        .localCheckpoint(false)
      val nStates = broadcast(states.agg(count(lit(1)).as("t")))
      var pi = states.crossJoin(nStates)
        .select($"st", expr("1000000 div t").as("pi6"))
        .localCheckpoint(false)
      var prev = pi
      for (_ <- 1 to 16) {
        prev = pi
        pi = pi.join(p, pi("st") === p("cur"))
          .groupBy($"nxt")
          .agg(sum(expr("pi6 * p6 div 1000000")).as("npi6"))
          .select($"nxt".as("st"), $"npi6".as("pi6"))
          .localCheckpoint(false)
      }
      pi.join(prev.select($"st", $"pi6".as("prev6")), Seq("st"))
        .select($"st".as("event_type"), $"pi6",
          abs($"pi6" - $"prev6").as("resid6"))
        .orderBy($"event_type")
    }),

    // Dedup threshold-sweep tuning curve — the knob-selection evidence a
    // deployment reads before committing q39's threshold: ONE candidate
    // generation + verification pass (est_jac is k/8, binary-exact), then
    // every τ on the /8-aligned grid filters the SAME pair relation —
    // pairs and docs-touched per τ, never a re-run of LSH per knob. The
    // grid literals are exact binary fractions on both engines.
    "q250_threshold_sweep" -> ((s, dir) => {
      import s.implicits._
      val pairs = graft.operators.Dedup.nearDupPairs(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2,
          threshold = 0.5)
        .localCheckpoint(false) // five τ cuts read one verified relation
      val taus = broadcast(Seq(0.5, 0.625, 0.75, 0.875, 1.0).toDF("tau"))
      val cut = pairs.crossJoin(taus).filter($"est_jac" >= $"tau")
        .localCheckpoint(false) // pair counts + endpoint distinct
      val np = cut.groupBy($"tau").agg(count(lit(1)).as("n_pairs"))
      val nd = cut
        .select($"tau", explode(array($"id_a", $"id_b")).as("id"))
        .groupBy($"tau").agg(countDistinct($"id").as("n_docs"))
      np.join(nd, Seq("tau"))
        .select(($"tau" * 10000.0).cast("long").as("tau4"),
          $"n_pairs", $"n_docs")
        .orderBy($"tau4")
    }),

    // b-bit minhash audit (Li & König, CACM 2011) — how much similarity
    // signal survives keeping ONE bit per hash: for every LSH candidate
    // pair, the full 8-hash agreement (est = k/8) sits next to the 1-bit
    // estimator 2·(agree₁/8) − 1, bucketed by the full agreement count.
    // The point a deployment reads: at 8 hashes the 1-bit estimator is
    // unusably noisy for mid similarities (spread disclosed as min/max
    // bps) yet 64× smaller — the storage/precision trade quantified.
    // Signatures shuffle once; everything else is 9-row buckets.
    "q251_bbit_minhash" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val sigs = graft.operators.Dedup
        .minhashSig(docs, "text", numHashes = 8, shingle = 4)
        .select($"doc_id", $"minhash")
        .localCheckpoint(false) // joined to both pair sides
      val cand = graft.operators.Dedup.nearDupPairs(
          docs, "doc_id", "text",
          numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2,
          threshold = 0.0)
        .select($"id_a", $"id_b")
      cand
        .join(sigs.select($"doc_id".as("id_a"), $"minhash".as("mha")), "id_a")
        .join(sigs.select($"doc_id".as("id_b"), $"minhash".as("mhb")), "id_b")
        .select(
          expr("cast(size(filter(zip_with(mha, mhb, (x, y) -> x = y), b -> b)) as bigint)")
            .as("agree8"),
          expr("cast(size(filter(zip_with(mha, mhb, (x, y) -> x % 2 = y % 2), b -> b)) as bigint)")
            .as("agree1"))
        .select($"agree8", ((lit(2L) * $"agree1" - 8L) * 1250L).as("est1_bps"))
        .groupBy($"agree8")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(est1_bps) div count(1)").as("avg_est1_bps"),
          min($"est1_bps").as("min_est1_bps"),
          max($"est1_bps").as("max_est1_bps"))
        .orderBy($"agree8")
    }),

    // Incremental join-view maintenance — the Δ-join identity q176's
    // incremental AGGREGATE lacks a join for: the per-nation revenue view
    // (q02's shape) maintained as base ⊕ delta, where tonight's orders
    // delta (o_orderkey ≡ 0 mod 10) joins ONLY its own rows against the
    // dimensions (delta ⋈ customer ⋈ nation — never a base rescan) and
    // merges into the stored base view by key. Output = the full view
    // plus the per-nation delta-row disclosure, bit-equal to a full
    // recompute because count/sum are Abelian — the property that makes
    // the nightly cost |Δ|, not |base|, at 100 TB.
    "q252_incremental_join_view" -> ((s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      def view(orders: org.apache.spark.sql.DataFrame) = orders
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n"), sum($"o_totalprice").as("tp"))
      val orders = t(s, dir, "orders")
      val baseView = view(orders.filter(pmod($"o_orderkey", lit(10L)) =!= 0))
      val deltaView = view(orders.filter(pmod($"o_orderkey", lit(10L)) === 0))
        .select($"n_name", $"n".as("dn"), $"tp".as("dtp"))
      baseView.join(deltaView, Seq("n_name"), "full_outer")
        .select($"n_name",
          (coalesce($"n", lit(0L)) + coalesce($"dn", lit(0L))).as("n_orders"),
          round(coalesce($"tp", lit(0.0)) + coalesce($"dtp", lit(0.0)), 2)
            .as("total_price"),
          coalesce($"dn", lit(0L)).as("n_from_delta"))
        .orderBy($"n_name")
    }),

    // MP4/ISO-BMFF container metadata — REAL pure-JVM box walk
    // ([[graft.operators.ContainerMeta.Mp4BoxParser]]: size+fourcc tree,
    // mvhd timescale/duration, per-trak tkhd 16.16 dims + hdlr kind +
    // stsd codec fourcc), shrinking the VIDEO half of the decode stub the
    // same way q243 shrank mp3: duration/tracks/dimensions/codec need
    // only the public 14496-12 layout, no codec — sample decode stays
    // honestly stubbed. The fixture tree is constructible without a muxer
    // and closed-form in doc_id, so the oracle replays every field
    // arithmetically. Bytes never leave their scan task.
    "q253_mp4_metadata" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id")
        .repartition(32, $"doc_id") // spread the per-row box build/walk
      val mp4s = graft.operators.ContainerMeta.synthMp4Corpus(docs, "doc_id")
      graft.operators.ContainerMeta.mp4Meta(mp4s, "mp4")
        .select($"doc_id", $"mp4_meta.is_mp4".cast("int").as("is_mp4"),
          $"mp4_meta.brand", $"mp4_meta.duration_ms",
          $"mp4_meta.n_tracks".cast("long").as("n_tracks"),
          $"mp4_meta.n_video".cast("long").as("n_video"),
          $"mp4_meta.n_audio".cast("long").as("n_audio"),
          $"mp4_meta.width".cast("long").as("width"),
          $"mp4_meta.height".cast("long").as("height"),
          $"mp4_meta.video_codec")
        .orderBy($"doc_id")
    }),

    // AAC ADTS frame-header metadata — the aac sibling of q243's mp3 walk
    // ([[graft.operators.ContainerMeta.AdtsParser]]: 0xFFF sync, public
    // 13-entry rate table, 13-bit frame length, 1024 samples/frame).
    // Same closed-form fixture contract; same honest payload stub.
    "q254_adts_metadata" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id")
        .repartition(32, $"doc_id")
      val aacs = graft.operators.ContainerMeta.synthAdtsCorpus(docs, "doc_id")
      graft.operators.ContainerMeta.adtsMeta(aacs, "aac")
        .select($"doc_id", $"adts_meta.is_adts".cast("int").as("is_adts"),
          $"adts_meta.n_frames".cast("long").as("n_frames"),
          $"adts_meta.sample_rate".cast("long").as("sample_rate"),
          $"adts_meta.channels".cast("long").as("channels"),
          $"adts_meta.profile".cast("long").as("profile"),
          $"adts_meta.duration_us",
          $"adts_meta.n_junk_bytes".cast("long").as("n_junk_bytes"))
        .orderBy($"doc_id")
    }),

    // BPE tokenizer TRAINING, oracle-checked end-to-end — upgrades the
    // iterative trainer from spec-verified (q86 oracles only round 0's
    // pair table) to hash-checked: 6 full merge rounds, each an argmax
    // over the vocabulary pair table then a greedy leftmost fold. The one
    // corpus-sized pass is the word count; every round after runs on the
    // Heaps-sublinear vocab, so a 100 TB corpus pays one scan + one
    // shuffle and the loop never re-reads it. The oracle replays all six
    // rounds as hand-chained CTEs (SQL cannot loop) with each symbol
    // wrapped chr(2)‖sym‖chr(3), making greedy leftmost merge a single
    // non-overlapping string replace — bit-identical semantics.
    "q255_bpe_train" -> ((s, dir) => {
      import s.implicits._
      val wf = graft.operators.BpeTokenizer.wordFrequencies(
        t(s, dir, "documents"), graft.operators.TextAnalysis.tokensCol($"text"))
      val merges = graft.operators.BpeTokenizer.train(wf, 6)
      merges.zipWithIndex
        .map { case (m, i) => ((i + 1).toLong, m.l, m.r, m.cnt) }
        .toDF("rank", "l", "r", "cnt")
        .orderBy($"rank")
    }),

    // Tokenizer fertility after those 6 merges — the evidence a pipeline
    // reads to size its vocab budget: tokens-per-word-type histogram with
    // type and occurrence mass. Encoding runs over the VOCAB (encodeCol's
    // per-word fold; merge list ships in the plan), never the corpus.
    "q256_bpe_fertility" -> ((s, dir) => {
      import s.implicits._
      val wf = graft.operators.BpeTokenizer.wordFrequencies(
          t(s, dir, "documents"), graft.operators.TextAnalysis.tokensCol($"text"))
        .localCheckpoint(false) // train's 6 argmax rounds + the encode read it
      val merges = graft.operators.BpeTokenizer.train(wf, 6)
      wf.select(
          size(element_at(
            graft.operators.BpeTokenizer.encodeCol(array($"w"), merges), 1))
            .cast("long").as("n_syms"),
          $"c")
        .groupBy($"n_syms")
        .agg(count(lit(1)).as("n_types"), sum($"c").as("n_occurrences"))
        .orderBy($"n_syms")
    }),

    // FLAC STREAMINFO metadata — the lossless-audio sibling of q254's
    // ADTS walk ([[graft.operators.ContainerMeta.FlacParser]]: fLaC
    // magic, metadata-block walk, 20/3/5/36-bit STREAMINFO unpack).
    // Duration needs only total_samples/rate — no frame is decoded, same
    // honest payload stub. Closed-form fixture contract as q253/q254.
    "q259_flac_metadata" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id")
        .repartition(32, $"doc_id")
      val flacs = graft.operators.ContainerMeta.synthFlacCorpus(docs, "doc_id")
      graft.operators.ContainerMeta.flacMeta(flacs, "flac")
        .select($"doc_id", $"flac_meta.is_flac".cast("int").as("is_flac"),
          $"flac_meta.sample_rate".cast("long").as("sample_rate"),
          $"flac_meta.channels".cast("long").as("channels"),
          $"flac_meta.bits_per_sample".cast("long").as("bits_per_sample"),
          $"flac_meta.total_samples", $"flac_meta.duration_us",
          $"flac_meta.n_blocks".cast("long").as("n_blocks"))
        .orderBy($"doc_id")
    }),

    // Deterministic label-propagation communities on the dup graph —
    // components (q164) answer "what is connected", this answers "what is
    // DENSELY connected": 3 synchronous most-frequent-neighbor-label
    // rounds (ties to the smallest label, making the randomized classic
    // replayable), read as a community-size census. A thin bridge between
    // two template farms keeps them one q164 component but two labels
    // here — the distinction cluster resolution needs before collapsing.
    // Per round: one edge-sized join + a node-keyed argmax window (never
    // a global sort); rounds are lineage-truncated like kCore's peels.
    "q257_label_communities" -> ((s, dir) => {
      import s.implicits._
      val pairs = graft.operators.Dedup.nearDupPairs(
        t(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, shingle = 4, bands = 4, rowsPerBand = 2,
        threshold = 0.75)
      graft.operators.GraphMetrics.labelPropagation(pairs, "id_a", "id_b", 3)
        .groupBy($"label").agg(count(lit(1)).as("sz"))
        .groupBy($"sz").agg(count(lit(1)).as("n_communities"),
          sum($"sz").as("n_nodes"))
        .select($"sz".as("community_size"), $"n_communities", $"n_nodes")
        .orderBy($"community_size")
    }),

    // Mann–Kendall trend test per event type — the non-parametric sibling
    // of Theil–Sen (q229): exact integer S over day pairs, exact integer
    // tie-corrected 18·Var(S), continuity-corrected z floor-quantized to
    // bps (sqrt is IEEE exactly-rounded in both engines). The O(n²) runs
    // on the CALENDAR grid (≤365 rows/type/year at any corpus size); the
    // only corpus-sized pass is the daily groupBy.
    "q258_mann_kendall" -> ((s, dir) => {
      import s.implicits._
      graft.operators.EvalMetrics.mannKendall(t(s, dir, "events"))
        .orderBy($"event_type")
    }),

    // SQL front door: temp views + spark.sql with the REGISTERED cosine_sim
    // Catalyst function — the full declarative surface, same plan as the
    // DataFrame form (filter pushdown + TakeOrderedAndProject).
    "q50_sql_interface" -> ((s, dir) => {
      graft.functions.VectorFunctions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("v_embeddings")
      s.sql(
        """SELECT e.vec_id,
          |       floor(cosine_sim(e.embedding,
          |         (SELECT first(embedding) FROM v_embeddings WHERE vec_id = 7)) * 1e4) / 1e4 AS score
          |FROM v_embeddings e
          |WHERE e.label IN (5, 6, 7)
          |ORDER BY score DESC, vec_id
          |LIMIT 8""".stripMargin)
    })
  )

  /** Drop staging relations a query pinned for its own execution (q56's
    * eagerly-cached `v_sql_bands`). The cache must outlive the RETURNED
    * lazy DataFrame until the caller materializes it — uncaching inside the
    * query builder would silently recompute the corpus scan per join side —
    * so harnesses (Bench, Verify) call this after each query's write
    * instead; otherwise the band relation rides executor memory into every
    * subsequent query of the pass. */
  def releaseStaging(s: SparkSession): Unit = {
    s.sql("UNCACHE TABLE IF EXISTS v_sql_bands")
    s.sql("DROP TABLE IF EXISTS sql_bands_stage")
  }

  /** q176's body against any events relation — factored so [[ScaleProbe]]
    * measures exactly the shipped IVM refresh on a 10× event stream
    * (closed forms: counts and micro-sums scale by the copy factor while
    * the registers — a function of the distinct-user SET — are unchanged).
    * History is everything before `tcutNs` (default 2024-01-25 UTC), the
    * delta everything after; the refresh merges the two aggregates and
    * never rescans the union.
    */
  def incrementalDailyAgg(
      ev: DataFrame, tcutNs: Long = 1706140800000000000L): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val p = 6
    val hll = udaf(new graft.operators.HllAgg(p),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Int)]())
    def aggOf(df: DataFrame): DataFrame = df
      .select($"event_type", expr("ts div 86400000000000").as("day"),
        expr("cast(floor(value * 1000000) as bigint)").as("vu"),
        graft.functions.HashFunctions.stableHash64(
          concat(lit("ivm:"), $"user_id".cast("string"))).as("h"))
      .withColumn("bkt", graft.operators.HllSketch.bucketCol($"h", p))
      .withColumn("rnk", graft.operators.HllSketch.rankExpr("h", p))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n"), sum($"vu").as("sum_value_u"),
        hll($"bkt", $"rnk").as("regs"))
    val merged = aggOf(ev.filter($"ts" < lit(tcutNs)))
      .unionByName(aggOf(ev.filter($"ts" >= lit(tcutNs))))
      .localCheckpoint(false) // scalar re-sum + register max both read it
    val scalars = merged.groupBy($"event_type", $"day")
      .agg(sum($"n").as("n"), sum($"sum_value_u").as("sum_value_u"))
    val regs = graft.operators.HllSketch.rollupRegisters(
      merged.select($"event_type", $"day", $"regs"),
      Seq("event_type", "day"), "regs")
    scalars.join(regs, Seq("event_type", "day"))
      .select($"event_type", $"day", $"n", $"sum_value_u",
        fq4(graft.operators.HllSketch.estimateExpr("regs", p)).as("users_est4"))
      .orderBy($"event_type", $"day")
  }

  /** q192's body against any events relation — factored so [[ScaleProbe]]
    * measures exactly the shipped sweep-line on a 10× user population
    * (closed form under exact copies with disjoint user ids: every
    * endpoint multiset scales by the copy factor, so per-bucket peaks and
    * start/end counts all scale by exactly c).
    */
  /** q209/q213's shared pipeline: synthesize the deterministic PNG corpus
    * (REAL ImageIO encode), decode + perceptual-hash it
    * ([[graft.operators.Multimodal.perceptualHashes]]), band-bucket
    * candidates (the SimHash shape), and return exact hamming distances
    * per candidate pair — callers apply their own threshold.
    */
  def imagePhashPairs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the q90 lesson: per-row codec work (PNG encode+decode) is
    // compute-bound, and a small parquet arrives as ONE partition AQE
    // never splits — spread it BEFORE the mapPartitions (explicit-N
    // overload: plain repartition(col) is AQE-coalescible)
    val imgs = graft.operators.Multimodal
      .synthImageCorpus(docs.repartition(32, $"doc_id"), "doc_id", groupDiv = 4L)
    val hashed = graft.operators.Multimodal.perceptualHashes(imgs, "img")
      .select($"doc_id", $"a0", $"a1", $"a2", $"a3",
        $"d0", $"d1", $"d2", $"d3")
      .localCheckpoint(false) // banding + both verify sides read it
    val bands = hashed.select($"doc_id",
      posexplode(array($"a0", $"a1", $"a2", $"a3")).as(Seq("b", "v")))
    val cand = bands.as("x").join(bands.as("y"),
        $"x.b" === $"y.b" && $"x.v" === $"y.v" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("id_a"), $"y.doc_id".as("id_b")).distinct()
    val ha = hashed.toDF("id_a", "xa0", "xa1", "xa2", "xa3",
      "xd0", "xd1", "xd2", "xd3")
    val hb = hashed.toDF("id_b", "ya0", "ya1", "ya2", "ya3",
      "yd0", "yd1", "yd2", "yd3")
    cand.join(ha, "id_a").join(hb, "id_b")
      .select($"id_a", $"id_b",
        expr("bit_count(xa0 ^ ya0) + bit_count(xa1 ^ ya1)" +
          " + bit_count(xa2 ^ ya2) + bit_count(xa3 ^ ya3)")
          .cast("long").as("ham_a"),
        expr("bit_count(xd0 ^ yd0) + bit_count(xd1 ^ yd1)" +
          " + bit_count(xd2 ^ yd2) + bit_count(xd3 ^ yd3)")
          .cast("long").as("ham_d"))
  }

  def peakConcurrency(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val sess = graft.operators.Sessionize.assignSessions(
        ev.select($"user_id", $"ts", $"event_id"),
        "user_id", "ts", "event_id", gap = 21600000000000L)
      .groupBy($"user_id", $"session_seq")
      .agg(min($"ts").as("st"), max($"ts").as("en"))
    graft.operators.SweepLine.peakPerBucket(sess, "st", "en",
        bucketWidth = 86400000000000L)
      .orderBy($"bucket")
  }

  /** q193's body against any documents relation — factored so [[ScaleProbe]]
    * runs exactly the shipped strip on a 10× corpus (closed form under
    * exact copies with fresh doc ids: df and n_docs_src both scale by c so
    * the template SET is invariant — requiring every source to hold ≥ 101
    * docs so the 1% ratio, not the minDocs floor, is binding at both
    * scales — while affected docs, instances, and tokens scale by c).
    */
  def boilerplateStrip(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val pars = docs
      .select($"doc_id", $"source",
        graft.operators.TextAnalysis.tokensCol($"text").as("tk"))
      .filter(size($"tk") > 0)
      .select($"doc_id", $"source", explode(transform(
        sequence(lit(0), ((size($"tk") + 2) / 3).cast("int") - 1),
        i => array_join(slice($"tk", i * 3 + 1, lit(3)), " "))).as("p"))
      .withColumn("n_tok", size(split($"p", " ")).cast("long"))
    graft.operators.Boilerplate.stripSummary(pars, "doc_id", "source",
        "p", "n_tok", minFrac = 0.01, minDocs = 2L)
      .orderBy($"source")
  }

  /** q198's body against any documents relation — factored so the spec
    * can check the grid decomposition against a brute-force KS reference
    * on engineered corpora. See the q198 entry for the scale argument.
    */
  def ksDrift(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val cnt = docs
      .select($"source", $"n_chars".as("v"))
      .groupBy($"source", $"v").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // sizes, value cums, and the grid read it
    val ns = cnt.groupBy($"source").agg(sum($"c").as("n1"))
    val tot = broadcast(cnt.agg(sum($"c").as("n")))
    val gcum = cnt.groupBy($"v").agg(sum($"c").as("cv"))
      .withColumn("call", sum($"cv").over(Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val grid = ns.crossJoin(cnt.select($"v").distinct())
    grid.join(cnt, Seq("source", "v"), "left").na.fill(0L, Seq("c"))
      .withColumn("c1", sum($"c").over(Window.partitionBy($"source")
        .orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(gcum.select($"v", $"call"), Seq("v"))
      .crossJoin(tot)
      .withColumn("num",
        abs($"c1" * ($"n" - $"n1") - ($"call" - $"c1") * $"n1"))
      .groupBy($"source", $"n1", $"n")
      .agg(max($"num").as("maxnum"))
      .select($"source", $"n1".as("n_docs"),
        expr("(maxnum * 10000) div (n1 * (n - n1))").as("d4"),
        (expr("(maxnum * 10000) div (n1 * (n - n1))") >
          floor(lit(1.358) * sqrt($"n".cast("double")
            / ($"n1".cast("double") * ($"n" - $"n1").cast("double")))
            * 10000.0).cast("long")).cast("int").as("flagged"))
      .orderBy($"source")
  }

  /** q143's body against any embeddings relation — factored out so
    * [[ScaleProbe]] measures exactly the shipped shape on a 10× corpus.
    * Cell-restricted mutual-kNN + label purity: the cell count is
    * data-driven (k = 0 → [[graft.operators.IvfIndex.autoK]], one count
    * action), so cell interiors stay ~[[graft.operators.IvfIndex.DefaultTargetCellSize]]
    * vectors and the within-cell pair space is O(n · cellSize) — linear in
    * the corpus — at any scale.
    */
  def knnClusterPurity(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val cents = graft.operators.IvfIndex.centroids(emb, k = 0, iters = 0)
    val cells = graft.operators.IvfIndex.assign(emb, cents, "vec_id", "embedding")
      .localCheckpoint(false) // assignment scan feeds both pair-join sides
    // Salt the pair join: centroid_id alone has only k distinct values,
    // so the scoring stage would run k tasks no matter the cluster size.
    // Splitting the probe side by hash(src) and replicating the build
    // side per salt yields the SAME pair set over k×8 evenly-sized
    // tasks (the build side is cell-local, so replication is cheap).
    val a = cells.select($"centroid_id", $"vec_id".as("src"), $"embedding".as("va"))
      .withColumn("__slt", pmod(xxhash64($"src"), lit(8)))
    val b = cells.select($"centroid_id", $"vec_id".as("dst"), $"embedding".as("vb"))
      .crossJoin(s.range(8).toDF("__slt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"src").orderBy($"cos4".desc, $"dst")
    val top = a.join(b, Seq("centroid_id", "__slt")).filter($"src" =!= $"dst")
      .select($"src", $"dst",
        floor(graft.functions.VectorFunctions.cosineSim($"va", $"vb")
          * lit(10000.0)).cast("long").as("cos4"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"src", $"dst")
      .localCheckpoint(false) // k-sized lists; mutuality joins it to itself
    val mutual = top
      .join(top.select($"dst".as("src"), $"src".as("dst")), Seq("src", "dst"))
      .filter($"src" < $"dst")
      .select($"src".as("id_a"), $"dst".as("id_b"))
    val labels = graft.operators.Dedup.resolveClustersSparse(mutual, emb.select($"vec_id"))
    labels
      .join(emb.select($"vec_id".as("id"), $"label".cast("long").as("label")), Seq("id"))
      .groupBy($"keeper_id", $"label").agg(count(lit(1)).as("cnt"))
      .groupBy($"keeper_id")
      .agg(sum($"cnt").as("n_vecs"),
        max(struct($"cnt".as("c"), (lit(0L) - $"label").as("nl"))).as("m"))
      .select($"keeper_id".as("cluster_id"), $"n_vecs",
        (lit(0L) - $"m.nl").as("top_label"), $"m.c".as("n_top"))
      .withColumn("purity4", expr("(n_top * 10000) div n_vecs") / lit(10000.0))
      .orderBy($"cluster_id")
  }

  /** The band-relation body shared by both staging variants: MinHash
    * signature at the scan, 4 banded hashes per doc via md5/conv (the same
    * stableHash64 formula the DataFrame path compiles). */
  private val sqlBandsBody: String =
    """SELECT doc_id, mh, b,
      |       cast(conv(substring(md5(concat_ws(',',
      |         transform(slice(mh, b*2 + 1, 2), x -> cast(x AS string)))), 1, 15), 16, 10) AS bigint) AS h
      |FROM (SELECT doc_id, minhash_sig(text, 8, 4) AS mh FROM v_documents) sig
      |LATERAL VIEW explode(sequence(0, 3)) t AS b""".stripMargin

  /** The q56 SQL-text dedup pipeline against an existing `v_documents` temp
    * view — factored out so [[ScaleProbe]] measures exactly the shipped
    * statements. The band relation must be staged so the corpus scan +
    * MinHash pass runs ONCE (Spark inlines WITH-CTEs into every consumer,
    * so a single-statement form would compute signatures once per self-join
    * side). Staging is ADAPTIVE, governed by `spark.graft.sqlDedup.staging`:
    *
    *  - `cache` — eagerly-cached temp view. Wins interactively at bench
    *    scale (no disk round-trip), but ScaleProbe measured it LOSING at
    *    10× (61-72 s vs 34-51 s): the in-memory row cache feeds both join
    *    sides where the CTAS variant's self-join probes compressed
    *    columnar parquet scans.
    *  - `table` — parquet CTAS (`sql_bands_stage`). The 100 TB deployment
    *    shape: the band relation lands columnar-compressed on storage the
    *    executors scan independently, nothing pins executor memory across
    *    the join. Still plain SQL a SQL-only user can type.
    *  - `auto` (default) — CTAS once the source relation's estimated size
    *    crosses `spark.graft.sqlDedup.autoTableBytes` (default 4 MiB —
    *    between the bench corpus where cache measured faster and the 10×
    *    probe corpus where CTAS did; any production corpus is far above).
    *
    * Both variants produce bit-identical output (same band SQL, same
    * verify statement — only the staging relation differs), so the oracle
    * is staging-blind. The cache-variant view body deliberately uses an
    * inline subquery, not a WITH-CTE: a CTE gets a fresh id each time the
    * view is expanded, which defeats the cache manager's
    * canonicalized-plan match and silently recomputes.
    */
  def sqlDedupPipeline(s: SparkSession): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    releaseStaging(s) // clean slate per run
    val useTable = s.conf.get("spark.graft.sqlDedup.staging", "auto") match {
      case "table" => true
      case "cache" => false
      case _ => // auto: file-stats estimate of the scan feeding the bands
        val threshold =
          s.conf.get("spark.graft.sqlDedup.autoTableBytes", (4L << 20).toString).toLong
        s.table("v_documents").queryExecution.optimizedPlan.stats.sizeInBytes > threshold
    }
    val stage =
      if (useTable) {
        s.sql(s"CREATE TABLE sql_bands_stage USING parquet AS\n$sqlBandsBody")
        "sql_bands_stage"
      } else {
        s.sql(s"CREATE OR REPLACE TEMP VIEW v_sql_bands AS\n$sqlBandsBody")
        s.sql("CACHE TABLE v_sql_bands") // eager: ONE corpus scan, ONE minhash pass
        "v_sql_bands"
      }
    s.sql(
      s"""WITH ver AS (
        |  SELECT a.doc_id AS id_a, c.doc_id AS id_b,
        |         round(sig_jaccard(a.mh, c.mh), 4) AS est_jac
        |  FROM $stage a JOIN $stage c
        |    ON a.b = c.b AND a.h = c.h AND a.doc_id < c.doc_id
        |)
        |SELECT DISTINCT id_a, id_b, est_jac FROM ver
        |WHERE est_jac >= 0.5
        |ORDER BY id_a, id_b""".stripMargin)
  }

  // ---------------------------------------------------------------------
  // Oracle building blocks for the sequential packers (C1-C4): DuckDB
  // recursive CTEs replay the greedy folds line-by-line with the same
  // tokenizer regex, so the distributed flatMapGroups output is
  // independently verified — not just spec-covered (pipeline1.py:75-104,
  // 190-253 semantics; quirks documented in ChunkPacker).
  // ---------------------------------------------------------------------

  private val Tok = """\w+|[^\w\s]""" // TextFunctions.TokenRegex, RE2-safe
  private val Lim = 200

  /** Pass-1/pass-2 greedy line packer (C1+C2) as a recursive CTE; `select`
    * is applied over rows (form, i [1-based chunk index within its pass],
    * chunks [the pass's chunk list]).
    */
  private def pypdfPackerSql(select: String): String =
    raw"""WITH RECURSIVE
rawlines AS (
  SELECT source AS form, doc_id, unnest(range(1, len(l)+1)) AS li, l
  FROM (SELECT source, doc_id, string_split(text, chr(10)) AS l FROM documents)),
lines AS (
  SELECT form, row_number() OVER (PARTITION BY form ORDER BY doc_id, li) AS idx, line
  FROM (SELECT form, doc_id, li, trim(l[li]) AS line FROM rawlines)
  WHERE line != ''),
formn AS (SELECT form, max(idx) AS n FROM lines GROUP BY form),
pack1 AS (
  SELECT form, 0::BIGINT AS idx, '' AS buffer,
         CAST([] AS VARCHAR[]) AS chunks, CAST([] AS VARCHAR[]) AS oversized, n
  FROM formn
  UNION ALL
  SELECT s.form, s.idx + 1,
    CASE WHEN len(regexp_extract_all(l.line, '$Tok')) > $Lim THEN ''
         WHEN len(regexp_extract_all(s.buffer || l.line, '$Tok')) < $Lim
           THEN s.buffer || chr(10) || l.line
         ELSE l.line END,
    CASE WHEN len(regexp_extract_all(l.line, '$Tok')) > $Lim
           THEN (CASE WHEN s.buffer != '' THEN list_append(s.chunks, s.buffer) ELSE s.chunks END)
         WHEN len(regexp_extract_all(s.buffer || l.line, '$Tok')) < $Lim THEN s.chunks
         ELSE list_append(s.chunks, s.buffer) END,
    CASE WHEN len(regexp_extract_all(l.line, '$Tok')) > $Lim
           THEN list_append(s.oversized, l.line) ELSE s.oversized END,
    s.n
  FROM pack1 s JOIN lines l ON l.form = s.form AND l.idx = s.idx + 1
  WHERE s.idx < s.n),
final1 AS (
  SELECT form,
    CASE WHEN buffer != '' THEN list_append(chunks, buffer) ELSE chunks END AS chunks,
    oversized
  FROM pack1 WHERE idx = n),
words AS (
  SELECT form, row_number() OVER (PARTITION BY form ORDER BY oi, wi) AS idx, w AS line
  FROM (
    SELECT form, oi, unnest(range(1, len(ws)+1)) AS wi, ws
    FROM (
      SELECT form, unnest(range(1, len(oversized)+1)) AS oi, oversized
      FROM final1 WHERE len(oversized) > 0
    ), LATERAL (SELECT list_filter(string_split_regex(trim(oversized[oi]), '\s+'), x -> x != '') AS ws)
  ), LATERAL (SELECT ws[wi] AS w)
  WHERE w IS NOT NULL),
wordn AS (SELECT form, max(idx) AS n FROM words GROUP BY form),
pack2 AS (
  SELECT form, 0::BIGINT AS idx, '' AS buffer, CAST([] AS VARCHAR[]) AS chunks, n
  FROM wordn
  UNION ALL
  SELECT s.form, s.idx + 1,
    CASE WHEN len(regexp_extract_all(l.line, '$Tok')) > $Lim THEN ''
         WHEN len(regexp_extract_all(s.buffer || l.line, '$Tok')) < $Lim
           THEN s.buffer || ' ' || l.line
         ELSE l.line END,
    CASE WHEN len(regexp_extract_all(l.line, '$Tok')) > $Lim
           THEN (CASE WHEN s.buffer != '' THEN list_append(s.chunks, s.buffer) ELSE s.chunks END)
         WHEN len(regexp_extract_all(s.buffer || l.line, '$Tok')) < $Lim THEN s.chunks
         ELSE list_append(s.chunks, s.buffer) END,
    s.n
  FROM pack2 s JOIN words l ON l.form = s.form AND l.idx = s.idx + 1
  WHERE s.idx < s.n),
final2 AS (
  SELECT form,
    CASE WHEN buffer != '' THEN list_append(chunks, buffer) ELSE chunks END AS chunks
  FROM pack2 WHERE idx = n),
allchunks AS (
  SELECT form, unnest(range(1, len(chunks)+1)) AS i, chunks FROM final1
  UNION ALL
  SELECT form, unnest(range(1, len(chunks)+1)) AS i, chunks FROM final2)
$select"""

  /** Nougat path (C3+C4) as recursive CTEs: scrub → paragraphs → window
    * state-machine sections → greedy section packer (buffer tokens recomputed
    * from the buffer each step, as the reference does) → oversized-section
    * splitter with heading carried separator-free; ids are global per form.
    */
  private val nougatPackerSql: String =
    raw"""WITH RECURSIVE
formtext AS (
  SELECT source AS form, string_agg(text, chr(10) ORDER BY doc_id) AS txt
  FROM documents GROUP BY source),
paras0 AS (
  SELECT form, unnest(range(1, len(l)+1)) AS li, l
  FROM (SELECT form, string_split(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(txt, '\\begin\{tabular\}.*?\n', chr(10), 'g'), '\\end\{tabular\}.*?\n', chr(10), 'g'), '\\begin\{table\}.*?\n', chr(10), 'g'), '\\end\{table\}.*?\n', chr(10), 'g'), '(?s)\+\+\+(.*?)\+\+\+', chr(10), 'g'), chr(10)) AS l FROM formtext)),
paras AS (
  SELECT form, row_number() OVER (PARTITION BY form ORDER BY li) AS idx, p,
         starts_with(p, '#') AS ish
  FROM (SELECT form, li, l[li] AS p FROM paras0)
  WHERE p != ''),
sectioned AS (
  SELECT form, idx, p,
    sum(CASE WHEN ish OR NOT seen_before THEN 1 ELSE 0 END)
      OVER (PARTITION BY form ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS section
  FROM (
    SELECT form, idx, p, ish,
      coalesce(max(CASE WHEN ish THEN 1 ELSE 0 END)
        OVER (PARTITION BY form ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1 AS seen_before
    FROM paras)),
sections AS (
  SELECT form, row_number() OVER (PARTITION BY form ORDER BY section) AS idx,
         sec, len(regexp_extract_all(sec, '$Tok')) AS stok
  FROM (SELECT form, section, string_agg(p, chr(10) ORDER BY idx) AS sec
        FROM sectioned GROUP BY form, section)),
secn AS (SELECT form, max(idx) AS n FROM sections GROUP BY form),
pack AS (
  SELECT form, 0::BIGINT AS idx, '' AS buffer,
         CAST([] AS VARCHAR[]) AS chunks, CAST([] AS VARCHAR[]) AS oversized, n
  FROM secn
  UNION ALL
  SELECT s.form, s.idx + 1,
    CASE WHEN l.stok > $Lim THEN ''
         WHEN l.stok + len(regexp_extract_all(s.buffer, '$Tok')) < $Lim
           THEN s.buffer || chr(10) || l.sec
         ELSE l.sec END,
    CASE WHEN l.stok > $Lim
           THEN (CASE WHEN s.buffer != '' THEN list_append(s.chunks, s.buffer) ELSE s.chunks END)
         WHEN l.stok + len(regexp_extract_all(s.buffer, '$Tok')) < $Lim THEN s.chunks
         ELSE list_append(s.chunks, s.buffer) END,
    CASE WHEN l.stok > $Lim THEN list_append(s.oversized, l.sec) ELSE s.oversized END,
    s.n
  FROM pack s JOIN sections l ON l.form = s.form AND l.idx = s.idx + 1
  WHERE s.idx < s.n),
packed AS (
  SELECT form,
    CASE WHEN buffer != '' THEN list_append(chunks, buffer) ELSE chunks END AS chunks,
    oversized
  FROM pack WHERE idx = n),
osent0 AS (
  SELECT form, oi, unnest(range(1, len(ls)+1)) AS si, ls
  FROM (
    SELECT form, unnest(range(1, len(oversized)+1)) AS oi, oversized
    FROM packed WHERE len(oversized) > 0
  ), LATERAL (SELECT string_split(oversized[oi], chr(10)) AS ls)),
osent AS (
  SELECT form, oi, row_number() OVER (PARTITION BY form, oi ORDER BY si) AS idx, sent
  FROM (SELECT form, oi, si, trim(ls[si]) AS sent FROM osent0)
  WHERE sent != ''),
ohead AS (
  SELECT form, oi,
    CASE WHEN max(CASE WHEN idx = 1 THEN starts_with(sent, '#') END) THEN
      max(CASE WHEN idx = 1 THEN sent END) ELSE '' END AS heading
  FROM osent GROUP BY form, oi),
obody AS (
  SELECT s.form, s.oi,
    row_number() OVER (PARTITION BY s.form, s.oi ORDER BY s.idx) AS idx, s.sent,
    len(regexp_extract_all(s.sent, '$Tok')) AS t
  FROM osent s JOIN ohead h ON s.form = h.form AND s.oi = h.oi
  WHERE NOT (h.heading != '' AND s.idx = 1)),
obodyn AS (
  SELECT h.form, h.oi, h.heading, coalesce(b.n, 0) AS n
  FROM ohead h LEFT JOIN (SELECT form, oi, max(idx) AS n FROM obody GROUP BY form, oi) b
    ON b.form = h.form AND b.oi = h.oi),
osplit AS (
  SELECT form, oi, 0::BIGINT AS idx, heading AS buffer,
         CAST([] AS VARCHAR[]) AS chunks, heading, n
  FROM obodyn
  UNION ALL
  SELECT s.form, s.oi, s.idx + 1,
    CASE WHEN l.t + (CASE WHEN s.idx = 0 THEN 0
                          ELSE len(regexp_extract_all(s.buffer, '$Tok')) END) < $Lim
           THEN s.buffer || chr(10) || l.sent
         ELSE s.heading || l.sent END,
    CASE WHEN l.t + (CASE WHEN s.idx = 0 THEN 0
                          ELSE len(regexp_extract_all(s.buffer, '$Tok')) END) < $Lim
           THEN s.chunks
         ELSE list_append(s.chunks, s.buffer) END,
    s.heading, s.n
  FROM osplit s JOIN obody l ON l.form = s.form AND l.oi = s.oi AND l.idx = s.idx + 1
  WHERE s.idx < s.n),
splits AS (
  SELECT form, oi,
    CASE WHEN buffer != '' THEN list_append(chunks, buffer) ELSE chunks END AS chunks
  FROM osplit WHERE idx = n),
allrows AS (
  SELECT form, c, row_number() OVER (PARTITION BY form ORDER BY pass, oi, i) - 1 AS cid
  FROM (
    SELECT form, 0 AS pass, 0::BIGINT AS oi, i, chunks[i] AS c
    FROM (SELECT form, unnest(range(1, len(chunks)+1)) AS i, chunks FROM packed)
    UNION ALL
    SELECT form, 1 AS pass, oi, i, chunks[i] AS c
    FROM (SELECT form, oi, unnest(range(1, len(chunks)+1)) AS i, chunks FROM splits)
  ))
SELECT c AS Content,
       len(regexp_extract_all(c, '$Tok'))::INT AS TokenCount,
       form AS FormName,
       form || '_' || cid::VARCHAR AS ChunkId
FROM allrows"""

  /** MinHash-LSH candidate + verify CTEs shared by q39/q56 (pair list), q53
    * (cluster resolution), and q57 (mid-range windows): 8-hash signatures
    * over 4-char shingles, 4 bands of 2 rows, within-bucket candidates,
    * estimated Jaccard. `src` is any relation with (doc_id, text).
    */
  private def lshVerifiedCtes(src: String): String =
    s"""sig AS (SELECT doc_id, list_transform(range(0,8), j -> list_min(list_transform(shash, h -> (h * ((1000003*(j+1)) % 2147483647) + (12345 + 7919*j)) % 2147483647))) AS mh FROM (SELECT doc_id, list_transform(CASE WHEN length(text) < 4 THEN [text] ELSE list_transform(range(1, length(text)-2), i -> substr(text, i, 4)) END, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS shash FROM $src)), bands AS (SELECT doc_id, b, ('0x' || substr(md5(mh[2*b+1]::VARCHAR || ',' || mh[2*b+2]::VARCHAR), 1, 15))::BIGINT AS h FROM sig, (SELECT unnest(range(0,4)) AS b)), cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b FROM bands a JOIN bands c ON a.b = c.b AND a.h = c.h AND a.doc_id < c.doc_id), verified AS (SELECT id_a, id_b, round(len(list_filter(range(0,8), i -> sa.mh[i+1] = sb.mh[i+1]))::DOUBLE / 8.0, 4) AS est_jac FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b)"""

  private val LshVerifiedCtes: String = lshVerifiedCtes("documents")

  /** Six chained BPE merge rounds over the documents word table — the
    * DuckDB replay of [[graft.operators.BpeTokenizer.train]] for
    * q255/q256. Each symbol travels wrapped as chr(2)‖sym‖chr(3), so
    * applying merge (l, r) is ONE left-to-right non-overlapping string
    * replace of ⟨l⟩⟨r⟩ → ⟨lr⟩ — exactly greedy leftmost reference BPE
    * (the ⟩⟨ between wrapped symbols is consumed with the match, so
    * `a a a` + (a,a) → `aa a`, and a pair can never match inside a
    * longer symbol). Rounds are hand-chained because SQL cannot loop;
    * 6 rounds is the query contract. Ties break (cnt DESC, l, r) on
    * both engines (binary collation both sides; sf corpus is ASCII).
    */
  private val BpeTrainCtes: String = {
    val head = Seq(
      raw"""wf AS (SELECT w, count(*)::BIGINT AS c FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents) GROUP BY w)""",
      raw"""s0 AS (SELECT regexp_replace(w, '(.)', chr(2) || '\1' || chr(3), 'g') AS s, c FROM wf)""")
    val rounds = (1 to 6).flatMap { i =>
      Seq(
        s"""y$i AS (SELECT string_split(substr(s, 2, length(s) - 2), chr(3) || chr(2)) AS syms, c FROM s${i - 1})""",
        s"""p$i AS (SELECT syms[i] AS l, syms[i+1] AS r, sum(c)::BIGINT AS cnt FROM (SELECT syms, c, unnest(range(1, len(syms))) AS i FROM y$i WHERE len(syms) >= 2) GROUP BY 1, 2)""",
        s"""b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1)""",
        s"""s$i AS (SELECT replace(s, chr(2) || b.l || chr(3) || chr(2) || b.r || chr(3), chr(2) || b.l || b.r || chr(3)) AS s, c FROM s${i - 1}, b$i b)""")
    }
    (head ++ rounds).mkString(",\n")
  }

  /** Sign-LSH bucket id of `vec` (4 planes × 64 dims) — q31's formula. */
  private def bucketSql(vec: String): String =
    s"""list_sum(list_transform(range(0,4), p -> CASE WHEN list_sum(list_transform(range(0,64), i -> $vec[i+1]::DOUBLE * ((('0x' || substr(md5('plane:' || p::VARCHAR || ':' || i::VARCHAR),1,15))::BIGINT % 2001) - 1000) / 1000.0)) > 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END))::BIGINT"""

  /** Question vector CTEs reproducing DeterministicEmbedder(64).embedOne:
    * component i = ((stable60(md5("i:text")) % 2001) - 1000)/1000, then
    * L2-normalize and round-trip through FLOAT — bit-identical to the
    * engine's float literal (`Embedder.scala:24-31`).
    */
  private def questionVecCte(question: String): String =
    s"""raw AS (SELECT list_transform(range(0,64), i -> ((('0x' || substr(md5(i::VARCHAR || ':$question'), 1, 15))::BIGINT % 2001) - 1000) / 1000.0) AS r),
qv AS (SELECT list_transform(r, x -> (x / n)::FLOAT::DOUBLE) AS v FROM (SELECT r, sqrt(list_sum(list_transform(r, x -> x*x))) AS n FROM raw))"""

  /** DuckDB oracle equivalents, same column names/order keys. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, round(sum(l_extendedprice),2) AS sum_base_price, round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price, round(avg(l_discount),4) AS avg_disc, count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_nation_revenue" ->
      """SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name""",
    "q03_customers_with_orders" ->
      """SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""",
    "q04_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""",
    "q05_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q06_segment_filter" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') ORDER BY c_custkey""",
    "q07_order_rank" ->
      """SELECT o_orderkey, o_custkey, rn, o_custkey::VARCHAR || '_' || rn::VARCHAR AS order_tag FROM (SELECT o_orderkey, o_custkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn FROM orders) ORDER BY o_orderkey""",
    "q08_running_value" ->
      """SELECT event_id, user_id, round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_sum FROM events ORDER BY event_id""",
    "q09_distinct_pairs" ->
      """SELECT DISTINCT lang, source FROM documents ORDER BY lang, source""",
    "q10_lang_digest" ->
      """SELECT lang, string_agg(substr(text,1,10), '|' ORDER BY doc_id) AS texts FROM documents GROUP BY lang ORDER BY lang""",
    "q11_token_stats" ->
      """SELECT doc_id, length(text)::BIGINT AS len, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text),'\s+')) END::BIGINT AS ws_tokens, len(regexp_extract_all(text,'\w+|[^\w\s]'))::BIGINT AS n_tokens FROM documents ORDER BY doc_id""",
    "q12_entity_union" ->
      """SELECT * FROM (SELECT c_name AS name, 'customer' AS kind FROM customer UNION ALL SELECT s_name AS name, 'supplier' AS kind FROM supplier) ORDER BY kind, name""",
    "q13_upsert_batches" ->
      """SELECT batch, count(*) AS n, min(vec_id) AS first_id, max(vec_id) AS last_id FROM (SELECT vec_id, floor((row_number() OVER (ORDER BY vec_id)-1)/300.0)::BIGINT AS batch FROM embeddings) GROUP BY batch ORDER BY batch""",
    "q14_page" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 100""",
    "q15_doc_class" ->
      """SELECT doc_id, CASE WHEN n_chars < 150 THEN 'short' WHEN n_chars < 300 THEN 'medium' ELSE 'long' END AS size_class, CASE WHEN starts_with(text,'###') THEN 'Heading3' WHEN starts_with(text,'##') THEN 'Heading2' WHEN starts_with(text,'#') THEN 'Heading1' WHEN starts_with(text,'**') THEN 'Bold' WHEN starts_with(text,'*') THEN 'Bullet' ELSE 'Paragraph' END AS md_class FROM documents ORDER BY doc_id""",
    "q16_regex_ops" ->
      """SELECT doc_id, regexp_extract(text,'^(\w+)',1) AS first_word, length(regexp_replace(text,'\bthe\b','','g'))::BIGINT AS scrub_len FROM documents ORDER BY doc_id""",
    "q17_sections" ->
      """SELECT doc_id, source, sum(CASE WHEN is_heading = 1 OR seen_before = 0 THEN 1 ELSE 0 END) OVER (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS section FROM (SELECT doc_id, source, is_heading, coalesce(max(is_heading) OVER (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seen_before FROM (SELECT doc_id, source, CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS is_heading FROM documents)) ORDER BY doc_id""",
    "q18_event_type_stats" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users, round(sum(value),2) AS total_value FROM events GROUP BY event_type ORDER BY event_type""",
    "q19_user_history" ->
      """SELECT event_id, event_type, round(value,2) AS value FROM events WHERE user_id = 7 ORDER BY ts DESC, event_id DESC LIMIT 20""",
    "q20_cosine_topk" ->
      """SELECT vec_id, floor(list_cosine_similarity(embedding::DOUBLE[], (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) * 10000.0) / 10000.0 AS score FROM embeddings WHERE label IN (0,1,2,3,4) ORDER BY score DESC, vec_id LIMIT 5""",
    "q21_label_stats" ->
      """SELECT label, count(*) AS n, min(len(embedding))::BIGINT AS dim FROM embeddings GROUP BY label ORDER BY label""",
    "q22_dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_copies, min(doc_id) AS keeper_doc_id FROM documents GROUP BY md5(text) ORDER BY keeper_doc_id""",
    "q23_chunk_pypdf" -> pypdfPackerSql(
      s"""SELECT chunks[i] AS Content, len(regexp_extract_all(chunks[i], '$Tok'))::INT AS TokenCount, form AS FormName, form || '_' || (i-1)::VARCHAR AS ChunkId FROM allchunks"""),
    "q24_chunk_nougat" -> nougatPackerSql,
    "q34_embed_pipeline" -> pypdfPackerSql(
      """SELECT form AS FormName, form || '_' || (i-1)::VARCHAR AS ChunkId, len(regexp_extract_all(chunks[i], '""" + Tok + """'))::INT AS TokenCount, 16::BIGINT AS dim FROM allchunks"""),
    "q35_retrieval_e2e" ->
      s"""WITH ${questionVecCte("how do i join two large tables")}
SELECT vector_id, title, floor(sc * 10000.0) / 10000.0 AS score FROM
 (SELECT e.vec_id::VARCHAR AS vector_id, d.source AS title,
   list_cosine_similarity(e.embedding::DOUBLE[], (SELECT v FROM qv)) AS sc
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
  WHERE d.source IN ('src0','src1','src2','src3','src4')
  ORDER BY sc DESC, vector_id LIMIT 5)""",
    "q45_ask_context" ->
      s"""WITH ${questionVecCte("which table has the highest aggregate value")},
topk AS (SELECT e.vec_id::VARCHAR AS vector_id, substr(d.text, 1, 60) AS text,
   list_cosine_similarity(e.embedding::DOUBLE[], (SELECT v FROM qv)) AS sc
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
  WHERE d.source IN ('src1','src3','src5')
  ORDER BY sc DESC, vector_id LIMIT 2)
SELECT 'which table has the highest aggregate value' AS question,
  string_agg(vector_id, ',' ORDER BY sc DESC, vector_id) AS top_ids,
  string_agg(text, chr(10) ORDER BY sc DESC, vector_id) || chr(10) || chr(10) || ' Question: which table has the highest aggregate value' AS context
FROM topk""",
    "q25_minhash_sig" -> {
      def mh(j: Int) = {
        val a = (1000003L * (j + 1)) % 2147483647L
        val b = 12345L + 7919L * j
        s"list_min(list_transform(shash, h -> (h * $a + $b) % 2147483647)) AS mh$j"
      }
      s"""SELECT doc_id, ${mh(0)}, ${mh(1)}, ${mh(2)}, ${mh(3)} FROM (SELECT doc_id, list_transform(CASE WHEN length(text) < 5 THEN [text] ELSE list_transform(range(1, length(text)-3), i -> substr(text, i, 5)) END, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS shash FROM documents) ORDER BY doc_id"""
    },
    "q26_simhash" ->
      """SELECT doc_id, list_sum(list_transform(range(0,32), k -> CASE WHEN coalesce(list_sum(list_transform(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t != ''), t -> CASE WHEN (('0x' || substr(md5(t),1,15))::BIGINT >> k) % 2 = 1 THEN 1 ELSE -1 END)), 0) > 0 THEN (1::BIGINT << k) ELSE 0::BIGINT END))::BIGINT AS simhash FROM documents ORDER BY doc_id""",
    "q27_jaccard_pairs" ->
      """SELECT id_a, id_b, floor(len(list_intersect(sa, sb))::DOUBLE / len(list_distinct(sa || sb)) * 10000.0) / 10000.0 AS jac FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, list_distinct(CASE WHEN length(a.text) < 5 THEN [a.text] ELSE list_transform(range(1, length(a.text)-3), i -> substr(a.text, i, 5)) END) AS sa, list_distinct(CASE WHEN length(b.text) < 5 THEN [b.text] ELSE list_transform(range(1, length(b.text)-3), i -> substr(b.text, i, 5)) END) AS sb FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1) ORDER BY id_a""",
    "q28_lang_quality" ->
      """SELECT doc_id, CASE WHEN best <= 0 THEN 'und' WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en' WHEN s_es = best THEN 'es' WHEN s_fr = best THEN 'fr' ELSE 'und' END AS lang_pred, floor((least(length(text)::DOUBLE / 500.0, 1.0) + length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))::DOUBLE / greatest(length(text)::DOUBLE, 1.0) + least(len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in','that','it','with','el','la','de','que','y','en','un','los','se','por','der','die','das','und','ist','nicht','ein','mit','auf','zu','le','les','et','est','une','dans')))::DOUBLE / greatest(len(toks)::DOUBLE, 1.0) * 5.0, 1.0) + CASE WHEN coalesce(list_sum(list_transform(toks, t -> length(t))), 0)::DOUBLE / greatest(len(toks)::DOUBLE, 1.0) BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END) / 4.0 * 10000.0) / 10000.0 AS quality FROM (SELECT doc_id, text, toks, len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS s_de, len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in','that','it','with'))) AS s_en, len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','un','los','se','por'))) AS s_es, len(list_filter(toks, t -> t IN ('le','la','les','de','et','est','un','une','dans','que'))) AS s_fr, greatest(len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))), len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in','that','it','with'))), len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','un','los','se','por'))), len(list_filter(toks, t -> t IN ('le','la','les','de','et','est','un','une','dans','que')))) AS best FROM (SELECT doc_id, text, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t != '') AS toks FROM documents)) ORDER BY doc_id""",
    "q29_fingerprint" ->
      """SELECT doc_id, list_min(list_transform(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')] ELSE list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END, g -> ('0x' || substr(md5(g),1,15))::BIGINT)) AS fp FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t != '') AS toks FROM documents) ORDER BY doc_id""",
    "q30_ann_brute" ->
      """SELECT query_id, neighbor_id, floor(sc * 10000.0) / 10000.0 AS score, rn AS rank FROM (SELECT query_id, neighbor_id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, neighbor_id) AS rn FROM (SELECT q.query_id, e.vec_id AS neighbor_id, list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS sc FROM embeddings e, (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id IN (0,1,2)) q WHERE e.vec_id <> q.query_id)) WHERE rn <= 3 ORDER BY query_id, rank""",
    "q31_lsh_buckets" ->
      """SELECT bucket, count(*) AS n FROM (SELECT list_sum(list_transform(range(0,4), p -> CASE WHEN list_sum(list_transform(range(0,64), i -> embedding[i+1]::DOUBLE * ((('0x' || substr(md5('plane:' || p::VARCHAR || ':' || i::VARCHAR),1,15))::BIGINT % 2001) - 1000) / 1000.0)) > 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END))::BIGINT AS bucket FROM embeddings) GROUP BY bucket ORDER BY bucket""",
    "q32_ivf_ann" ->
      """WITH cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
corpcell AS (SELECT vec_id, embedding, centroid_id FROM (SELECT e.vec_id, e.embedding, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents c) WHERE rn = 1),
probes AS (SELECT query_id, qv, centroid_id FROM (SELECT q.vec_id AS query_id, q.embedding AS qv, c.centroid_id, row_number() OVER (PARTITION BY q.vec_id ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (0,1,2)) q, cents c) WHERE rn <= 2)
SELECT query_id, neighbor_id, floor(sc * 10000.0) / 10000.0 AS score, rank FROM (
  SELECT p.query_id, e.vec_id AS neighbor_id, list_cosine_similarity(e.embedding::DOUBLE[], p.qv::DOUBLE[]) AS sc,
    row_number() OVER (PARTITION BY p.query_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], p.qv::DOUBLE[]) DESC, e.vec_id) AS rank
  FROM corpcell e JOIN probes p ON e.centroid_id = p.centroid_id
  WHERE e.vec_id <> p.query_id)
WHERE rank <= 3 ORDER BY query_id, rank""",
    "q33_exists_probe" ->
      """SELECT source, max(CASE WHEN n_chars > 350 THEN 1 ELSE 0 END)::BIGINT AS has_large, count(*) AS n_docs FROM documents GROUP BY source ORDER BY source""",
    "q36_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_length, md5(text) AS content_md5, (('0x' || substr(md5(text),1,15))::BIGINT % 1920)::BIGINT AS fake_width, (('0x' || substr(md5(text),1,15))::BIGINT % 1080)::BIGINT AS fake_height FROM documents ORDER BY doc_id""",
    "q37_index_lifecycle" ->
      """WITH recs AS (
  SELECT d.source AS title,
         row_number() OVER (PARTITION BY d.source ORDER BY e.vec_id) - 1 AS rn
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
  WHERE d.source IN ('src0','src1','src2')),
ids AS (SELECT title, title || '_' || rn::VARCHAR AS vector_id FROM recs),
after_form_delete AS (SELECT * FROM ids WHERE title != 'src2'),
victims AS (SELECT vector_id FROM after_form_delete WHERE title = 'src0' ORDER BY vector_id LIMIT 2),
survivors AS (
  SELECT * FROM after_form_delete
  WHERE vector_id NOT IN (SELECT vector_id FROM victims) AND title != 'src1')
SELECT kind, title, n FROM (
  SELECT 'index' AS kind, title, count(*)::BIGINT AS n FROM survivors GROUP BY title
  UNION ALL
  SELECT 'mirror' AS kind, title, 1::BIGINT AS n FROM (SELECT DISTINCT title FROM survivors))
ORDER BY kind, title""",
    "q38_validation" ->
      """SELECT c_custkey, email_cand, password_cand, CASE WHEN regexp_matches(email_cand, '^.+@.+\.(com)$') THEN 1 ELSE 0 END AS email_ok, CASE WHEN regexp_matches(password_cand, '^\S{5,}$') AND regexp_matches(password_cand, '[!@#$%^&*]') THEN 1 ELSE 0 END AS password_ok FROM (SELECT c_custkey, lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')) || CASE WHEN c_custkey % 3 = 0 THEN '@example.org' ELSE '@example.com' END AS email_cand, CASE WHEN c_custkey % 2 = 0 THEN replace(c_name, '#', '') ELSE c_name END AS password_cand FROM customer) ORDER BY c_custkey""",
    "q39_neardup_lsh" ->
      s"""WITH $LshVerifiedCtes SELECT id_a, id_b, est_jac FROM verified WHERE est_jac >= 0.5 ORDER BY id_a, id_b""",
    // q56 is the SQL-text expression of exactly q39's pipeline — same oracle
    "q56_sql_dedup" ->
      s"""WITH $LshVerifiedCtes SELECT id_a, id_b, est_jac FROM verified WHERE est_jac >= 0.5 ORDER BY id_a, id_b""",
    "q40_embed_neardup" ->
      """WITH b AS (SELECT vec_id, embedding, list_sum(list_transform(range(0,4), p -> CASE WHEN list_sum(list_transform(range(0,64), i -> embedding[i+1]::DOUBLE * ((('0x' || substr(md5('plane:' || p::VARCHAR || ':' || i::VARCHAR),1,15))::BIGINT % 2001) - 1000) / 1000.0)) > 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END))::BIGINT AS bucket FROM embeddings) SELECT a.vec_id AS id_a, c.vec_id AS id_b, floor(list_cosine_similarity(a.embedding::DOUBLE[], c.embedding::DOUBLE[]) * 10000.0) / 10000.0 AS score FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id WHERE list_cosine_similarity(a.embedding::DOUBLE[], c.embedding::DOUBLE[]) > 0.3 ORDER BY id_a, id_b""",
    "q41_monthly_revenue" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_items, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY month""",
    "q42_source_signature" ->
      """SELECT source, min(mh0) AS mh0, min(mh1) AS mh1, min(mh2) AS mh2, min(mh3) AS mh3 FROM (SELECT source, list_min(list_transform(shash, h -> (h * 1000003 + 12345) % 2147483647)) AS mh0, list_min(list_transform(shash, h -> (h * 2000006 + 20264) % 2147483647)) AS mh1, list_min(list_transform(shash, h -> (h * 3000009 + 28183) % 2147483647)) AS mh2, list_min(list_transform(shash, h -> (h * 4000012 + 36102) % 2147483647)) AS mh3 FROM (SELECT source, list_transform(CASE WHEN length(text) < 5 THEN [text] ELSE list_transform(range(1, length(text)-3), i -> substr(text, i, 5)) END, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS shash FROM documents)) GROUP BY source ORDER BY source""",
    "q43_salted_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value FROM events GROUP BY event_type ORDER BY event_type""",
    "q44_salted_join" ->
      """SELECT event_type, 't:' || event_type AS type_tag, count(*) AS n, round(sum(value), 2) AS total_value FROM events GROUP BY event_type ORDER BY event_type""",
    "q46_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type, count(*) AS n, round(sum(value), 2) AS total_value FROM events GROUP BY ROLLUP(event_type) ORDER BY event_type""",
    "q47_pivot" ->
      """SELECT user_id, sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click, sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view, sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error, sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase FROM events WHERE user_id < 10 GROUP BY user_id ORDER BY user_id""",
    "q48_hourly" ->
      """SELECT floor(epoch_ns(ts) / 3600000000000)::BIGINT AS hour_bucket, count(*) AS n, round(sum(value), 2) AS total_value FROM events GROUP BY 1 ORDER BY hour_bucket""",
    "q49_asof" ->
      """SELECT e.event_id, e.user_id, round(c.value, 2) AS last_click_value FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c ON e.user_id = c.user_id AND e.ts >= c.ts ORDER BY e.event_id""",
    "q50_sql_interface" ->
      """SELECT vec_id, floor(list_cosine_similarity(embedding::DOUBLE[], (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 7)) * 10000.0) / 10000.0 AS score FROM embeddings WHERE label IN (5, 6, 7) ORDER BY score DESC, vec_id LIMIT 8""",
    "q52_ann_multiprobe" ->
      s"""WITH bkt AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
qp AS (SELECT query_id, qv, xor(bucket, flip) AS bucket FROM (SELECT vec_id AS query_id, embedding AS qv, bucket FROM bkt WHERE vec_id IN (0,1,2)), (SELECT unnest([0,1,2,4,8]) AS flip))
SELECT query_id, neighbor_id, floor(sc * 10000.0) / 10000.0 AS score, rank FROM (
  SELECT q.query_id, c.vec_id AS neighbor_id, list_cosine_similarity(c.embedding::DOUBLE[], q.qv::DOUBLE[]) AS sc,
    row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC, c.vec_id) AS rank
  FROM bkt c JOIN qp q ON c.bucket = q.bucket WHERE c.vec_id <> q.query_id)
WHERE rank <= 3 ORDER BY query_id, rank""",
    "q53_dedup_resolve" ->
      s"""WITH RECURSIVE $LshVerifiedCtes,
good AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 1.0),
edges AS (SELECT id_a AS src, id_b AS dst FROM good UNION ALL SELECT id_b AS src, id_a AS dst FROM good),
reach AS (SELECT doc_id AS id, doc_id AS r FROM documents UNION SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id)
SELECT id AS doc_id, min(r) AS keeper_id FROM reach GROUP BY id ORDER BY doc_id""",
    "q57_dedup_midrange" ->
      s"""WITH RECURSIVE
win AS (SELECT doc_id*3 + w AS doc_id, substr(text, 1 + w*greatest(1, cast(floor(length(text)/8.0) AS BIGINT)), greatest(4, cast(floor(length(text)/2.0) AS BIGINT))) AS text FROM (SELECT doc_id, text FROM documents WHERE doc_id < 200), (SELECT unnest([0,1,2]) AS w)),
${lshVerifiedCtes("win")},
good AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 0.5 AND est_jac < 1.0),
edges AS (SELECT id_a AS src, id_b AS dst FROM good UNION ALL SELECT id_b AS src, id_a AS dst FROM good),
reach AS (SELECT doc_id AS id, doc_id AS r FROM win UNION SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id)
SELECT id AS win_id, min(r) AS keeper_id FROM reach GROUP BY id ORDER BY win_id""",
    "q58_hash_split" ->
      raw"""SELECT source, split, count(*) AS n_docs, sum(len(regexp_extract_all(text, '\w+|[^\w\s]')))::BIGINT AS n_tokens FROM (SELECT source, text, CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split FROM (SELECT source, text, ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS b FROM documents)) GROUP BY source, split ORDER BY source, split""",
    "q59_sequence_pack" ->
      raw"""WITH RECURSIVE
d AS (SELECT source, doc_id, len(regexp_extract_all(text, '\w+|[^\w\s]')) AS t, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS idx FROM documents),
srcn AS (SELECT source, max(idx) AS n FROM d GROUP BY source),
pack AS (
  SELECT source, 0::BIGINT AS idx, 0::BIGINT AS cur, 0::BIGINT AS seq, n FROM srcn
  UNION ALL
  SELECT p.source, p.idx + 1,
    CASE WHEN p.cur = 0 OR p.cur + dd.t > 500 THEN dd.t::BIGINT ELSE p.cur + dd.t END,
    CASE WHEN p.cur = 0 OR p.cur + dd.t > 500 THEN p.seq + 1 ELSE p.seq END,
    p.n
  FROM pack p JOIN d dd ON dd.source = p.source AND dd.idx = p.idx + 1
  WHERE p.idx < p.n),
assigned AS (
  SELECT p.source, dd.doc_id, p.seq AS seq_no, dd.t
  FROM pack p JOIN d dd ON dd.source = p.source AND dd.idx = p.idx
  WHERE p.idx >= 1)
SELECT source, seq_no, count(*) AS n_docs, sum(t)::BIGINT AS seq_tokens
FROM assigned GROUP BY source, seq_no ORDER BY source, seq_no""",
    "q60_decontaminate" ->
      raw"""WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS w FROM documents),
grams AS (
  SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 2)) AS i FROM toks WHERE len(w) >= 4)
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS g FROM toks WHERE len(w) BETWEEN 1 AND 3
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 83 = 7)
SELECT doc_id, count(DISTINCT g)::BIGINT AS n_shared
FROM grams JOIN ev USING (g)
WHERE doc_id % 83 <> 7
GROUP BY doc_id ORDER BY doc_id""",
    "q61_repetition_filter" ->
      raw"""WITH ln AS (
  SELECT doc_id, len(ls)::BIGINT AS n_lines, len(list_distinct(ls))::BIGINT AS n_distinct_lines
  FROM (SELECT doc_id, list_filter(string_split(text, chr(10)), x -> trim(x) != '') AS ls FROM documents)),
tf AS (
  SELECT doc_id, max(c)::DOUBLE / sum(c) AS f
  FROM (SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents)
        GROUP BY doc_id, w)
  GROUP BY doc_id)
SELECT doc_id, n_lines, n_distinct_lines,
  floor((CASE WHEN n_lines > 0 THEN 1.0 - n_distinct_lines::DOUBLE / n_lines ELSE 0.0 END) * 10000.0) / 10000.0 AS dup_line_frac,
  floor(coalesce(tf.f, 0.0) * 10000.0) / 10000.0 AS top_tok_frac,
  CASE WHEN dup_line_frac <= 0.3 AND top_tok_frac <= 0.2 THEN 1 ELSE 0 END AS keep
FROM ln LEFT JOIN tf USING (doc_id) ORDER BY doc_id""",
    "q62_source_mix" ->
      """SELECT source, (2000 + hm)::BIGINT AS rate_bp, count(*) AS n_docs, sum(CASE WHEN hs < 2000 + hm THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM (SELECT source, ('0x' || substr(md5('mix:' || source), 1, 15))::BIGINT % 7000 AS hm, ('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 15))::BIGINT % 10000 AS hs FROM documents)
GROUP BY source, hm ORDER BY source""",
    "q63_vocab_topk" ->
      raw"""SELECT w AS token, count(*) AS n FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents) GROUP BY w ORDER BY n DESC, token LIMIT 20""",
    "q64_pii_scrub" ->
      raw"""SELECT c_custkey, scrubbed, ((len(string_split(scrubbed, '<EMAIL>')) - 1) + (len(string_split(scrubbed, '<PHONE>')) - 1))::BIGINT AS n_redacted
FROM (SELECT c_custkey, regexp_replace(regexp_replace(
  'contact ' || lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')) || '@corp.example' || CASE WHEN c_custkey % 3 <> 0 THEN ' ph ' || printf('%02d-%03d-%03d-%04d', (c_nationkey + 10)::INT, (100 + c_custkey % 900)::INT, (100 + (c_custkey * 7) % 900)::INT, (1000 + (c_custkey * 13) % 9000)::INT) ELSE '' END || ' end',
  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'), '\d{2}-\d{3}-\d{3}-\d{4}', '<PHONE>', 'g') AS scrubbed FROM customer)
ORDER BY c_custkey""",
    "q65_sessionize" ->
      """SELECT user_id, session_seq, count(*) AS n_events, min(tus) AS start_us, (max(tus) - min(tus))::BIGINT AS dur_us, round(sum(value), 2) AS total_value
FROM (SELECT user_id, event_id, value, tus,
        sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq
      FROM (SELECT event_id, user_id, value, epoch_us(ts) AS tus,
              CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 21600000000
                   THEN 1 ELSE 0 END AS is_new
            FROM events))
GROUP BY user_id, session_seq ORDER BY user_id, session_seq""",
    "q66_bm25" ->
      raw"""WITH base AS (
  SELECT doc_id, len(tk)::DOUBLE AS dl,
         len(list_filter(tk, x -> x = 'join'))::DOUBLE AS tf_join,
         len(list_filter(tk, x -> x = 'vector'))::DOUBLE AS tf_vector,
         len(list_filter(tk, x -> x = 'window'))::DOUBLE AS tf_window,
         len(list_filter(tk, x -> x = 'stream'))::DOUBLE AS tf_stream
  FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS tk FROM documents)),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
         sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_join,
         sum(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_vector,
         sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_window,
         sum(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_stream
  FROM base)
SELECT doc_id, floor((
    (floor(ln(((n_docs - df_join + 0.5) / (df_join + 0.5)) + 1.0) * 10000.0) / 10000.0) * (tf_join * 2.2) / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + (floor(ln(((n_docs - df_vector + 0.5) / (df_vector + 0.5)) + 1.0) * 10000.0) / 10000.0) * (tf_vector * 2.2) / (tf_vector + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + (floor(ln(((n_docs - df_window + 0.5) / (df_window + 0.5)) + 1.0) * 10000.0) / 10000.0) * (tf_window * 2.2) / (tf_window + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + (floor(ln(((n_docs - df_stream + 0.5) / (df_stream + 0.5)) + 1.0) * 10000.0) / 10000.0) * (tf_stream * 2.2) / (tf_stream + 1.2 * (0.25 + 0.75 * dl / avgdl))
  ) * 10000.0) / 10000.0 AS score
FROM base CROSS JOIN stats
WHERE tf_join + tf_vector + tf_window + tf_stream > 0
ORDER BY score DESC, doc_id LIMIT 10""",
    "q67_hybrid_rrf" ->
      raw"""WITH base AS (
  SELECT doc_id, len(tk)::DOUBLE AS dl,
         len(list_filter(tk, x -> x = 'join'))::DOUBLE AS tf_join,
         len(list_filter(tk, x -> x = 'vector'))::DOUBLE AS tf_vector,
         len(list_filter(tk, x -> x = 'window'))::DOUBLE AS tf_window,
         len(list_filter(tk, x -> x = 'stream'))::DOUBLE AS tf_stream
  FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS tk FROM documents)),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
         sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_join,
         sum(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_vector,
         sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_window,
         sum(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_stream
  FROM base),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS lex_rank
  FROM (SELECT doc_id, (
      (floor(ln(((n_docs - df_join + 0.5) / (df_join + 0.5)) + 1.0) * 10000.0) / 10000.0) * (tf_join * 2.2) / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl))
    + (floor(ln(((n_docs - df_vector + 0.5) / (df_vector + 0.5)) + 1.0) * 10000.0) / 10000.0) * (tf_vector * 2.2) / (tf_vector + 1.2 * (0.25 + 0.75 * dl / avgdl))
    + (floor(ln(((n_docs - df_window + 0.5) / (df_window + 0.5)) + 1.0) * 10000.0) / 10000.0) * (tf_window * 2.2) / (tf_window + 1.2 * (0.25 + 0.75 * dl / avgdl))
    + (floor(ln(((n_docs - df_stream + 0.5) / (df_stream + 0.5)) + 1.0) * 10000.0) / 10000.0) * (tf_stream * 2.2) / (tf_stream + 1.2 * (0.25 + 0.75 * dl / avgdl))
    ) AS score
    FROM base CROSS JOIN stats
    WHERE tf_join + tf_vector + tf_window + tf_stream > 0
    ORDER BY score DESC, doc_id LIMIT 20)),
vec AS (
  SELECT doc_id, row_number() OVER (ORDER BY vscore DESC, doc_id)::BIGINT AS vec_rank
  FROM (SELECT vec_id AS doc_id,
               list_cosine_similarity(embedding::DOUBLE[], (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) AS vscore
        FROM embeddings WHERE vec_id <> 0
        ORDER BY vscore DESC, doc_id LIMIT 20))
SELECT doc_id, lex_rank, vec_rank,
       floor((coalesce(1.0 / (lex_rank::DOUBLE + 60.0), 0.0) + coalesce(1.0 / (vec_rank::DOUBLE + 60.0), 0.0)) * 1000000.0) / 1000000.0 AS rrf
FROM lex FULL OUTER JOIN vec USING (doc_id)
ORDER BY rrf DESC, doc_id LIMIT 10""",
    "q68_paragraph_dedup" ->
      raw"""WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS tk FROM documents),
segs AS (
  SELECT doc_id, i AS idx, array_to_string(tk[(i-1)*3+1 : i*3], ' ') AS p
  FROM toks, (SELECT unnest(range(1, 1000)) AS i)
  WHERE len(tk) > 0 AND (i-1)*3 < len(tk)),
rk AS (
  SELECT doc_id, idx, p, row_number() OVER (PARTITION BY p ORDER BY doc_id, idx) AS rn FROM segs)
SELECT doc_id, count(*) AS n_pars,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       md5(coalesce(string_agg(p, ' ' ORDER BY idx) FILTER (WHERE rn = 1), '')) AS kept_md5
FROM rk GROUP BY doc_id ORDER BY doc_id""",
    "q70_quality_filter" ->
      raw"""SELECT doc_id, n_tok,
       floor((sum_len::DOUBLE / n_tok) * 10000.0) / 10000.0 AS mean_len4,
       floor((n_stop::DOUBLE / n_tok) * 10000.0) / 10000.0 AS frac_stop4,
       CASE WHEN n_tok >= 20 AND n_tok <= 80 AND n_stop > 0
              AND sum_len::DOUBLE / n_tok >= 3.0 AND sum_len::DOUBLE / n_tok <= 6.0
            THEN 1 ELSE 0 END AS keep
FROM (SELECT doc_id, len(tk)::BIGINT AS n_tok,
             list_sum(list_transform(tk, x -> len(x)))::BIGINT AS sum_len,
             len(list_filter(tk, x -> list_contains(['the','a','of','and','is','to','in','that','it','with'], x)))::BIGINT AS n_stop
      FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS tk FROM documents))
ORDER BY doc_id""",
    "q71_tfidf_keywords" ->
      raw"""WITH tok AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents),
tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
dft AS (SELECT w, count(*)::DOUBLE AS df FROM tf GROUP BY w),
nd AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
SELECT doc_id, kw_rank, w AS token, score FROM (
  SELECT doc_id, w, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w)::BIGINT AS kw_rank
  FROM (SELECT doc_id, w,
               floor((tf * (floor(ln(n_docs / df) * 1000000.0) / 1000000.0)) * 10000.0) / 10000.0 AS score
        FROM tf JOIN dft USING (w) CROSS JOIN nd))
WHERE kw_rank <= 3 ORDER BY doc_id, kw_rank""",
    "q72_event_anomaly" ->
      """SELECT hour_bucket, n, z4,
       CASE WHEN z4 IS NOT NULL THEN (CASE WHEN abs(z4) > 2.0 THEN 1 ELSE 0 END) END AS anomaly
FROM (SELECT hour_bucket, n,
        CASE WHEN cnt24 >= 12 AND (sumsq24::DOUBLE - (sum24::DOUBLE * sum24::DOUBLE) / cnt24::DOUBLE) / (cnt24::DOUBLE - 1.0) > 0
             THEN floor(((n::DOUBLE - sum24::DOUBLE / cnt24::DOUBLE)
                         / sqrt((sumsq24::DOUBLE - (sum24::DOUBLE * sum24::DOUBLE) / cnt24::DOUBLE) / (cnt24::DOUBLE - 1.0))) * 10000.0) / 10000.0
             ELSE NULL END AS z4
      FROM (SELECT hour_bucket, n,
              count(*) OVER fr AS cnt24,
              sum(n) OVER fr AS sum24,
              sum(n * n) OVER fr AS sumsq24
            FROM (SELECT floor(epoch_ns(ts) / 3600000000000)::BIGINT AS hour_bucket, count(*) AS n FROM events GROUP BY 1)
            WINDOW fr AS (ORDER BY hour_bucket ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)))
ORDER BY hour_bucket""",
    "q73_kmv_distinct" ->
      raw"""WITH tok AS (
  SELECT source, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents),
dh AS (SELECT DISTINCT source, ('0x' || substr(md5('kmv:' || w), 1, 15))::BIGINT AS h FROM tok),
rk AS (SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY source) AS m
       FROM dh)
SELECT t.source, t.n_exact,
       floor((CASE WHEN e.m < 16 THEN e.m::DOUBLE
                   ELSE 15.0 * 1152921504606846976.0 / e.h16::DOUBLE END) * 10000.0) / 10000.0 AS est4
FROM (SELECT source, count(DISTINCT w)::BIGINT AS n_exact FROM tok GROUP BY source) t
JOIN (SELECT source, max(m)::BIGINT AS m, max(CASE WHEN rn = 16 THEN h END) AS h16 FROM rk GROUP BY source) e
  ON t.source = e.source
ORDER BY t.source""",
    "q74_epoch_shuffle" ->
      """SELECT doc_id,
       row_number() OVER (ORDER BY h0)::BIGINT AS pos_e0,
       row_number() OVER (ORDER BY h1)::BIGINT AS pos_e1
FROM (SELECT doc_id,
        ('0x' || substr(md5('epoch0:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h0,
        ('0x' || substr(md5('epoch1:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h1
      FROM documents)
ORDER BY doc_id""",
    "q75_simhash_neardup" ->
      raw"""WITH s AS (
  SELECT doc_id, list_sum(list_transform(range(0,32), k -> CASE WHEN coalesce(list_sum(list_transform(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t != ''), t -> CASE WHEN (('0x' || substr(md5(t),1,15))::BIGINT >> k) % 2 = 1 THEN 1 ELSE -1 END)), 0) > 0 THEN (1::BIGINT << k) ELSE 0::BIGINT END))::BIGINT AS sh
  FROM documents),
bands AS (
  SELECT doc_id, sh, b, (sh >> (b * 8)) & 255 AS key
  FROM s, (SELECT unnest(range(0, 4)) AS b))
SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b, bit_count(xor(a.sh, c.sh))::BIGINT AS hamming
FROM bands a JOIN bands c ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
WHERE bit_count(xor(a.sh, c.sh)) <= 3
ORDER BY id_a, id_b""",
    "q76_stratified_sample" ->
      """SELECT source, rk, doc_id
FROM (SELECT source, doc_id,
        row_number() OVER (PARTITION BY source ORDER BY h, doc_id)::BIGINT AS rk
      FROM (SELECT source, doc_id,
              ('0x' || substr(md5('strat:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
            FROM documents))
WHERE rk <= 10 ORDER BY source, rk""",
    "q77_snapshot_diff" ->
      """SELECT status, count(*) AS n FROM (
  SELECT CASE WHEN p.h_prev IS NULL THEN 'added'
              WHEN c.h_cur IS NULL THEN 'removed'
              WHEN c.h_cur <> p.h_prev THEN 'changed'
              ELSE 'same' END AS status
  FROM (SELECT doc_id, md5(text) AS h_cur FROM documents) c
  FULL OUTER JOIN (
    SELECT doc_id, md5(CASE WHEN doc_id % 13 = 2 THEN text || ' v1' ELSE text END) AS h_prev
    FROM documents WHERE doc_id % 17 <> 3
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, md5(text) AS h_prev FROM documents WHERE doc_id % 19 = 5
  ) p USING (doc_id))
GROUP BY status ORDER BY status""",
    // the full-corpus verified pairs restricted to pairs touching the delta
    // (bucket >= 90) — exactly what the incremental operator must produce
    "q78_incremental_neardup" ->
      s"""WITH $LshVerifiedCtes,
dd AS (SELECT doc_id FROM documents WHERE ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 >= 90)
SELECT id_a, id_b, est_jac,
  CASE WHEN id_a IN (SELECT doc_id FROM dd) AND id_b IN (SELECT doc_id FROM dd)
       THEN 'new_new' ELSE 'new_old' END AS pair_kind
FROM verified
WHERE est_jac >= 0.5 AND (id_a IN (SELECT doc_id FROM dd) OR id_b IN (SELECT doc_id FROM dd))
ORDER BY id_a, id_b""",
    // sample membership replayed by rank over the same salted hash; the
    // value at sample-rank k is tie-insensitive, so row_number ties on
    // equal n_chars cannot flip the reported quantile
    "q79_sampled_quantiles" ->
      """WITH s AS (SELECT source, n_chars, row_number() OVER (PARTITION BY source ORDER BY h, n_chars) AS rk
  FROM (SELECT source, n_chars, ('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h FROM documents)),
r AS (SELECT source, n_chars, row_number() OVER (PARTITION BY source ORDER BY n_chars) AS vr,
        count(*) OVER (PARTITION BY source) AS n
      FROM (SELECT source, n_chars FROM s WHERE rk <= 16))
SELECT source, max(n)::BIGINT AS sample_n,
  min(CASE WHEN vr = cast(floor((25*n + 99) / 100.0) AS BIGINT) THEN n_chars END)::BIGINT AS p25,
  min(CASE WHEN vr = cast(floor((50*n + 99) / 100.0) AS BIGINT) THEN n_chars END)::BIGINT AS p50,
  min(CASE WHEN vr = cast(floor((75*n + 99) / 100.0) AS BIGINT) THEN n_chars END)::BIGINT AS p75,
  min(CASE WHEN vr = cast(floor((90*n + 99) / 100.0) AS BIGINT) THEN n_chars END)::BIGINT AS p90
FROM r GROUP BY source ORDER BY source""",
    "q80_quantized_ann" ->
      """WITH mx AS (SELECT vec_id, embedding, list_max(list_transform(embedding, x -> abs(x)))::DOUBLE AS mab FROM embeddings),
qz AS (SELECT vec_id, embedding, 127 / mab AS s,
         list_transform(embedding, x -> cast(floor(x::DOUBLE * (127 / mab) + 0.5) AS BIGINT)) AS qv
       FROM mx),
cand AS (SELECT query_id, neighbor_id, qdot, qdot::DOUBLE / (sq * sc2) AS ascore, emb_c, emb_q FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(range(0,64), i -> q.qv[i+1] * c.qv[i+1]))::BIGINT AS qdot,
         q.s AS sq, c.s AS sc2, c.embedding AS emb_c, q.embedding AS emb_q
  FROM qz c, (SELECT * FROM qz WHERE vec_id IN (0,1,2)) q
  WHERE c.vec_id <> q.vec_id)),
resc AS (SELECT query_id, neighbor_id, qdot,
           list_cosine_similarity(emb_c::DOUBLE[], emb_q::DOUBLE[]) AS sc
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ascore DESC, neighbor_id) AS r1 FROM cand)
         WHERE r1 <= 8)
SELECT query_id, neighbor_id, qdot, floor(sc * 10000.0) / 10000.0 AS score, rn AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, neighbor_id) AS rn FROM resc)
WHERE rn <= 3 ORDER BY query_id, rank""",
    // q53's component resolution joined back to the corpus as a keep filter
    "q81_dedup_corpus" ->
      raw"""WITH RECURSIVE $LshVerifiedCtes,
good AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 1.0),
edges AS (SELECT id_a AS src, id_b AS dst FROM good UNION ALL SELECT id_b AS src, id_a AS dst FROM good),
reach AS (SELECT doc_id AS id, doc_id AS r FROM documents UNION SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id),
keep AS (SELECT id AS doc_id, min(r) AS keeper_id FROM reach GROUP BY id)
SELECT source,
  sum(CASE WHEN keeper_id = doc_id THEN 1 ELSE 0 END)::BIGINT AS n_kept,
  sum(CASE WHEN keeper_id = doc_id THEN 0 ELSE 1 END)::BIGINT AS n_dropped,
  sum(CASE WHEN keeper_id = doc_id THEN len(regexp_extract_all(text, '\w+|[^\w\s]')) ELSE 0 END)::BIGINT AS kept_tokens
FROM documents JOIN keep USING (doc_id)
GROUP BY source ORDER BY source""",
    "q82_hard_negatives" ->
      """SELECT query_id, neighbor_id, label, floor(sc * 10000.0) / 10000.0 AS score, rn AS rank FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
    list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS sc,
    row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id) AS rn
  FROM embeddings e, (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS q_label FROM embeddings WHERE vec_id IN (0,1,2)) q
  WHERE e.label <> q.q_label)
WHERE rn <= 3 ORDER BY query_id, rank""",
    "q83_leakage_safe_split" ->
      s"""WITH RECURSIVE $LshVerifiedCtes,
good AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 1.0),
edges AS (SELECT id_a AS src, id_b AS dst FROM good UNION ALL SELECT id_b AS src, id_a AS dst FROM good),
reach AS (SELECT doc_id AS id, doc_id AS r FROM documents UNION SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id),
keep AS (SELECT id AS doc_id, min(r) AS keeper_id FROM reach GROUP BY id)
SELECT source, split, count(*) AS n_docs, count(DISTINCT keeper_id) AS n_clusters
FROM (SELECT d.source, k.keeper_id,
  CASE WHEN ('0x' || substr(md5('split:' || k.keeper_id::VARCHAR), 1, 15))::BIGINT % 100 < 80 THEN 'train'
       WHEN ('0x' || substr(md5('split:' || k.keeper_id::VARCHAR), 1, 15))::BIGINT % 100 < 90 THEN 'val'
       ELSE 'test' END AS split
  FROM documents d JOIN keep k ON d.doc_id = k.doc_id)
GROUP BY source, split ORDER BY source, split""",
    "q84_vocab_coverage" ->
      raw"""WITH freq AS (SELECT w, count(*) AS c FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents) GROUP BY w),
ranked AS (SELECT c, sum(c) OVER (ORDER BY c DESC, w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             row_number() OVER (ORDER BY c DESC, w) AS rk FROM freq),
tot AS (SELECT sum(c) AS tot, count(*) AS n_types FROM freq)
SELECT tot::BIGINT AS n_tokens, n_types::BIGINT AS n_types,
  min(CASE WHEN cum * 100 >= tot * 50 THEN rk END)::BIGINT AS types_p50,
  min(CASE WHEN cum * 100 >= tot * 90 THEN rk END)::BIGINT AS types_p90,
  min(CASE WHEN cum * 100 >= tot * 99 THEN rk END)::BIGINT AS types_p99
FROM ranked, tot GROUP BY tot, n_types ORDER BY n_tokens""",
    "q85_span_dedup" ->
      raw"""WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS w FROM documents),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM toks WHERE len(w) >= 5)),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
dpos AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
runs AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL THEN 5
              ELSE least(5, pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)) END AS contrib,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
               OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5 THEN 1 ELSE 0 END AS new_run
  FROM dpos)
SELECT t.doc_id, len(t.w)::BIGINT AS n_tok,
       coalesce(count(r.pos), 0)::BIGINT AS n_dup_grams,
       coalesce(sum(r.new_run), 0)::BIGINT AS n_runs,
       coalesce(sum(r.contrib), 0)::BIGINT AS n_dup_tokens,
       floor(coalesce(sum(r.contrib), 0)::DOUBLE / greatest(len(t.w), 1) * 10000.0) / 10000.0 AS dup_frac4
FROM toks t LEFT JOIN runs r USING (doc_id)
GROUP BY t.doc_id, len(t.w) ORDER BY t.doc_id""",
    "q86_bpe_pairs" ->
      raw"""WITH wf AS (SELECT w, count(*)::BIGINT AS c FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents) GROUP BY w)
SELECT substr(w, i, 1) AS l, substr(w, i+1, 1) AS r, sum(c)::BIGINT AS cnt
FROM (SELECT w, c, unnest(range(1, length(w))) AS i FROM wf WHERE length(w) >= 2)
GROUP BY l, r ORDER BY cnt DESC, l, r LIMIT 20""",
    "q87_bloom_decontaminate" ->
      raw"""WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS w FROM documents),
grams AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks WHERE len(w) >= 4)
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS g FROM toks WHERE len(w) BETWEEN 1 AND 3),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 83 = 7),
hits AS (SELECT DISTINCT g2.doc_id FROM grams g2 JOIN ev USING (g) WHERE g2.doc_id % 83 <> 7)
SELECT d.source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contam,
       sum(CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_clean
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 83 <> 7
GROUP BY d.source ORDER BY d.source""",
    "q88_bucketed_join" ->
      """SELECT c_nationkey::BIGINT AS c_nationkey, count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue2 FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q89_pruned_scan" ->
      """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars FROM documents WHERE source = 'src1' GROUP BY lang ORDER BY lang""",
    "q90_edit_distance" ->
      """SELECT id_a, id_b, CASE WHEN lev0 <= 300 THEN lev0 ELSE -1 END::BIGINT AS lev, CASE WHEN lev0 <= 300 THEN floor((1.0 - lev0::DOUBLE / mx) * 10000.0) / 10000.0 ELSE -1.0 END AS sim4 FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, levenshtein(a.text, b.text) AS lev0, greatest(length(a.text), length(b.text), 1) AS mx FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1) ORDER BY id_a""",
    "q91_countmin" ->
      raw"""WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents),
wf AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w),
bk AS (SELECT w, c, j, ('0x' || substr(md5('cms' || j::VARCHAR || ':' || w), 1, 15))::BIGINT % 128 AS b
       FROM wf, (SELECT unnest(range(0, 4)) AS j)),
sums AS (SELECT j, b, sum(c)::BIGINT AS s FROM bk GROUP BY j, b),
est AS (SELECT w, min(s)::BIGINT AS est FROM bk JOIN sums USING (j, b) GROUP BY w)
SELECT w, c AS cnt, est, (est - c)::BIGINT AS overcount
FROM wf JOIN est USING (w)
ORDER BY cnt DESC, w LIMIT 20""",
    "q92_interval_join" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, floor(value * 1000000.0)::BIGINT AS v_u FROM events),
win AS (SELECT user_id AS w_user, min(ts_us) AS lo, min(ts_us) + 86400000000 AS hi FROM ev WHERE event_type = 'purchase' AND user_id % 5 = 0 GROUP BY user_id)
SELECT w_user, lo, count(*) AS n_events, count(DISTINCT e.user_id) AS n_users, sum(e.v_u)::BIGINT AS sum_value_u
FROM win w JOIN ev e ON e.ts_us >= w.lo AND e.ts_us < w.hi
GROUP BY w_user, lo ORDER BY w_user""",
    "q93_importance_weights" ->
      raw"""WITH tok AS (SELECT doc_id, source, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents),
cf AS (SELECT w, count(*)::BIGINT AS cc FROM tok GROUP BY w),
tf AS (SELECT w, count(*)::BIGINT AS ct FROM tok WHERE source = 'src1' GROUP BY w),
tot AS (SELECT (SELECT sum(cc) FROM cf)::BIGINT AS ctot, (SELECT count(*) FROM cf)::BIGINT AS vsz, (SELECT coalesce(sum(ct), 0) FROM tf)::BIGINT AS ttot)
SELECT doc_id, count(*) AS n_tok, sum(lru)::BIGINT AS score_u, CASE WHEN sum(lru) > 0 THEN 1 ELSE 0 END AS keep
FROM (SELECT doc_id,
        floor(ln((coalesce(ct, 0) + 1)::DOUBLE / (ttot + vsz)::DOUBLE) * 1000000.0)::BIGINT
      - floor(ln((cc + 1)::DOUBLE / (ctot + vsz)::DOUBLE) * 1000000.0)::BIGINT AS lru
      FROM tok JOIN cf USING (w) LEFT JOIN tf USING (w) CROSS JOIN tot)
GROUP BY doc_id ORDER BY doc_id""",
    "q94_scd2_versions" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, floor(value * 1000000.0)::BIGINT AS v_u FROM events WHERE event_type = 'purchase')
SELECT user_id, row_number() OVER w AS version, v_u, ts_us AS valid_from_us,
       coalesce(lead(ts_us) OVER w, 9223372036854775807) AS valid_to_us,
       CASE WHEN lead(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
ORDER BY user_id, version""",
    "q95_pipeline_e2e" ->
      raw"""WITH m AS (SELECT doc_id, source, text, len(tk)::BIGINT AS n_tok, list_sum(list_transform(tk, x -> len(x)))::BIGINT AS sum_len,
             len(list_filter(tk, x -> list_contains(['the','a','of','and','is','to','in','that','it','with'], x)))::BIGINT AS n_stop
      FROM (SELECT doc_id, source, text, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS tk FROM documents)),
kept AS (SELECT * FROM m WHERE n_tok BETWEEN 20 AND 80 AND n_stop > 0 AND sum_len::DOUBLE / n_tok >= 3.0 AND sum_len::DOUBLE / n_tok <= 6.0),
uniq AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM kept) WHERE rn = 1),
sp AS (SELECT source, n_tok, CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       FROM (SELECT source, n_tok, ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS b FROM uniq))
SELECT source, split, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens FROM sp GROUP BY source, split ORDER BY source, split""",
    "q96_range_join_rewrite" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, floor(value * 1000000.0)::BIGINT AS v_u FROM events),
win AS (SELECT user_id AS w_user, min(ts_us) AS lo, min(ts_us) + 43200000000 AS hi FROM ev WHERE event_type = 'signup' AND user_id % 7 = 1 GROUP BY user_id)
SELECT w_user, lo, count(*) AS n_events, count(DISTINCT e.user_id) AS n_users, sum(e.v_u)::BIGINT AS sum_value_u
FROM win w JOIN ev e ON e.ts_us >= w.lo AND e.ts_us < w.hi
GROUP BY w_user, lo ORDER BY w_user""",
    "q97_dup_source_matrix" ->
      s"""WITH $LshVerifiedCtes, pairs AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 0.5)
SELECT least(da.source, db.source) AS src_a, greatest(da.source, db.source) AS src_b, count(*) AS n_pairs
FROM pairs p JOIN documents da ON p.id_a = da.doc_id JOIN documents db ON p.id_b = db.doc_id
GROUP BY src_a, src_b ORDER BY src_a, src_b""",
    "q98_curriculum" ->
      raw"""WITH tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents),
freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
tot AS (SELECT sum(c) AS tcnt, count(*) AS vsz FROM freq),
scored AS (SELECT doc_id, floor(sum(lpu)::DOUBLE / count(*) / 100.0) / 10000.0 AS avg_lp4
           FROM (SELECT doc_id, floor(ln((c + 1)::DOUBLE / (tcnt + vsz)::DOUBLE) * 1000000.0)::BIGINT AS lpu
                 FROM tok JOIN freq USING (w) CROSS JOIN tot)
           GROUP BY doc_id),
rk AS (SELECT avg_lp4, row_number() OVER (ORDER BY avg_lp4, doc_id) AS rk, count(*) OVER () AS n FROM scored)
SELECT ((rk - 1) * 10) // n AS bucket, count(*) AS n_docs, min(avg_lp4) AS lo_lp4, max(avg_lp4) AS hi_lp4
FROM rk GROUP BY bucket ORDER BY bucket""",
    "q99_temperature_mix" ->
      """WITH per AS (SELECT source, count(*)::BIGINT AS n_docs, floor(sqrt(count(*)::DOUBLE) * 1000.0)::BIGINT AS wq FROM documents GROUP BY source),
tot AS (SELECT sum(wq)::BIGINT AS wsum, sum(n_docs)::BIGINT AS n_tot FROM per),
rates AS (SELECT source, n_docs, least(1000000, (((n_tot * 6) // 10) * ((wq * 1000000) // wsum)) // n_docs)::BIGINT AS rate_ppm FROM per CROSS JOIN tot)
SELECT d.source, count(*) AS n_docs, min(rate_ppm)::BIGINT AS rate_ppm,
       sum(CASE WHEN ('0x' || substr(md5('mix:' || d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000000 < rate_ppm THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM documents d JOIN rates r ON d.source = r.source
GROUP BY d.source ORDER BY d.source""",
    "q100_data_card" ->
      raw"""WITH base AS (
  SELECT doc_id, source, lang, md5(text) AS h, len(tk)::BIGINT AS n_tok,
         coalesce(list_sum(list_transform(tk, x -> len(x))), 0)::BIGINT AS sum_len,
         len(list_filter(tk, x -> list_contains(['the','a','of','and','is','to','in','that','it','with'], x)))::BIGINT AS n_stop
  FROM (SELECT *, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS tk FROM documents)),
occ AS (SELECT h, count(*) AS n_occ FROM base GROUP BY h),
per AS (SELECT source, count(*) AS n_docs,
  sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
  sum(n_tok)::BIGINT AS n_toks,
  sum(CASE WHEN n_tok BETWEEN 20 AND 80 AND n_stop > 0 AND sum_len::DOUBLE / n_tok >= 3.0 AND sum_len::DOUBLE / n_tok <= 6.0 THEN 1 ELSE 0 END)::BIGINT AS n_quality
  FROM base JOIN occ USING (h) GROUP BY source),
ent AS (SELECT b.source, sum(floor(-(nl::DOUBLE / n_docs) * ln(nl::DOUBLE / n_docs) * 1000000.0)::BIGINT)::BIGINT AS entropy_u
  FROM (SELECT source, lang, count(*) AS nl FROM base GROUP BY source, lang) b
  JOIN (SELECT source, count(*) AS n_docs FROM base GROUP BY source) p ON b.source = p.source
  GROUP BY b.source),
tot AS (SELECT sum(n_toks)::BIGINT AS tot_toks FROM per)
SELECT per.source, n_docs, n_dup_docs, ((n_toks * 1000000) // tot_toks)::BIGINT AS tok_share_ppm, n_quality, entropy_u
FROM per JOIN ent ON per.source = ent.source CROSS JOIN tot ORDER BY per.source""",
    "q69_unigram_lm" ->
      raw"""WITH tok AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents),
freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
tot AS (SELECT sum(c) AS tcnt, count(*) AS vsz FROM freq)
SELECT doc_id, count(*) AS n_tok, sum(lpu)::BIGINT AS sum_lp_u,
       floor(sum(lpu)::DOUBLE / count(*) / 100.0) / 10000.0 AS avg_lp4
FROM (SELECT doc_id, floor(ln((c + 1)::DOUBLE / (tcnt + vsz)::DOUBLE) * 1000000.0)::BIGINT AS lpu
      FROM tok JOIN freq USING (w) CROSS JOIN tot)
GROUP BY doc_id ORDER BY doc_id""",
    "q55_corpus_profile" ->
      """SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs, quantile_cont(n_chars, 0.5) AS median_chars, quantile_cont(n_chars, 0.9) AS p90_chars, floor(avg(n_chars) * 10000.0)::BIGINT AS avg_chars_q, sum(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END)::BIGINT AS n_short FROM documents GROUP BY source ORDER BY source""",
    "q54_multimodal_frames" ->
      """SELECT doc_id, i AS frame_idx, md5(md5(text) || ':' || i::VARCHAR) AS frame_md5 FROM (SELECT doc_id, text, unnest(range(0, greatest(1, least(4, cast(ceil(octet_length(encode(text)) / 200.0) AS BIGINT))))) AS i FROM documents) ORDER BY doc_id, frame_idx""",
    "q101_retrieval_eval" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
truth AS (SELECT query_id, neighbor_id, rn FROM (SELECT q.query_id, e.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id) AS rn FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rn <= 10),
b AS (SELECT vec_id, embedding, list_sum(list_transform(range(0,4), p -> CASE WHEN list_sum(list_transform(range(0,64), i -> embedding[i+1]::DOUBLE * ((('0x' || substr(md5('plane:' || p::VARCHAR || ':' || i::VARCHAR),1,15))::BIGINT % 2001) - 1000) / 1000.0)) > 0 THEN (1::BIGINT << p) ELSE 0::BIGINT END))::BIGINT AS bucket FROM embeddings),
cand AS (SELECT query_id, neighbor_id, rn FROM (SELECT qq.query_id, e.vec_id AS neighbor_id, row_number() OVER (PARTITION BY qq.query_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qq.qv) DESC, e.vec_id) AS rn FROM b e JOIN (SELECT q.query_id, q.qv, b.bucket FROM q JOIN b ON b.vec_id = q.query_id) qq ON e.bucket = qq.bucket WHERE e.vec_id <> qq.query_id) WHERE rn <= 10),
hits AS (SELECT query_id, count(*) AS n_hit FROM truth t JOIN cand c USING (query_id, neighbor_id) GROUP BY query_id),
rr AS (SELECT t.query_id, coalesce(1.0::DOUBLE / c.rn::DOUBLE, 0.0) AS mrr FROM (SELECT query_id, neighbor_id FROM truth WHERE rn = 1) t LEFT JOIN cand c USING (query_id, neighbor_id))
SELECT q.query_id, coalesce(n_hit, 0)::BIGINT AS n_hit,
       floor(coalesce(n_hit, 0)::DOUBLE / 10.0 * 10000.0) / 10000.0 AS recall4,
       floor(coalesce(mrr, 0.0) * 10000.0) / 10000.0 AS mrr4
FROM q LEFT JOIN hits USING (query_id) LEFT JOIN rr USING (query_id) ORDER BY q.query_id""",
    "q102_hll_distinct" ->
      raw"""WITH tok AS (SELECT DISTINCT source, w FROM (SELECT source, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents)),
hashed AS (SELECT source, ('0x' || substr(md5('hll:' || w), 1, 15))::BIGINT AS h FROM tok),
br AS (SELECT source, h % 16 AS bkt, least(bit_count(((h >> 4) & -(h >> 4)) - 1), 47) + 1 AS rnk FROM hashed),
grid AS (SELECT source, i AS bkt FROM (SELECT DISTINCT source FROM documents) CROSS JOIN (SELECT unnest(range(0, 16)) AS i)),
regs AS (SELECT g.source, g.bkt, coalesce(max(rnk), 0) AS m FROM grid g LEFT JOIN br ON g.source = br.source AND g.bkt = br.bkt GROUP BY g.source, g.bkt),
agg AS (SELECT source, sum(1::BIGINT << (48 - m))::BIGINT AS s, sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros FROM regs GROUP BY source),
ex AS (SELECT source, count(DISTINCT w) AS n_exact FROM tok GROUP BY source)
SELECT source, n_exact, floor(est * 10000.0) / 10000.0 AS est4 FROM (
  SELECT a.source, n_exact,
    CASE WHEN (0.673::DOUBLE * 256.0 * 281474976710656.0 / s::DOUBLE) <= 40.0::DOUBLE AND zeros > 0
         THEN 16.0::DOUBLE * ln(16.0::DOUBLE / zeros::DOUBLE)
         ELSE (0.673::DOUBLE * 256.0 * 281474976710656.0 / s::DOUBLE) END AS est
  FROM agg a JOIN ex USING (source)) ORDER BY source""",
    "q103_topk_per_group" ->
      """SELECT source, rk, doc_id, n_chars FROM (SELECT source, doc_id, n_chars, row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk FROM documents) WHERE rk <= 3 ORDER BY source, rk""",
    "q104_weighted_sample" ->
      """SELECT row_number() OVER (ORDER BY skey, doc_id) AS rk, doc_id, source, w, skey FROM (SELECT doc_id, source, w, (eu * 1000) // w AS skey FROM (SELECT doc_id, source, greatest(n_chars, 1) AS w, floor(-ln(((('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 15))::BIGINT % 1048576) + 1)::DOUBLE / 1048576.0) * 1000000000.0)::BIGINT AS eu FROM documents)) ORDER BY skey, doc_id LIMIT 20""",
    "q105_semantic_dedup" ->
      """WITH kk AS (SELECT greatest(8, (count(*) + 63) // 64) AS k FROM embeddings),
cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS srn FROM embeddings) s, kk WHERE s.srn <= kk.k),
cells AS (SELECT vec_id, embedding, centroid_id FROM (SELECT e.vec_id, e.embedding, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents c) WHERE rn = 1),
dups AS (SELECT centroid_id, count(*) AS n_dup FROM (SELECT DISTINCT b.centroid_id, b.vec_id FROM cells a JOIN cells b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3) GROUP BY centroid_id)
SELECT s.centroid_id, n_vecs, coalesce(n_dup, 0)::BIGINT AS n_dup, (n_vecs - coalesce(n_dup, 0))::BIGINT AS n_kept
FROM (SELECT centroid_id, count(*) AS n_vecs FROM cells GROUP BY centroid_id) s LEFT JOIN dups USING (centroid_id) ORDER BY centroid_id""",
    "q106_zorder_layout" ->
      """WITH ev AS (SELECT event_id, user_id % 65536 AS x, (epoch_us(ts) // 3600000000) % 65536 AS y FROM events),
z AS (SELECT event_id, x, y, (list_sum(list_transform(range(0, 16), i -> CASE WHEN (x >> i) & 1 = 1 THEN (1::BIGINT << (2*i)) ELSE 0::BIGINT END)) + list_sum(list_transform(range(0, 16), i -> CASE WHEN (y >> i) & 1 = 1 THEN (1::BIGINT << (2*i+1)) ELSE 0::BIGINT END)))::BIGINT AS zval FROM ev),
rk AS (SELECT *, row_number() OVER (ORDER BY zval, event_id) AS rn, count(*) OVER () AS nt FROM z)
SELECT ((rn - 1) * 32) // nt AS file_id, count(*) AS n, min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo, max(y) AS y_hi, min(zval) AS z_lo, max(zval) AS z_hi
FROM rk GROUP BY file_id ORDER BY file_id""",
    "q107_bigram_lm" ->
      raw"""WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS w FROM documents),
bi AS (SELECT doc_id, w[i-1] AS p, w[i] AS c FROM (SELECT doc_id, unnest(range(2, len(w)+1)) AS i, w FROM tk WHERE len(w) >= 2)),
bic AS (SELECT p, c, count(*) AS cbi FROM bi GROUP BY p, c),
prevc AS (SELECT p, sum(cbi)::BIGINT AS cp FROM bic GROUP BY p),
curc AS (SELECT c, sum(cbi)::BIGINT AS cc FROM bic GROUP BY c),
tot AS (SELECT sum(cbi)::BIGINT AS nbi FROM bic)
SELECT doc_id, count(*) AS n_bi, sum(lpu)::BIGINT AS sum_lp_u, floor(sum(lpu)::DOUBLE / count(*) / 100.0) / 10000.0 AS avg_lp4
FROM (SELECT doc_id, floor(ln(0.7::DOUBLE * (cbi::DOUBLE / cp::DOUBLE) + 0.3::DOUBLE * (cc::DOUBLE / nbi::DOUBLE)) * 1000000.0)::BIGINT AS lpu
      FROM bi JOIN bic USING (p, c) JOIN prevc USING (p) JOIN curc USING (c) CROSS JOIN tot)
GROUP BY doc_id ORDER BY doc_id""",
    "q108_dup_pagerank" ->
      s"""WITH $LshVerifiedCtes, prs AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 0.5),
edges AS (SELECT src, dst FROM (SELECT id_a AS src, id_b AS dst FROM prs UNION SELECT id_b, id_a FROM prs) WHERE src <> dst),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT src AS id, deg, 1000000::BIGINT AS rank_u FROM deg),
c1 AS (SELECT e.dst, sum(r.rank_u // r.deg)::BIGINT AS m FROM edges e JOIN r0 r ON e.src = r.id GROUP BY e.dst),
r1 AS (SELECT r.id, r.deg, (150000 + (85 * coalesce(m, 0)) // 100)::BIGINT AS rank_u FROM r0 r LEFT JOIN c1 ON r.id = c1.dst),
c2 AS (SELECT e.dst, sum(r.rank_u // r.deg)::BIGINT AS m FROM edges e JOIN r1 r ON e.src = r.id GROUP BY e.dst),
r2 AS (SELECT r.id, r.deg, (150000 + (85 * coalesce(m, 0)) // 100)::BIGINT AS rank_u FROM r1 r LEFT JOIN c2 ON r.id = c2.dst),
c3 AS (SELECT e.dst, sum(r.rank_u // r.deg)::BIGINT AS m FROM edges e JOIN r2 r ON e.src = r.id GROUP BY e.dst),
r3 AS (SELECT r.id, r.deg, (150000 + (85 * coalesce(m, 0)) // 100)::BIGINT AS rank_u FROM r2 r LEFT JOIN c3 ON r.id = c3.dst)
SELECT id AS doc_id, deg, rank_u FROM r3 ORDER BY rank_u DESC, doc_id LIMIT 20""",
    "q109_embedding_outliers" ->
      """WITH cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
cells AS (SELECT vec_id, centroid_id, floor(sc * 10000.0)::BIGINT AS cos4 FROM (SELECT e.vec_id, c.centroid_id, list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS sc, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents c) WHERE rn = 1),
stats AS (SELECT centroid_id, count(*)::BIGINT AS n, sum(cos4)::BIGINT AS s1, sum(cos4 * cos4)::BIGINT AS s2 FROM cells GROUP BY centroid_id)
SELECT centroid_id, min(n)::BIGINT AS n_vecs,
       sum(CASE WHEN n * cos4 < s1 AND (n * cos4 - s1) * (n * cos4 - s1) > 4 * (n * s2 - s1 * s1) THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM cells JOIN stats USING (centroid_id) GROUP BY centroid_id ORDER BY centroid_id""",
    "q110_bpe_encode" -> {
      val chain = BpeMerges.foldLeft(
        "array_to_string(list_transform(range(1, length(w)+1), i -> w[i]), chr(31))") {
        case (acc, (l, r)) => s"replace($acc, '$l'||chr(31)||'$r', '$l$r')"
      }
      raw"""WITH tk AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents),
enc AS (SELECT w, length(w)::BIGINT AS nc, len(string_split($chain, chr(31)))::BIGINT AS ns FROM (SELECT DISTINCT w FROM tk))
SELECT doc_id, count(*) AS n_words, sum(nc)::BIGINT AS n_chars, sum(ns)::BIGINT AS n_syms,
       floor(sum(ns)::DOUBLE / sum(nc)::DOUBLE * 10000.0) / 10000.0 AS ratio4
FROM tk JOIN enc USING (w) GROUP BY doc_id ORDER BY doc_id"""
    },
    "q111_matryoshka_eval" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, (embedding[1:16])::DOUBLE[] AS qv16 FROM embeddings WHERE vec_id < 10),
truth AS (SELECT query_id, neighbor_id, rn FROM (SELECT q.query_id, e.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id) AS rn FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rn <= 10),
cand AS (SELECT query_id, neighbor_id, rn FROM (SELECT q.query_id, e.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity((e.embedding[1:16])::DOUBLE[], q.qv16) DESC, e.vec_id) AS rn FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rn <= 10),
hits AS (SELECT query_id, count(*) AS n_hit FROM truth t JOIN cand c USING (query_id, neighbor_id) GROUP BY query_id),
rr AS (SELECT t.query_id, coalesce(1.0::DOUBLE / c.rn::DOUBLE, 0.0) AS mrr FROM (SELECT query_id, neighbor_id FROM truth WHERE rn = 1) t LEFT JOIN cand c USING (query_id, neighbor_id))
SELECT q.query_id, coalesce(n_hit, 0)::BIGINT AS n_hit,
       floor(coalesce(n_hit, 0)::DOUBLE / 10.0 * 10000.0) / 10000.0 AS recall4,
       floor(coalesce(mrr, 0.0) * 10000.0) / 10000.0 AS mrr4
FROM q LEFT JOIN hits USING (query_id) LEFT JOIN rr USING (query_id) ORDER BY q.query_id""",
    "q112_mergeable_stats" ->
      raw"""WITH tokall AS (SELECT source, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents),
cnt AS (SELECT source, count(*)::BIGINT AS n_tok FROM tokall GROUP BY source),
hashed AS (SELECT source, ('0x' || substr(md5('hll:' || w), 1, 15))::BIGINT AS h FROM (SELECT DISTINCT source, w FROM tokall)),
br AS (SELECT source, h % 16 AS bkt, least(bit_count(((h >> 4) & -(h >> 4)) - 1), 47) + 1 AS rnk FROM hashed),
grid AS (SELECT source, i AS bkt FROM (SELECT DISTINCT source FROM documents) CROSS JOIN (SELECT unnest(range(0, 16)) AS i)),
regs AS (SELECT g.source, g.bkt, coalesce(max(rnk), 0) AS m FROM grid g LEFT JOIN br ON g.source = br.source AND g.bkt = br.bkt GROUP BY g.source, g.bkt),
agg AS (SELECT source, sum(1::BIGINT << (48 - m))::BIGINT AS s, sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros FROM regs GROUP BY source)
SELECT source, n_tok, floor(est * 10000.0) / 10000.0 AS est4 FROM (
  SELECT a.source, n_tok,
    CASE WHEN (0.673::DOUBLE * 256.0 * 281474976710656.0 / s::DOUBLE) <= 40.0::DOUBLE AND zeros > 0
         THEN 16.0::DOUBLE * ln(16.0::DOUBLE / zeros::DOUBLE)
         ELSE (0.673::DOUBLE * 256.0 * 281474976710656.0 / s::DOUBLE) END AS est
  FROM agg a JOIN cnt USING (source)) ORDER BY source""",
    "q113_phrase_search" ->
      raw"""WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS toks FROM documents),
occ AS (SELECT 'table scan' AS phrase, doc_id, list_filter(range(1, len(toks)+1), i -> toks[i] = 'table' AND toks[i+1] = 'scan') AS hits FROM tk
        UNION ALL
        SELECT 'hash join' AS phrase, doc_id, list_filter(range(1, len(toks)+1), i -> toks[i] = 'hash' AND toks[i+1] = 'join') AS hits FROM tk)
SELECT phrase, doc_id, len(hits)::BIGINT AS n_occ, list_min(hits)::BIGINT AS first_pos
FROM occ WHERE len(hits) > 0 ORDER BY phrase, n_occ DESC, doc_id""",
    "q114_padded_batches" ->
      raw"""WITH d AS (SELECT doc_id, len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != ''))::BIGINT AS tc FROM documents),
c AS (SELECT doc_id, tc, (CASE WHEN tc <= 16 THEN 16 WHEN tc <= 32 THEN 32 WHEN tc <= 64 THEN 64 WHEN tc <= 128 THEN 128 WHEN tc <= 256 THEN 256 WHEN tc <= 512 THEN 512 ELSE 1024 END)::BIGINT AS cap FROM d),
r AS (SELECT doc_id, tc, cap, row_number() OVER (PARTITION BY cap ORDER BY doc_id) AS rn FROM c)
SELECT cap, ((rn - 1) // 8)::BIGINT AS batch_id, count(*)::BIGINT AS n_seqs, sum(tc)::BIGINT AS n_tok,
       (count(*) * cap - sum(tc))::BIGINT AS n_pad,
       floor(sum(tc)::DOUBLE / (count(*) * cap)::DOUBLE * 10000.0) / 10000.0 AS eff4
FROM r GROUP BY cap, batch_id ORDER BY cap, batch_id""",
    "q115_containment" ->
      s"""WITH $LshVerifiedCtes,
sh AS (SELECT doc_id, list_distinct(CASE WHEN length(text) < 5 THEN [text] ELSE list_transform(range(1, length(text)-3), i -> substr(text, i, 5)) END) AS g FROM documents),
scored AS (SELECT id_a, id_b,
  floor(len(list_intersect(a.g, b.g))::DOUBLE / len(a.g) * 10000.0) / 10000.0 AS cont_ab4,
  floor(len(list_intersect(b.g, a.g))::DOUBLE / len(b.g) * 10000.0) / 10000.0 AS cont_ba4,
  floor(len(list_intersect(a.g, b.g))::DOUBLE / len(list_distinct(a.g || b.g)) * 10000.0) / 10000.0 AS jac4
FROM cand JOIN sh a ON a.doc_id = id_a JOIN sh b ON b.doc_id = id_b)
SELECT id_a, id_b, cont_ab4, cont_ba4, jac4 FROM scored WHERE greatest(cont_ab4, cont_ba4) >= 0.8 ORDER BY id_a, id_b""",
    "q116_sliding_windows" ->
      raw"""WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS toks FROM documents),
st AS (SELECT doc_id, toks, CASE WHEN len(toks) < 24 THEN [1] ELSE range(1, len(toks) - 22, 16) END AS starts FROM tk),
w AS (SELECT doc_id, toks, unnest(starts) AS start FROM st)
SELECT doc_id, ((start - 1) // 16)::BIGINT AS win_id, start::BIGINT AS start,
       least(24, len(toks) - start + 1)::BIGINT AS n_tok,
       ('0x' || substr(md5(array_to_string(toks[start : start + 23], ' ')), 1, 15))::BIGINT AS fp
FROM w ORDER BY doc_id, win_id""",
    "q117_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
s1 AS (SELECT user_id, min(ts_us) AS ts_1 FROM ev WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT s1.user_id, ts_1, min(CASE WHEN e.ts_us > ts_1 THEN e.ts_us END) AS ts_2 FROM s1 LEFT JOIN ev e ON e.user_id = s1.user_id AND e.event_type = 'view' GROUP BY s1.user_id, ts_1),
s3 AS (SELECT s2.user_id, ts_1, ts_2, min(CASE WHEN e.ts_us > ts_2 THEN e.ts_us END) AS ts_3 FROM s2 LEFT JOIN ev e ON e.user_id = s2.user_id AND e.event_type = 'purchase' GROUP BY s2.user_id, ts_1, ts_2)
SELECT user_id, ts_1, ts_2, ts_3, (CASE WHEN ts_3 IS NOT NULL THEN 3 WHEN ts_2 IS NOT NULL THEN 2 ELSE 1 END)::BIGINT AS stage FROM s3 ORDER BY user_id""",
    "q118_dedup_survivors" ->
      s"""WITH RECURSIVE $LshVerifiedCtes,
good AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 1.0),
edges AS (SELECT id_a AS src, id_b AS dst FROM good UNION ALL SELECT id_b AS src, id_a AS dst FROM good),
reach AS (SELECT doc_id AS id, doc_id AS r FROM documents UNION SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id),
cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
j AS (SELECT cl.cluster_id, d.doc_id, d.n_chars FROM cl JOIN documents d USING (doc_id)),
rk AS (SELECT cluster_id, doc_id, n_chars, row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn, count(*) OVER (PARTITION BY cluster_id) AS n_members FROM j)
SELECT cluster_id, n_members::BIGINT AS n_members, doc_id AS survivor_id, n_chars AS survivor_chars FROM rk WHERE rn = 1 AND n_members >= 2 ORDER BY cluster_id""",
    "q119_token_shards" ->
      raw"""WITH d AS (SELECT doc_id, len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != ''))::BIGINT AS tc FROM documents),
c AS (SELECT doc_id, tc, sum(tc) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
SELECT ((cum - tc) // 20000)::BIGINT AS shard_id, count(*)::BIGINT AS n_docs, sum(tc)::BIGINT AS n_tok, min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY shard_id ORDER BY shard_id""",
    "q120_rendezvous_shards" ->
      """WITH a AS (SELECT doc_id,
  (-(list_max(list_transform(range(0, 8), s -> {'h': ('0x' || substr(md5(doc_id::VARCHAR || ':' || s::VARCHAR), 1, 15))::BIGINT, 'neg_sid': -s}))).neg_sid)::BIGINT AS shard_id,
  (-(list_max(list_transform(range(0, 9), s -> {'h': ('0x' || substr(md5(doc_id::VARCHAR || ':' || s::VARCHAR), 1, 15))::BIGINT, 'neg_sid': -s}))).neg_sid)::BIGINT AS shard_grown
FROM documents)
SELECT shard_id, count(*)::BIGINT AS n_docs, sum(CASE WHEN shard_id <> shard_grown THEN 1 ELSE 0 END)::BIGINT AS n_moved
FROM a GROUP BY shard_id ORDER BY shard_id""",
    "q121_point_in_time" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS vf, floor(value * 1000000.0)::BIGINT AS v_u,
                  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)::BIGINT AS version,
                  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS vt
           FROM events WHERE event_type = 'purchase'),
v AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'view')
SELECT v.event_id, v.user_id, v.ts_us, coalesce(p.version, 0)::BIGINT AS version, p.v_u AS v_u
FROM v LEFT JOIN p ON p.user_id = v.user_id AND v.ts_us >= p.vf AND (p.vt IS NULL OR v.ts_us < p.vt)
ORDER BY v.event_id""",
    "q122_gram_matrix" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> floor(x::DOUBLE * 10000.0)::BIGINT) AS e4 FROM embeddings),
x AS (SELECT vec_id, i, e4[i+1] AS vi, j, e4[j+1] AS vj FROM e, (SELECT unnest(range(0,64)) AS i), (SELECT unnest(range(0,64)) AS j) WHERE j >= i)
SELECT i::BIGINT AS i, j::BIGINT AS j, count(*)::BIGINT AS n_vecs, sum(vi*vj)::BIGINT AS s_ij, sum(vi)::BIGINT AS s_i, sum(vj)::BIGINT AS s_j, (count(*) * sum(vi*vj) - sum(vi)*sum(vj))::BIGINT AS cov_num
FROM x GROUP BY i, j ORDER BY i, j""",
    "q123_corpus_manifest" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
       bit_xor(('0x' || substr(md5(doc_id::VARCHAR || ':' || text), 1, 15))::BIGINT) AS content_sig,
       sum(n_chars)::BIGINT AS sum_chars, min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents GROUP BY source ORDER BY source""",
    "q129_skew_report" ->
      """WITH c AS (SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY user_id),
t AS (SELECT count(*)::BIGINT AS total FROM events),
r AS (SELECT user_id, c, row_number() OVER (ORDER BY c DESC, user_id) AS rank FROM c)
SELECT rank::BIGINT AS rank, user_id, c AS n_rows, (c * 10000) // total AS share4u,
       (CASE WHEN c * 32 > total THEN 1 ELSE 0 END)::INT AS hot_at_32
FROM r, t WHERE rank <= 5 ORDER BY rank""",
    // q130 merges half-corpus manifests; the contract is equality with the
    // DIRECT whole-corpus manifest — so the oracle is exactly q123's query
    "q130_manifest_merge" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
       bit_xor(('0x' || substr(md5(doc_id::VARCHAR || ':' || text), 1, 15))::BIGINT) AS content_sig,
       sum(n_chars)::BIGINT AS sum_chars, min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents GROUP BY source ORDER BY source""",
    // q135 replays the sampled-rank boundary derivation and counts
    // boundaries <= v per row as the bucket id
    "q135_range_partition" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS v FROM events),
samp AS (SELECT v, event_id FROM ev WHERE ('0x' || substr(md5('rp:' || event_id::VARCHAR), 1, 15))::BIGINT % 5 = 0),
rk AS (SELECT v, row_number() OVER (ORDER BY v, event_id) AS rn, count(*) OVER () AS m FROM samp),
bnd AS (SELECT r.v AS b FROM rk r JOIN (SELECT unnest(range(1, 8)) AS i) s ON r.rn = greatest((s.i * r.m) // 8, 1)),
asg AS (SELECT e.v, (SELECT count(*) FROM bnd WHERE e.v >= bnd.b)::BIGINT AS bucket FROM ev e),
tot AS (SELECT count(*)::BIGINT AS t FROM ev)
SELECT bucket, count(*)::BIGINT AS n_rows, (count(*) * 10000 // t)::BIGINT AS share_bp, min(v) AS v_lo, max(v) AS v_hi
FROM asg, tot GROUP BY bucket, t ORDER BY bucket""",
    // q134 rebuilds both layouts with q106's morton formula and makes the
    // same manifest-only skip decision per file
    "q134_zonemap_skip" ->
      """WITH ev AS (SELECT event_id, user_id % 65536 AS x, (epoch_us(ts) // 3600000000) % 65536 AS y FROM events),
b AS (SELECT min(x) + (max(x) - min(x)) // 8 AS xlo, min(x) + 3 * (max(x) - min(x)) // 8 AS xhi,
             min(y) + (max(y) - min(y)) // 8 AS ylo, min(y) + 3 * (max(y) - min(y)) // 8 AS yhi FROM ev),
lin AS (SELECT x, y, ((rn - 1) * 32) // nt AS file_id FROM (SELECT *, row_number() OVER (ORDER BY x, event_id) AS rn, count(*) OVER () AS nt FROM ev)),
z AS (SELECT event_id, x, y, (list_sum(list_transform(range(0, 16), i -> CASE WHEN (x >> i) & 1 = 1 THEN (1::BIGINT << (2*i)) ELSE 0::BIGINT END)) + list_sum(list_transform(range(0, 16), i -> CASE WHEN (y >> i) & 1 = 1 THEN (1::BIGINT << (2*i+1)) ELSE 0::BIGINT END)))::BIGINT AS zval FROM ev),
zo AS (SELECT x, y, ((rn - 1) * 32) // nt AS file_id FROM (SELECT *, row_number() OVER (ORDER BY zval, event_id) AS rn, count(*) OVER () AS nt FROM z)),
linf AS (SELECT file_id, count(*)::BIGINT AS n, min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo, max(y) AS y_hi,
         sum(CASE WHEN x BETWEEN b.xlo AND b.xhi AND y BETWEEN b.ylo AND b.yhi THEN 1 ELSE 0 END)::BIGINT AS n_match
         FROM lin, b GROUP BY file_id),
zof AS (SELECT file_id, count(*)::BIGINT AS n, min(x) AS x_lo, max(x) AS x_hi, min(y) AS y_lo, max(y) AS y_hi,
        sum(CASE WHEN x BETWEEN b.xlo AND b.xhi AND y BETWEEN b.ylo AND b.yhi THEN 1 ELSE 0 END)::BIGINT AS n_match
        FROM zo, b GROUP BY file_id),
lsum AS (SELECT count(*)::BIGINT AS n_files,
         sum(CASE WHEN x_hi < b.xlo OR x_lo > b.xhi OR y_hi < b.ylo OR y_lo > b.yhi THEN 1 ELSE 0 END)::BIGINT AS n_skipped,
         sum(CASE WHEN x_hi < b.xlo OR x_lo > b.xhi OR y_hi < b.ylo OR y_lo > b.yhi THEN 0 ELSE n END)::BIGINT AS rows_scanned,
         sum(n_match)::BIGINT AS rows_matched FROM linf, b),
zsum AS (SELECT count(*)::BIGINT AS n_files,
         sum(CASE WHEN x_hi < b.xlo OR x_lo > b.xhi OR y_hi < b.ylo OR y_lo > b.yhi THEN 1 ELSE 0 END)::BIGINT AS n_skipped,
         sum(CASE WHEN x_hi < b.xlo OR x_lo > b.xhi OR y_hi < b.ylo OR y_lo > b.yhi THEN 0 ELSE n END)::BIGINT AS rows_scanned,
         sum(n_match)::BIGINT AS rows_matched FROM zof, b)
SELECT 'linear' AS layout, n_files, n_skipped, rows_scanned, rows_matched FROM lsum
UNION ALL SELECT 'zorder', n_files, n_skipped, rows_scanned, rows_matched FROM zsum
ORDER BY layout""",
    // q133 replays the greedy integer argmax as three unrolled picks —
    // recursion-free, so each step is plain window+join SQL
    "q133_mmr_rerank" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id IN (0,1,2)),
cand AS (SELECT query_id, neighbor_id, rel_u FROM (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         floor(list_cosine_similarity(e.embedding::DOUBLE[], q.qv) * 10000.0)::BIGINT AS rel_u,
         row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id) AS rn
  FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rn <= 8),
pair AS (SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
         floor(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) * 10000.0)::BIGINT AS sim_u
  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
  JOIN embeddings ea ON ea.vec_id = a.neighbor_id
  JOIN embeddings eb ON eb.vec_id = b.neighbor_id),
p1 AS (SELECT query_id, neighbor_id, 7 * rel_u AS mmr_u FROM (
  SELECT query_id, neighbor_id, rel_u, row_number() OVER (PARTITION BY query_id ORDER BY rel_u DESC, neighbor_id) AS rn FROM cand) WHERE rn = 1),
pen2 AS (SELECT c.query_id, c.neighbor_id, 7 * c.rel_u - 3 * max(p.sim_u) AS mmr_u
  FROM cand c JOIN p1 s ON c.query_id = s.query_id AND c.neighbor_id <> s.neighbor_id
  JOIN pair p ON p.query_id = c.query_id AND p.id_a = s.neighbor_id AND p.id_b = c.neighbor_id
  GROUP BY c.query_id, c.neighbor_id, c.rel_u),
p2 AS (SELECT query_id, neighbor_id, mmr_u FROM (
  SELECT query_id, neighbor_id, mmr_u, row_number() OVER (PARTITION BY query_id ORDER BY mmr_u DESC, neighbor_id) AS rn FROM pen2) WHERE rn = 1),
sel2 AS (SELECT query_id, neighbor_id FROM p1 UNION ALL SELECT query_id, neighbor_id FROM p2),
pen3 AS (SELECT c.query_id, c.neighbor_id, 7 * c.rel_u - 3 * max(p.sim_u) AS mmr_u
  FROM cand c JOIN sel2 s ON c.query_id = s.query_id
  JOIN pair p ON p.query_id = c.query_id AND p.id_a = s.neighbor_id AND p.id_b = c.neighbor_id
  WHERE NOT EXISTS (SELECT 1 FROM sel2 x WHERE x.query_id = c.query_id AND x.neighbor_id = c.neighbor_id)
  GROUP BY c.query_id, c.neighbor_id, c.rel_u),
p3 AS (SELECT query_id, neighbor_id, mmr_u FROM (
  SELECT query_id, neighbor_id, mmr_u, row_number() OVER (PARTITION BY query_id ORDER BY mmr_u DESC, neighbor_id) AS rn FROM pen3) WHERE rn = 1)
SELECT query_id, 1::BIGINT AS pick_rank, neighbor_id, mmr_u::BIGINT AS mmr_u FROM p1
UNION ALL SELECT query_id, 2::BIGINT, neighbor_id, mmr_u::BIGINT FROM p2
UNION ALL SELECT query_id, 3::BIGINT, neighbor_id, mmr_u::BIGINT FROM p3
ORDER BY query_id, pick_rank""",
    // q132's salting must be output-invisible: the oracle is the PLAIN join
    "q132_salted_join" ->
      """WITH dim AS (SELECT source, max(n_chars) AS max_chars FROM documents GROUP BY source)
SELECT d.source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN d.n_chars * 10 >= dm.max_chars * 9 THEN 1 ELSE 0 END)::BIGINT AS n_near_max,
       min(dm.max_chars)::BIGINT AS max_chars
FROM documents d JOIN dim dm USING (source)
GROUP BY d.source ORDER BY d.source""",
    // q131 rewrites with gram TEXT where Spark uses xxhash64 — same
    // duplication + survivor decisions (2^-64 residual, as q85)
    "q131_span_dedup_apply" ->
      raw"""WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS w FROM documents),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM toks WHERE len(w) >= 5)),
occ AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY g) AS n_occ
  FROM grams),
drops AS (SELECT doc_id, pos FROM occ WHERE n_occ >= 2 AND rn >= 2),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
               OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5 THEN 1 ELSE 0 END AS new_run
  FROM drops),
runs AS (
  SELECT doc_id, run_id, min(pos) AS s, max(pos) + 4 AS e
  FROM (SELECT doc_id, pos, sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id FROM marked)
  GROUP BY doc_id, run_id),
covered AS (SELECT doc_id, unnest(range(s, e + 1)) AS p FROM runs),
tok AS (SELECT doc_id, idx, w[idx] AS tk
        FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS idx FROM toks)),
kept AS (
  SELECT t.doc_id, t.idx, t.tk
  FROM tok t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.idx = c.p
  WHERE c.p IS NULL)
SELECT d.doc_id, len(d.w)::BIGINT AS n_tok,
       coalesce(count(k.idx), 0)::BIGINT AS n_kept,
       (len(d.w) - coalesce(count(k.idx), 0))::BIGINT AS n_dropped,
       coalesce(string_agg(k.tk, ' ' ORDER BY k.idx), '') AS text_clean
FROM toks d LEFT JOIN kept k USING (doc_id)
GROUP BY d.doc_id, len(d.w) ORDER BY d.doc_id""",
    "q127_log_histogram" ->
      """WITH h AS (SELECT event_type, length(bin(greatest(floor(value * 100.0)::BIGINT, 0))) AS bucket, count(*)::BIGINT AS c FROM events GROUP BY 1, 2),
cum AS (SELECT event_type, bucket, c, sum(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum, sum(c) OVER (PARTITION BY event_type) AS n FROM h)
SELECT event_type, min(n)::BIGINT AS n_events,
       min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN (1::BIGINT << (bucket - 1)) END)::BIGINT AS p50_lb100,
       min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN (1::BIGINT << (bucket - 1)) END)::BIGINT AS p90_lb100,
       min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN (1::BIGINT << (bucket - 1)) END)::BIGINT AS p99_lb100
FROM cum GROUP BY event_type ORDER BY event_type""",
    "q128_sketch_overlap" ->
      raw"""WITH tok AS (SELECT source, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents WHERE source IN ('src0','src1','src2','src3','src4')),
hashed AS (SELECT source, ('0x' || substr(md5('hll:' || w), 1, 15))::BIGINT AS h FROM (SELECT DISTINCT source, w FROM tok)),
br AS (SELECT source, h % 64 AS bkt, least(bit_count(((h >> 6) & -(h >> 6)) - 1), 47) + 1 AS rnk FROM hashed),
grid AS (SELECT source, i AS bkt FROM (SELECT DISTINCT source FROM tok) CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
regs AS (SELECT g.source, g.bkt, coalesce(max(rnk), 0) AS m FROM grid g LEFT JOIN br ON g.source = br.source AND g.bkt = br.bkt GROUP BY g.source, g.bkt),
est1 AS (SELECT source, sum(1::BIGINT << (48 - m))::BIGINT AS s, sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros FROM regs GROUP BY source),
esta AS (SELECT source, floor((CASE WHEN (0.709::DOUBLE * 4096.0 * 281474976710656.0 / s::DOUBLE) <= 160.0::DOUBLE AND zeros > 0 THEN 64.0::DOUBLE * ln(64.0::DOUBLE / zeros::DOUBLE) ELSE (0.709::DOUBLE * 4096.0 * 281474976710656.0 / s::DOUBLE) END) * 10000.0)::BIGINT AS e4 FROM est1),
upair AS (SELECT a.source AS src_a, b.source AS src_b, ra.bkt, greatest(ra.m, rb.m) AS m
          FROM (SELECT DISTINCT source FROM tok) a JOIN (SELECT DISTINCT source FROM tok) b ON a.source < b.source
          JOIN regs ra ON ra.source = a.source JOIN regs rb ON rb.source = b.source AND rb.bkt = ra.bkt),
uest1 AS (SELECT src_a, src_b, sum(1::BIGINT << (48 - m))::BIGINT AS s, sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros FROM upair GROUP BY src_a, src_b),
uest AS (SELECT src_a, src_b, floor((CASE WHEN (0.709::DOUBLE * 4096.0 * 281474976710656.0 / s::DOUBLE) <= 160.0::DOUBLE AND zeros > 0 THEN 64.0::DOUBLE * ln(64.0::DOUBLE / zeros::DOUBLE) ELSE (0.709::DOUBLE * 4096.0 * 281474976710656.0 / s::DOUBLE) END) * 10000.0)::BIGINT AS eu FROM uest1),
vocab AS (SELECT DISTINCT source, w FROM tok),
exact AS (SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS n_inter_exact FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source GROUP BY 1, 2)
SELECT u.src_a, u.src_b, coalesce(x.n_inter_exact, 0)::BIGINT AS n_inter_exact,
       ea.e4::DOUBLE / 10000.0 AS est_a4, eb.e4::DOUBLE / 10000.0 AS est_b4, u.eu::DOUBLE / 10000.0 AS est_u4,
       greatest(ea.e4 + eb.e4 - u.eu, 0)::DOUBLE / 10000.0 AS est_i4
FROM uest u JOIN esta ea ON ea.source = u.src_a JOIN esta eb ON eb.source = u.src_b
LEFT JOIN exact x ON x.src_a = u.src_a AND x.src_b = u.src_b
ORDER BY u.src_a, u.src_b""",
    "q125_dense_timeseries" ->
      """WITH ev AS (SELECT epoch_us(ts) // 3600000000 AS hour_idx, event_type FROM events),
c AS (SELECT hour_idx, count(*)::BIGINT AS n_errors FROM ev WHERE event_type = 'error' GROUP BY hour_idx),
spine AS (SELECT unnest(range((SELECT min(hour_idx) FROM ev), (SELECT max(hour_idx) FROM ev) + 1)) AS hour_idx)
SELECT s.hour_idx, coalesce(c.n_errors, 0)::BIGINT AS n_errors
FROM spine s LEFT JOIN c USING (hour_idx) ORDER BY s.hour_idx""",
    "q126_cohort_retention" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_idx FROM events),
coh AS (SELECT user_id, min(day_idx) AS cohort_day FROM ev GROUP BY user_id),
act AS (SELECT DISTINCT ev.user_id, cohort_day, day_idx - cohort_day AS age_days FROM ev JOIN coh USING (user_id))
SELECT cohort_day, age_days, count(*)::BIGINT AS n_active
FROM act WHERE age_days <= 7 GROUP BY cohort_day, age_days ORDER BY cohort_day, age_days""",
    "q124_keyed_interval" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS vf,
                  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)::BIGINT AS version,
                  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS vt
           FROM events WHERE event_type = 'purchase'),
v AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'view')
SELECT v.event_id, v.user_id, v.ts_us, p.version
FROM v JOIN p ON p.user_id = v.user_id AND p.vt IS NOT NULL AND v.ts_us >= p.vf AND v.ts_us < p.vt
ORDER BY v.event_id""",
    "q51_app_log" ->
      """SELECT component, log_status, n_entries, n_runs FROM (
  SELECT 'pipeline1' AS component, 'Info' AS log_status, 2*count(DISTINCT source) AS n_entries, 1::BIGINT AS n_runs FROM documents
  UNION ALL
  SELECT 'pipeline1', 'Error', count(*), 1::BIGINT FROM (SELECT source, max(n_chars) AS mx FROM documents GROUP BY source) WHERE mx > 350
  UNION ALL
  SELECT 'pipeline2', 'Info', 1::BIGINT, 1::BIGINT
) WHERE n_entries > 0 ORDER BY component, log_status""",
    // q136: ratios are integer micro-fractions, so the flags are exact
    "q136_repetition_rules" ->
      raw"""WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS w FROM documents),
base AS (SELECT doc_id, len(w)::BIGINT AS n_tok, w FROM tk),
t1 AS (SELECT doc_id, max(c)::BIGINT AS top1_cnt FROM (SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, unnest(w) AS g FROM base) GROUP BY doc_id, g) GROUP BY doc_id),
t2 AS (SELECT doc_id, max(c)::BIGINT AS top2_cnt FROM (SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM base WHERE len(w) >= 2)) GROUP BY doc_id, g) GROUP BY doc_id),
t5 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup5_cnt FROM (SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS g FROM (SELECT doc_id, w, unnest(range(1, len(w)-3)) AS i FROM base WHERE len(w) >= 5)) GROUP BY doc_id, g) GROUP BY doc_id),
u AS (SELECT b.doc_id, b.n_tok,
  CASE WHEN b.n_tok > 0 THEN (coalesce(top1_cnt, 0) * 10000) // b.n_tok ELSE 0 END AS top1_u,
  CASE WHEN b.n_tok >= 2 THEN (coalesce(top2_cnt, 0) * 2 * 10000) // b.n_tok ELSE 0 END AS top2_u,
  CASE WHEN b.n_tok >= 5 THEN (coalesce(dup5_cnt, 0) * 10000) // (b.n_tok - 4) ELSE 0 END AS dup5_u
  FROM base b LEFT JOIN t1 USING (doc_id) LEFT JOIN t2 USING (doc_id) LEFT JOIN t5 USING (doc_id))
SELECT doc_id, n_tok, top1_u::DOUBLE / 10000.0 AS top1_frac4, top2_u::DOUBLE / 10000.0 AS top2_frac4,
       dup5_u::DOUBLE / 10000.0 AS dup5_frac4,
       (CASE WHEN top1_u > 800 OR top2_u > 1000 OR dup5_u > 3000 THEN 1 ELSE 0 END)::BIGINT AS flagged
FROM u ORDER BY doc_id""",
    // q137: the oracle plants the same synthetic PII and re-scans the
    // redacted text — residual_hits must be zero everywhere
    "q137_pii_redact" ->
      raw"""WITH aug AS (SELECT doc_id, text ||
  CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id::VARCHAR || '@corp.example now' ELSE '' END ||
  CASE WHEN doc_id % 7 = 0 THEN ' call 415-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END ||
  CASE WHEN doc_id % 3 = 0 THEN ' host 10.0.' || (doc_id % 256)::VARCHAR || '.' || ((doc_id // 256) % 256)::VARCHAR ELSE '' END AS text
  FROM documents),
s AS (SELECT doc_id, length(text)::BIGINT AS raw_len,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
  len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phone,
  len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))::BIGINT AS n_ip,
  regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS red
  FROM aug)
SELECT doc_id, raw_len, n_email, n_phone, n_ip, length(red)::BIGINT AS red_len,
  (CASE WHEN n_email + n_phone + n_ip = 0 THEN 1 ELSE 0 END)::BIGINT AS clean,
  (len(regexp_extract_all(red, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
   + len(regexp_extract_all(red, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))
   + len(regexp_extract_all(red, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')))::BIGINT AS residual_hits
FROM s ORDER BY doc_id""",
    // q138: q107's LM scoring + fixed-band CASE; the tier key is one
    // double division + floor on both engines
    "q138_curriculum_tiers" ->
      raw"""WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS w FROM documents),
bi AS (SELECT doc_id, w[i-1] AS p, w[i] AS c FROM (SELECT doc_id, unnest(range(2, len(w)+1)) AS i, w FROM tk WHERE len(w) >= 2)),
bic AS (SELECT p, c, count(*) AS cbi FROM bi GROUP BY p, c),
prevc AS (SELECT p, sum(cbi)::BIGINT AS cp FROM bic GROUP BY p),
curc AS (SELECT c, sum(cbi)::BIGINT AS cc FROM bic GROUP BY c),
tot AS (SELECT sum(cbi)::BIGINT AS nbi FROM bic),
d AS (SELECT doc_id, count(*) AS n_bi, sum(lpu)::BIGINT AS sum_lp_u
FROM (SELECT doc_id, floor(ln(0.7::DOUBLE * (cbi::DOUBLE / cp::DOUBLE) + 0.3::DOUBLE * (cc::DOUBLE / nbi::DOUBLE)) * 1000000.0)::BIGINT AS lpu
      FROM bi JOIN bic USING (p, c) JOIN prevc USING (p) JOIN curc USING (c) CROSS JOIN tot)
GROUP BY doc_id),
a AS (SELECT doc_id, n_bi, floor(sum_lp_u::DOUBLE / n_bi::DOUBLE)::BIGINT AS alu FROM d)
SELECT doc_id, n_bi, floor(alu::DOUBLE / 100.0) / 10000.0 AS avg_lp4,
       (CASE WHEN alu >= -3380000 THEN 1 WHEN alu >= -3395000 THEN 2 WHEN alu >= -3420000 THEN 3 ELSE 4 END)::BIGINT AS tier
FROM a ORDER BY doc_id""",
    // q139: same salt-prefixed md5 ordering and integer 80/10/10 rule
    "q139_stratified_split" ->
      """WITH r AS (SELECT lang, source, doc_id,
  row_number() OVER (PARTITION BY lang, source ORDER BY md5('split:' || doc_id::VARCHAR), doc_id)::BIGINT AS rn,
  count(*) OVER (PARTITION BY lang, source)::BIGINT AS n
  FROM documents)
SELECT lang, source,
       CASE WHEN rn * 10 <= n * 8 THEN 'train' WHEN rn * 10 <= n * 9 THEN 'val' ELSE 'test' END AS split,
       count(*)::BIGINT AS n_docs, min(doc_id)::BIGINT AS min_doc_id, max(doc_id)::BIGINT AS max_doc_id
FROM r GROUP BY 1, 2, 3 ORDER BY lang, source, split""",
    // q140: same simulated snapshots, status from md5 on both engines
    "q140_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, source AS src1, md5(text) AS h1 FROM documents WHERE doc_id % 10 <> 0),
v2 AS (SELECT doc_id, source AS src2, md5(t2) AS h2, length(t2)::BIGINT AS len2
       FROM (SELECT doc_id, source, CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS t2
             FROM documents WHERE doc_id % 13 <> 5)),
j AS (SELECT coalesce(src1, src2) AS source,
       CASE WHEN h1 IS NULL THEN 'added' WHEN h2 IS NULL THEN 'removed'
            WHEN h1 = h2 THEN 'unchanged' ELSE 'changed' END AS status,
       coalesce(len2, 0) AS len2
      FROM v1 FULL OUTER JOIN v2 USING (doc_id))
SELECT source, status, count(*)::BIGINT AS n_docs, sum(len2)::BIGINT AS n_chars_v2
FROM j GROUP BY 1, 2 ORDER BY source, status""",
    // q141: per-source sqrt quantized to 1e-6 then integer-only math
    "q141_mixture_weights" ->
      raw"""WITH tk AS (SELECT source, len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != ''))::BIGINT AS nt FROM documents),
per AS (SELECT source, sum(nt)::BIGINT AS n_tok FROM tk GROUP BY source),
tot AS (SELECT sum(n_tok)::BIGINT AS tot FROM per),
r AS (SELECT source, n_tok, (n_tok * 10000) // tot AS share_bp, (n_tok * 1000000) // tot AS share_u,
      floor(sqrt(n_tok::DOUBLE / tot::DOUBLE) * 1000000.0)::BIGINT AS r_u FROM per, tot),
sr AS (SELECT sum(r_u)::BIGINT AS sum_r FROM r)
SELECT source, n_tok, share_bp::BIGINT AS share_bp,
       ((r_u * 10000) // sum_r)::DOUBLE / 10000.0 AS w4,
       (((r_u * 10000) // sum_r * 1000000) // share_u)::DOUBLE / 10000.0 AS epochs4
FROM r, sr ORDER BY source""",
    // q142: per-term micro-nat quantization makes the KL sums exact
    "q142_source_drift" ->
      raw"""WITH tok AS (SELECT source, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents),
cs AS (SELECT source, w, count(*)::BIGINT AS c_s FROM tok GROUP BY source, w),
cg AS (SELECT w, sum(c_s)::BIGINT AS c_g FROM cs GROUP BY w),
ns AS (SELECT source, sum(c_s)::BIGINT AS n_s FROM cs GROUP BY source),
ng AS (SELECT sum(c_g)::BIGINT AS n_g FROM cg),
c AS (SELECT source,
      floor((c_s::DOUBLE / n_s::DOUBLE) * ln((c_s::DOUBLE * n_g::DOUBLE) / (n_s::DOUBLE * c_g::DOUBLE)) * 1000000.0)::BIGINT AS contrib_u
      FROM cs JOIN cg USING (w) JOIN ns USING (source) CROSS JOIN ng)
SELECT source, count(*)::BIGINT AS n_terms, sum(contrib_u)::BIGINT AS kl_u,
       floor(sum(contrib_u)::DOUBLE / 100.0) / 10000.0 AS kl4
FROM c GROUP BY source ORDER BY source""",
    // q144: identical df floor, pair join and micro-nat PMI
    "q144_pmi_pairs" ->
      raw"""WITH dw AS (SELECT DISTINCT doc_id, w FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents)),
dfr AS (SELECT w, count(*)::BIGINT AS df FROM dw GROUP BY w),
kept AS (SELECT w, df FROM dfr WHERE df >= 50),
kdw AS (SELECT doc_id, dw.w FROM dw JOIN kept USING (w)),
nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
p AS (SELECT a.w AS wa, b.w AS wb, count(*)::BIGINT AS c_ab
      FROM kdw a JOIN kdw b ON a.doc_id = b.doc_id AND a.w < b.w GROUP BY 1, 2)
SELECT wa, wb, c_ab, ka.df AS df_a, kb.df AS df_b,
       floor(ln((c_ab::DOUBLE * n_docs::DOUBLE) / (ka.df::DOUBLE * kb.df::DOUBLE)) * 1000000.0)::BIGINT AS pmi_u
FROM p JOIN kept ka ON p.wa = ka.w JOIN kept kb ON p.wb = kb.w CROSS JOIN nd
ORDER BY pmi_u DESC, wa, wb LIMIT 50""",
    // q143: q109's cells, quantized-cos ranking, recursive-CTE min-label
    // closure for the components
    "q143_knn_cluster_purity" ->
      """WITH RECURSIVE kk AS (SELECT greatest(8, (count(*) + 63) // 64) AS k FROM embeddings),
cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS srn FROM embeddings) s, kk WHERE s.srn <= kk.k),
cells AS (SELECT vec_id, centroid_id FROM (SELECT e.vec_id, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents c) WHERE rn = 1),
sc AS (SELECT a.vec_id AS src, b.vec_id AS dst,
       floor(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) * 10000.0)::BIGINT AS cos4
       FROM cells a JOIN cells b ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id
       JOIN embeddings ea ON ea.vec_id = a.vec_id JOIN embeddings eb ON eb.vec_id = b.vec_id),
top AS (SELECT src, dst FROM (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos4 DESC, dst) AS rn FROM sc) WHERE rn <= 3),
mut AS (SELECT t1.src AS a, t1.dst AS b FROM top t1 JOIN top t2 ON t1.src = t2.dst AND t1.dst = t2.src WHERE t1.src < t1.dst),
edges AS (SELECT a AS src, b AS dst FROM mut UNION ALL SELECT b, a FROM mut),
r AS (SELECT vec_id AS id, vec_id AS lbl FROM embeddings UNION SELECT e.dst AS id, r.lbl FROM r JOIN edges e ON r.id = e.src),
cc AS (SELECT id, min(lbl) AS cluster_id FROM r GROUP BY id),
cl AS (SELECT cluster_id, e.label::BIGINT AS label, count(*)::BIGINT AS cnt FROM cc JOIN embeddings e ON e.vec_id = cc.id GROUP BY 1, 2),
tl AS (SELECT cluster_id, label AS top_label, cnt AS n_top FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY cnt DESC, label) AS rn FROM cl) WHERE rn = 1),
sz AS (SELECT cluster_id, sum(cnt)::BIGINT AS n_vecs FROM cl GROUP BY 1)
SELECT s.cluster_id, n_vecs, top_label, n_top, ((n_top * 10000) // n_vecs)::DOUBLE / 10000.0 AS purity4
FROM sz s JOIN tl USING (cluster_id) ORDER BY s.cluster_id""",
    // q145: same quantized ranking; inner join drops label-singleton
    // queries on both sides
    "q145_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qlabel FROM embeddings WHERE vec_id < 16),
sc AS (SELECT q.query_id, q.qlabel, e.vec_id, e.label, floor(list_cosine_similarity(e.embedding::DOUBLE[], q.qv) * 10000.0)::BIGINT AS cos4
       FROM embeddings e, q WHERE e.vec_id <> q.query_id),
pos AS (SELECT query_id, vec_id AS pos_id, cos4 AS pos_u FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, vec_id) AS rn FROM sc WHERE label = qlabel) WHERE rn = 1),
neg AS (SELECT query_id, vec_id AS neg_id, cos4 AS neg_u FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, vec_id) AS rn FROM sc WHERE label <> qlabel) WHERE rn = 1),
hard AS (SELECT s.query_id, count(*)::BIGINT AS n_harder FROM sc s JOIN pos p USING (query_id) WHERE s.label <> s.qlabel AND s.cos4 >= p.pos_u GROUP BY s.query_id)
SELECT p.query_id, pos_id, neg_id, (pos_u - neg_u)::DOUBLE / 10000.0 AS margin4, coalesce(n_harder, 0)::BIGINT AS n_harder
FROM pos p JOIN neg USING (query_id) LEFT JOIN hard USING (query_id) ORDER BY p.query_id""",
    // q146: integer micro-nat sums; only the final divisions are doubles
    "q146_zipf_fit" ->
      raw"""WITH f AS (SELECT w, count(*)::BIGINT AS f FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents) GROUP BY w),
r AS (SELECT floor(ln(rk::DOUBLE) * 1000000.0)::BIGINT AS x, floor(ln(f::DOUBLE) * 1000000.0)::BIGINT AS y
      FROM (SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rk FROM f)),
s AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy, sum(x*y)::BIGINT AS sxy, sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy FROM r),
d AS (SELECT n, sx, sy, (n*sxy - sx*sy)::BIGINT AS num, (n*sxx - sx*sx)::BIGINT AS denx, (n*syy - sy*sy)::BIGINT AS deny FROM s),
e AS (SELECT n, sx, sy, num, denx, deny, num::DOUBLE / denx::DOUBLE AS slope FROM d)
SELECT n AS n_terms, floor(slope * 10000.0) / 10000.0 AS slope4,
       floor(((sy::DOUBLE - slope * sx::DOUBLE) / n::DOUBLE / 1000000.0) * 10000.0) / 10000.0 AS icept4,
       floor((num::DOUBLE * num::DOUBLE) / (denx::DOUBLE * deny::DOUBLE) * 10000.0) / 10000.0 AS r2_4
FROM e""",
    // q148: gram TEXT replays Spark's xxhash64 decisions (2^-64 residual)
    "q148_novelty_score" ->
      raw"""WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS w FROM documents),
g AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS g FROM (SELECT doc_id, w, unnest(range(1, len(w)-3)) AS i FROM tk WHERE len(w) >= 5))),
df5 AS (SELECT g, count(*)::BIGINT AS nd FROM g GROUP BY g),
per AS (SELECT doc_id, count(*)::BIGINT AS n_grams, sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique FROM g JOIN df5 USING (g) GROUP BY doc_id)
SELECT d.doc_id, coalesce(n_grams, 0)::BIGINT AS n_grams, coalesce(n_unique, 0)::BIGINT AS n_unique,
       CASE WHEN coalesce(n_grams, 0) > 0 THEN ((n_unique * 10000) // n_grams)::DOUBLE / 10000.0 ELSE 0.0 END AS novelty4
FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""",
    // q149: q143's cells + labels, nearest different-label neighbor
    "q149_label_confusion" ->
      """WITH cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
cells AS (SELECT vec_id, centroid_id FROM (SELECT e.vec_id, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents c) WHERE rn = 1),
lab AS (SELECT c.vec_id, c.centroid_id, e.label::BIGINT AS label FROM cells c JOIN embeddings e USING (vec_id)),
sc AS (SELECT a.vec_id AS src, a.label AS label_a, b.label AS label_b, b.vec_id AS dst,
       floor(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) * 10000.0)::BIGINT AS cos4
       FROM lab a JOIN lab b ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id AND a.label <> b.label
       JOIN embeddings ea ON ea.vec_id = a.vec_id JOIN embeddings eb ON eb.vec_id = b.vec_id),
nn AS (SELECT src, label_a, label_b FROM (SELECT *, row_number() OVER (PARTITION BY src ORDER BY cos4 DESC, dst) AS rn FROM sc) WHERE rn = 1)
SELECT label_a, label_b, count(*)::BIGINT AS n_vecs FROM nn GROUP BY 1, 2 ORDER BY label_a, label_b""",
    // q150: the q118 cluster closure + q136 rule + q139 rule, composed
    "q150_clean_pipeline" ->
      raw"""WITH RECURSIVE $LshVerifiedCtes,
good AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 1.0),
edges AS (SELECT id_a AS src, id_b AS dst FROM good UNION ALL SELECT id_b AS src, id_a AS dst FROM good),
reach AS (SELECT doc_id AS id, doc_id AS r FROM documents UNION SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id),
cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
keep AS (SELECT doc_id FROM cl WHERE doc_id = cluster_id),
tk2 AS (SELECT d.doc_id, d.lang, d.source, list_filter(regexp_split_to_array(lower(trim(d.text)), '\s+'), x -> x != '') AS w FROM documents d JOIN keep USING (doc_id)),
base AS (SELECT doc_id, lang, source, len(w)::BIGINT AS n_tok, w FROM tk2),
q1 AS (SELECT doc_id, max(c)::BIGINT AS top1_cnt FROM (SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, unnest(w) AS g FROM base) GROUP BY doc_id, g) GROUP BY doc_id),
q2 AS (SELECT doc_id, max(c)::BIGINT AS top2_cnt FROM (SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM base WHERE len(w) >= 2)) GROUP BY doc_id, g) GROUP BY doc_id),
q5 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup5_cnt FROM (SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS g FROM (SELECT doc_id, w, unnest(range(1, len(w)-3)) AS i FROM base WHERE len(w) >= 5)) GROUP BY doc_id, g) GROUP BY doc_id),
u AS (SELECT b.doc_id, b.lang, b.source, b.n_tok,
  CASE WHEN b.n_tok > 0 THEN (coalesce(top1_cnt, 0) * 10000) // b.n_tok ELSE 0 END AS top1_u,
  CASE WHEN b.n_tok >= 2 THEN (coalesce(top2_cnt, 0) * 2 * 10000) // b.n_tok ELSE 0 END AS top2_u,
  CASE WHEN b.n_tok >= 5 THEN (coalesce(dup5_cnt, 0) * 10000) // (b.n_tok - 4) ELSE 0 END AS dup5_u
  FROM base b LEFT JOIN q1 USING (doc_id) LEFT JOIN q2 USING (doc_id) LEFT JOIN q5 USING (doc_id)),
good2 AS (SELECT doc_id, lang, source, n_tok FROM u WHERE NOT (top1_u > 800 OR top2_u > 1000 OR dup5_u > 3000)),
rr AS (SELECT lang, source, n_tok, doc_id,
  row_number() OVER (PARTITION BY lang, source ORDER BY md5('split:' || doc_id::VARCHAR), doc_id)::BIGINT AS rn,
  count(*) OVER (PARTITION BY lang, source)::BIGINT AS nn FROM good2)
SELECT lang, source,
       CASE WHEN rn * 10 <= nn * 8 THEN 'train' WHEN rn * 10 <= nn * 9 THEN 'val' ELSE 'test' END AS split,
       count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tok
FROM rr GROUP BY 1, 2, 3 ORDER BY lang, source, split""",
    // q151: integer score, SQL-standard rank/percent_rank arithmetic
    "q151_quality_quantiles" ->
      raw"""WITH tk AS (SELECT doc_id, source, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS w FROM documents),
b AS (SELECT doc_id, source, len(w)::BIGINT AS n_tok, list_sum(list_transform(w, x -> len(x)))::BIGINT AS sum_len FROM tk WHERE len(w) > 0),
r AS (SELECT doc_id, source, (sum_len * 10000) // n_tok AS score_u,
      rank() OVER (PARTITION BY source ORDER BY (sum_len * 10000) // n_tok)::BIGINT AS rk,
      count(*) OVER (PARTITION BY source)::BIGINT AS n FROM b)
SELECT doc_id, source, score_u::DOUBLE / 10000.0 AS score4,
       CASE WHEN n > 1 THEN floor((rk - 1)::DOUBLE / (n - 1)::DOUBLE * 10000.0) / 10000.0 ELSE 0.0 END AS pr4,
       (CASE WHEN n > 1 THEN least(9, ((rk - 1) * 10) // (n - 1)) ELSE 0 END)::BIGINT AS decile
FROM r ORDER BY doc_id""",
    // q152: q139's split rule + gram-text overlap (replays the hash path)
    "q152_split_leakage" ->
      raw"""WITH r0 AS (SELECT doc_id, text,
  row_number() OVER (PARTITION BY lang, source ORDER BY md5('split:' || doc_id::VARCHAR), doc_id)::BIGINT AS rn,
  count(*) OVER (PARTITION BY lang, source)::BIGINT AS n FROM documents),
sp AS (SELECT doc_id, text, CASE WHEN rn * 10 <= n * 8 THEN 'train' WHEN rn * 10 <= n * 9 THEN 'val' ELSE 'test' END AS split FROM r0),
tk AS (SELECT split, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS w FROM sp),
g AS (SELECT DISTINCT split, g FROM (SELECT split, array_to_string(w[i:i+4], ' ') AS g FROM (SELECT split, w, unnest(range(1, len(w)-3)) AS i FROM tk WHERE len(w) >= 5))),
sizes AS (SELECT split, count(*)::BIGINT AS n FROM g GROUP BY split),
ov AS (SELECT a.split AS split_a, b.split AS split_b, count(*)::BIGINT AS n_shared
       FROM g a JOIN g b ON a.g = b.g AND a.split < b.split GROUP BY 1, 2)
SELECT split_a, split_b, sa.n AS n_a, sb.n AS n_b, n_shared,
       ((n_shared * 10000) // (sa.n + sb.n - n_shared))::DOUBLE / 10000.0 AS jac4
FROM ov JOIN sizes sa ON ov.split_a = sa.split JOIN sizes sb ON ov.split_b = sb.split
ORDER BY split_a, split_b""",
    // q153: same checkpoint arithmetic + q146's integer-sum regression
    "q153_heaps_fit" ->
      raw"""WITH mm AS (SELECT min(doc_id) AS lo, max(doc_id) + 1 AS hi FROM documents),
tok AS (SELECT ((doc_id - lo) * 20) // (hi - lo) AS bkt, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents, mm),
pt AS (SELECT bkt, count(*)::BIGINT AS n_tok FROM tok GROUP BY bkt),
pn AS (SELECT bkt, count(*)::BIGINT AS n_new FROM (SELECT w, min(bkt) AS bkt FROM tok GROUP BY w) GROUP BY bkt),
c AS (SELECT pt.bkt, sum(n_tok) OVER (ORDER BY pt.bkt)::BIGINT AS ct, sum(coalesce(n_new, 0)) OVER (ORDER BY pt.bkt)::BIGINT AS cv FROM pt LEFT JOIN pn ON pt.bkt = pn.bkt),
r AS (SELECT floor(ln(ct::DOUBLE) * 1000000.0)::BIGINT AS x, floor(ln(cv::DOUBLE) * 1000000.0)::BIGINT AS y FROM c),
s AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy, sum(x*y)::BIGINT AS sxy, sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy FROM r),
d AS (SELECT n, sx, sy, (n*sxy - sx*sy)::BIGINT AS num, (n*sxx - sx*sx)::BIGINT AS denx, (n*syy - sy*sy)::BIGINT AS deny FROM s),
e AS (SELECT n, sx, sy, num, denx, deny, CASE WHEN denx > 0 THEN num::DOUBLE / denx::DOUBLE ELSE 0.0::DOUBLE END AS slope FROM d)
SELECT n AS n_points, floor(slope * 10000.0) / 10000.0 AS beta4,
       floor(((sy::DOUBLE - slope * sx::DOUBLE) / n::DOUBLE / 1000000.0) * 10000.0) / 10000.0 AS icept4,
       CASE WHEN denx > 0 AND deny > 0 THEN floor((num::DOUBLE * num::DOUBLE) / (denx::DOUBLE * deny::DOUBLE) * 10000.0) / 10000.0 ELSE 1.0::DOUBLE END AS r2_4
FROM e""",
    // q154: nearest-rank percentiles with the same doc_id tie-break
    "q154_winsorize" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
  row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)::BIGINT AS rn,
  count(*) OVER (PARTITION BY source)::BIGINT AS n FROM documents),
c AS (SELECT source, max(CASE WHEN rn = (n * 5 + 99) // 100 THEN n_chars END)::BIGINT AS p05,
             max(CASE WHEN rn = (n * 95 + 99) // 100 THEN n_chars END)::BIGINT AS p95 FROM r GROUP BY source)
SELECT r.source, count(*)::BIGINT AS n_docs, max(p05)::BIGINT AS p05, max(p95)::BIGINT AS p95,
       ((sum(n_chars)::BIGINT * 10000) // count(*))::DOUBLE / 10000.0 AS mean_raw4,
       ((sum(least(greatest(n_chars, p05), p95))::BIGINT * 10000) // count(*))::DOUBLE / 10000.0 AS mean_wins4
FROM r JOIN c ON r.source = c.source GROUP BY r.source ORDER BY r.source""",
    // q155: lead over the same (µs ts, event_id) order
    "q155_event_transitions" ->
      """WITH p AS (SELECT event_type AS cur, lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nxt FROM events),
c AS (SELECT cur, nxt, count(*)::BIGINT AS n_pair FROM p WHERE nxt IS NOT NULL GROUP BY 1, 2),
t AS (SELECT cur, sum(n_pair)::BIGINT AS n_cur FROM c GROUP BY 1)
SELECT c.cur, c.nxt, n_pair, n_cur, ((n_pair * 10000) // n_cur)::DOUBLE / 10000.0 AS p4
FROM c JOIN t USING (cur) ORDER BY cur, nxt""",
    // q156: per-term micro-nat quantization keeps the entropy sums exact
    "q156_lang_source_mi" ->
      """WITH cells AS (SELECT lang, source, count(*)::BIGINT AS c FROM documents GROUP BY 1, 2),
n AS (SELECT sum(c)::BIGINT AS n FROM cells),
hj AS (SELECT sum(floor(-(c::DOUBLE / n::DOUBLE) * ln(c::DOUBLE / n::DOUBLE) * 1000000.0)::BIGINT)::BIGINT AS hj_u FROM cells, n),
hl AS (SELECT sum(floor(-(cl::DOUBLE / n::DOUBLE) * ln(cl::DOUBLE / n::DOUBLE) * 1000000.0)::BIGINT)::BIGINT AS hl_u FROM (SELECT lang, sum(c)::BIGINT AS cl FROM cells GROUP BY lang), n),
hs AS (SELECT sum(floor(-(cs::DOUBLE / n::DOUBLE) * ln(cs::DOUBLE / n::DOUBLE) * 1000000.0)::BIGINT)::BIGINT AS hs_u FROM (SELECT source, sum(c)::BIGINT AS cs FROM cells GROUP BY source), n)
SELECT n AS n_docs, hl_u::DOUBLE / 1000000.0 AS h_lang6, hs_u::DOUBLE / 1000000.0 AS h_source6,
       hj_u::DOUBLE / 1000000.0 AS h_joint6, (hl_u + hs_u - hj_u)::DOUBLE / 1000000.0 AS mi6,
       (CASE WHEN least(hl_u, hs_u) > 0 THEN ((hl_u + hs_u - hj_u) * 10000) // least(hl_u, hs_u) ELSE 0 END)::DOUBLE / 10000.0 AS nmi4
FROM n, hl, hs, hj""",
    // q147: degree-ordered triangle census of the LSH-verified pair graph
    "q147_dup_triangles" ->
      s"""WITH $LshVerifiedCtes,
prs AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 0.75),
deg AS (SELECT v, count(*)::BIGINT AS d FROM (SELECT id_a AS v FROM prs UNION ALL SELECT id_b FROM prs) GROUP BY v),
o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND id_a < id_b) THEN id_a ELSE id_b END AS u,
             CASE WHEN da.d < db.d OR (da.d = db.d AND id_a < id_b) THEN id_b ELSE id_a END AS w
      FROM prs JOIN deg da ON prs.id_a = da.v JOIN deg db ON prs.id_b = db.v),
wg AS (SELECT o1.w AS lo, o2.w AS hi FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.w < o2.w),
tri AS (SELECT count(*)::BIGINT AS n_triangles FROM wg JOIN prs ON wg.lo = prs.id_a AND wg.hi = prs.id_b),
ns AS (SELECT count(*)::BIGINT AS n_nodes, sum(d*(d-1)//2)::BIGINT AS n_wedges FROM deg),
es AS (SELECT count(*)::BIGINT AS n_edges FROM prs)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
 (CASE WHEN n_wedges > 0 THEN (3*n_triangles*10000)//n_wedges ELSE 0 END)::DOUBLE / 10000.0 AS transitivity4
FROM ns, es, tri""",
    // q157: power-of-two EWMA weights — exact integer num/den sums
    "q157_ewma_hourly" ->
      """WITH hourly AS (SELECT epoch_us(ts)//3600000000 AS hour_bucket, count(*)::BIGINT AS n FROM events GROUP BY 1),
contrib AS (SELECT hour_bucket + k AS thb, n * (1::BIGINT << (24-k)) AS wn, (1::BIGINT << (24-k))::BIGINT AS wt
            FROM hourly, (SELECT unnest(range(1,25)) AS k) ks(k)),
sm AS (SELECT thb, sum(wn)::BIGINT AS num, sum(wt)::BIGINT AS den, count(*)::BIGINT AS n_prior FROM contrib GROUP BY thb)
SELECT h.hour_bucket, h.n, coalesce(n_prior, 0)::BIGINT AS n_prior,
  CASE WHEN den > 0 THEN ((num*10000)//den)::DOUBLE/10000.0 END AS smooth4,
  (CASE WHEN den > 0 THEN (CASE WHEN h.n*den > 2*num THEN 1 ELSE 0 END) END)::BIGINT AS spike
FROM hourly h LEFT JOIN sm ON h.hour_bucket = sm.thb ORDER BY hour_bucket""",
    // q158: one shared scored relation feeds every sweep point; brute
    // top-10 is the truth set; ranking ties break by vec_id on both engines
    "q158_ivf_probe_sweep" ->
      """WITH kk AS (SELECT greatest(8, (count(*) + 63) // 64) AS k FROM embeddings),
cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS srn FROM embeddings) s, kk WHERE s.srn <= kk.k),
corpcell AS (SELECT vec_id, embedding, centroid_id FROM (SELECT e.vec_id, e.embedding, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents c) WHERE rn = 1),
qc AS (SELECT query_id, qv, centroid_id, rn AS cell_rank FROM (SELECT q.vec_id AS query_id, q.embedding AS qv, c.centroid_id, row_number() OVER (PARTITION BY q.vec_id ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 16) q, cents c)),
cand AS (SELECT qc.query_id, qc.cell_rank, e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], qc.qv::DOUBLE[]) AS sc FROM corpcell e JOIN qc ON e.centroid_id = qc.centroid_id WHERE e.vec_id <> qc.query_id),
brute AS (SELECT query_id, vec_id FROM (SELECT q.vec_id AS query_id, e.vec_id, row_number() OVER (PARTITION BY q.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, e.vec_id) AS rn FROM embeddings e, (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 16) q WHERE e.vec_id <> q.vec_id) WHERE rn <= 10),
sw AS (SELECT unnest([1,2,4,8]) AS nprobe),
topk AS (SELECT nprobe, query_id, vec_id FROM (SELECT sw.nprobe, c.query_id, c.vec_id, row_number() OVER (PARTITION BY sw.nprobe, c.query_id ORDER BY c.sc DESC, c.vec_id) AS rn FROM cand c JOIN sw ON c.cell_rank <= sw.nprobe) WHERE rn <= 10),
h AS (SELECT nprobe, count(*)::BIGINT AS n_hits FROM topk JOIN brute USING (query_id, vec_id) GROUP BY nprobe),
nq AS (SELECT count(*)::BIGINT AS n_q FROM embeddings WHERE vec_id < 16)
SELECT sw.nprobe::BIGINT AS nprobe, coalesce(n_hits, 0)::BIGINT AS n_hits,
  ((coalesce(n_hits, 0) * 10000) // (n_q * 10))::DOUBLE / 10000.0 AS recall4
FROM sw LEFT JOIN h USING (nprobe), nq ORDER BY nprobe""",
    // q159: nearest-rank order statistics — the oracle sorts, the engine
    // must not (two histogram passes); ranks in exact integer arithmetic
    "q159_exact_quantiles" ->
      """WITH r AS (SELECT n_chars AS v, row_number() OVER (ORDER BY n_chars) AS rn, count(*) OVER () AS n FROM documents),
p AS (SELECT unnest([2500,5000,7500,9000,9900]) AS p4),
t AS (SELECT p4, (p4 * n + 9999) // 10000 AS rank FROM p, (SELECT max(n) AS n FROM r) nn)
SELECT p4::DOUBLE / 10000.0 AS prob4, t.rank::BIGINT AS rank, r.v::BIGINT AS value
FROM t JOIN r ON r.rn = t.rank ORDER BY prob4""",
    // q160: HH lists replayed with the same (count DESC, key ASC) order as
    // TopKAgg; estimate components in identical integer arithmetic
    "q160_join_estimate" ->
      """WITH ca AS (SELECT user_id AS k, count(*)::BIGINT AS c FROM events GROUP BY 1),
cb AS (SELECT o_custkey AS k, count(*)::BIGINT AS c FROM orders GROUP BY 1),
ha AS (SELECT k, c FROM (SELECT k, c, row_number() OVER (ORDER BY c DESC, k) AS rn FROM ca) WHERE rn <= 5),
hb AS (SELECT k, c FROM (SELECT k, c, row_number() OVER (ORDER BY c DESC, k) AS rn FROM cb) WHERE rn <= 5),
ta AS (SELECT sum(c)::BIGINT AS n_a, count(*)::BIGINT AS d_a FROM ca),
tb AS (SELECT sum(c)::BIGINT AS n_b, count(*)::BIGINT AS d_b FROM cb),
sa AS (SELECT coalesce(sum(c),0)::BIGINT AS n_hh_a, count(*)::BIGINT AS d_hh_a FROM ha),
sb AS (SELECT coalesce(sum(c),0)::BIGINT AS n_hh_b, count(*)::BIGINT AS d_hh_b FROM hb),
rest AS (SELECT n_a, d_a, n_b, d_b,
  n_a - n_hh_a AS nra, d_a - d_hh_a AS dra,
  n_b - n_hh_b AS nrb, d_b - d_hh_b AS drb FROM ta, tb, sa, sb),
bth AS (SELECT coalesce(sum(ha.c * hb.c),0)::BIGINT AS est_hh FROM ha JOIN hb USING (k)),
aon AS (SELECT coalesce(sum(c),0)::BIGINT AS ca_only FROM ha WHERE k NOT IN (SELECT k FROM hb)),
bon AS (SELECT coalesce(sum(c),0)::BIGINT AS cb_only FROM hb WHERE k NOT IN (SELECT k FROM ha)),
ex AS (SELECT count(*)::BIGINT AS exact_rows FROM events JOIN orders ON user_id = o_custkey),
est AS (SELECT n_a, d_a, n_b, d_b,
  (est_hh
   + ca_only * (nrb // greatest(drb, 1))
   + cb_only * (nra // greatest(dra, 1))
   + (nra * nrb) // greatest(greatest(dra, drb), 1))::BIGINT AS est_rows
  FROM rest, bth, aon, bon)
SELECT n_a, d_a, n_b, d_b, est_rows, exact_rows,
  (abs(est_rows - exact_rows) * 10000 // exact_rows)::DOUBLE / 10000.0 AS err4
FROM est, ex""",
    // q161: nearest-rank (lower) median and MAD with (value, hour) tie
    // order; worst hour integer-packed so the argmax is engine-exact
    "q161_robust_anomaly" ->
      """WITH hourly AS (SELECT event_type, epoch_us(ts)//3600000000 AS hour_bucket, count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
med AS (SELECT event_type, n AS med FROM (SELECT event_type, n, row_number() OVER (PARTITION BY event_type ORDER BY n, hour_bucket) AS rn, count(*) OVER (PARTITION BY event_type) AS cnt FROM hourly) WHERE rn = (cnt + 1) // 2),
dev AS (SELECT h.event_type, h.hour_bucket, h.n, m.med, abs(h.n - m.med)::BIGINT AS ad FROM hourly h JOIN med m USING (event_type)),
mad AS (SELECT event_type, ad AS mad FROM (SELECT event_type, ad, row_number() OVER (PARTITION BY event_type ORDER BY ad, hour_bucket) AS rn, count(*) OVER (PARTITION BY event_type) AS cnt FROM dev) WHERE rn = (cnt + 1) // 2)
SELECT d.event_type, count(*)::BIGINT AS n_hours, max(d.med)::BIGINT AS med, max(m.mad)::BIGINT AS mad,
  sum(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END)::BIGINT AS n_anomalies,
  (max(CASE WHEN d.ad > 3 * m.mad THEN d.ad * 10000000 + d.hour_bucket END) % 10000000)::BIGINT AS worst_hour
FROM dev d JOIN mad m USING (event_type) GROUP BY d.event_type ORDER BY d.event_type""",
    // q162: q58's stable md5 cohort hash; z in identical double op order,
    // significance decided on the QUANTIZED statistic
    "q162_ab_test" ->
      """WITH e AS (SELECT ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS cohort, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv FROM events),
g AS (SELECT cohort, count(*)::BIGINT AS n, sum(is_conv)::BIGINT AS k FROM e GROUP BY cohort),
a AS (SELECT n AS n0, k AS k0 FROM g WHERE cohort = 0),
b AS (SELECT n AS n1, k AS k1 FROM g WHERE cohort = 1),
z AS (SELECT n0, k0, n1, k1, (k0*10000)//n0 AS p0_4, (k1*10000)//n1 AS p1_4,
  CASE WHEN (k0+k1) > 0 AND (k0+k1) < (n0+n1) THEN
  floor(((k0::DOUBLE / n0::DOUBLE) - (k1::DOUBLE / n1::DOUBLE))
    / sqrt(((k0+k1)::DOUBLE / (n0+n1)::DOUBLE) * (1.0 - (k0+k1)::DOUBLE / (n0+n1)::DOUBLE) * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE)) * 10000.0)::BIGINT END AS z4
  FROM a, b)
SELECT n0, k0, n1, k1, p0_4, p1_4, z4, (CASE WHEN z4 IS NULL THEN NULL WHEN abs(z4) > 19600 THEN 1 ELSE 0 END)::INT AS significant FROM z""",
    // q163: per-user first-view→first-purchase lags, then q159's
    // nearest-rank oracle shape over the lag column
    "q163_conversion_lag" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
fv AS (SELECT user_id, min(ts_us) AS t_view FROM ev WHERE event_type = 'view' GROUP BY user_id),
d AS (SELECT e.user_id, min(e.ts_us - f.t_view)::BIGINT AS lag_us FROM ev e JOIN fv f USING (user_id) WHERE e.event_type = 'purchase' AND e.ts_us >= f.t_view GROUP BY e.user_id),
r AS (SELECT lag_us AS v, row_number() OVER (ORDER BY lag_us) AS rn, count(*) OVER () AS n FROM d),
p AS (SELECT unnest([5000,9000,9900]) AS p4),
t AS (SELECT p4, (p4 * n + 9999) // 10000 AS rank FROM p, (SELECT max(n) AS n FROM r) nn)
SELECT p4::DOUBLE / 10000.0 AS prob4, t.rank::BIGINT AS rank, r.v::BIGINT AS value
FROM t JOIN r ON r.rn = t.rank ORDER BY prob4""",
    // q164: q53's recursive reach on the 0.75 strong graph, rolled into a
    // component-size histogram with exact 1e-4 corpus shares
    "q164_component_sizes" ->
      s"""WITH RECURSIVE $LshVerifiedCtes,
good AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 0.75),
edges AS (SELECT id_a AS src, id_b AS dst FROM good UNION ALL SELECT id_b AS src, id_a AS dst FROM good),
reach AS (SELECT doc_id AS id, doc_id AS r FROM documents UNION SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id),
lab AS (SELECT id, min(r) AS keeper_id FROM reach GROUP BY id),
sizes AS (SELECT keeper_id, count(*)::BIGINT AS sz FROM lab GROUP BY keeper_id),
tot AS (SELECT count(*)::BIGINT AS n FROM lab)
SELECT sz AS size, count(*)::BIGINT AS n_components, (sz * count(*))::BIGINT AS n_docs,
  ((sz * count(*) * 10000) // n)::DOUBLE / 10000.0 AS share4
FROM sizes, tot GROUP BY sz, n ORDER BY size""",
    // q165: q164's components + the exact integer share gate; flagged
    // components report every member surviving
    "q165_guarded_dedup" ->
      s"""WITH RECURSIVE $LshVerifiedCtes,
good AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 0.75),
edges AS (SELECT id_a AS src, id_b AS dst FROM good UNION ALL SELECT id_b AS src, id_a AS dst FROM good),
reach AS (SELECT doc_id AS id, doc_id AS r FROM documents UNION SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id),
lab AS (SELECT id, min(r) AS component_id FROM reach GROUP BY id),
sizes AS (SELECT component_id, count(*)::BIGINT AS sz FROM lab GROUP BY component_id),
tot AS (SELECT count(*)::BIGINT AS n FROM lab)
SELECT component_id, sz AS n_members, ((sz * 10000) // n)::DOUBLE / 10000.0 AS share4,
  (CASE WHEN sz * 10000 > 1000 * n THEN 1 ELSE 0 END)::INT AS flagged,
  (CASE WHEN sz * 10000 > 1000 * n THEN sz ELSE 1 END)::BIGINT AS n_survivors
FROM sizes, tot WHERE sz >= 2 ORDER BY component_id""",
    // q166: the 2-step Lloyd iteration replayed relationally — assign =
    // argmax CTE, positional mean = zipped-unnest avg FLOAT-cast per step
    // (meanVectors' exact float policy), empty cells coalesce to their
    // previous centroid; then q158's sweep on both grids
    "q166_ivf_learned" ->
      """WITH kk AS (SELECT greatest(8, (count(*) + 63) // 64) AS k FROM embeddings),
cents0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS srn FROM embeddings) s, kk WHERE s.srn <= kk.k),
cell0 AS (SELECT vec_id, centroid_id FROM (SELECT e.vec_id, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents0 c) WHERE rn = 1),
m1 AS (SELECT centroid_id, pos, avg(comp) AS m FROM (SELECT c0.centroid_id, unnest(e.embedding::DOUBLE[]) AS comp, unnest(range(1, 1 + len(e.embedding))) AS pos FROM cell0 c0 JOIN embeddings e USING (vec_id)) GROUP BY centroid_id, pos),
m1v AS (SELECT centroid_id, list(m::FLOAT ORDER BY pos) AS embedding FROM m1 GROUP BY centroid_id),
cents1 AS (SELECT c.centroid_id, coalesce(v.embedding, c.embedding) AS embedding FROM cents0 c LEFT JOIN m1v v USING (centroid_id)),
cell1 AS (SELECT vec_id, centroid_id FROM (SELECT e.vec_id, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents1 c) WHERE rn = 1),
m2 AS (SELECT centroid_id, pos, avg(comp) AS m FROM (SELECT c1.centroid_id, unnest(e.embedding::DOUBLE[]) AS comp, unnest(range(1, 1 + len(e.embedding))) AS pos FROM cell1 c1 JOIN embeddings e USING (vec_id)) GROUP BY centroid_id, pos),
m2v AS (SELECT centroid_id, list(m::FLOAT ORDER BY pos) AS embedding FROM m2 GROUP BY centroid_id),
cents2 AS (SELECT c.centroid_id, coalesce(v.embedding, c.embedding) AS embedding FROM cents1 c LEFT JOIN m2v v USING (centroid_id)),
cell2 AS (SELECT vec_id, centroid_id FROM (SELECT e.vec_id, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents2 c) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 16),
brute AS (SELECT query_id, vec_id FROM (SELECT q.query_id, e.vec_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC, e.vec_id) AS rn FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rn <= 10),
sw AS (SELECT unnest([1,2,4]) AS nprobe),
nq AS (SELECT count(*)::BIGINT AS n_q FROM embeddings WHERE vec_id < 16),
qc0 AS (SELECT query_id, qv, centroid_id, rn AS cell_rank FROM (SELECT q.query_id, q.qv, c.centroid_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM q, cents0 c)),
cand0 AS (SELECT qc.query_id, qc.cell_rank, e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], qc.qv::DOUBLE[]) AS sc FROM embeddings e JOIN cell0 c0 ON e.vec_id = c0.vec_id JOIN qc0 qc ON c0.centroid_id = qc.centroid_id WHERE e.vec_id <> qc.query_id),
top0 AS (SELECT nprobe, query_id, vec_id FROM (SELECT sw.nprobe, c.query_id, c.vec_id, row_number() OVER (PARTITION BY sw.nprobe, c.query_id ORDER BY c.sc DESC, c.vec_id) AS rn FROM cand0 c JOIN sw ON c.cell_rank <= sw.nprobe) WHERE rn <= 10),
h0 AS (SELECT nprobe, count(*)::BIGINT AS n_hits FROM top0 JOIN brute USING (query_id, vec_id) GROUP BY nprobe),
qc2 AS (SELECT query_id, qv, centroid_id, rn AS cell_rank FROM (SELECT q.query_id, q.qv, c.centroid_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM q, cents2 c)),
cand2 AS (SELECT qc.query_id, qc.cell_rank, e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], qc.qv::DOUBLE[]) AS sc FROM embeddings e JOIN cell2 c2 ON e.vec_id = c2.vec_id JOIN qc2 qc ON c2.centroid_id = qc.centroid_id WHERE e.vec_id <> qc.query_id),
top2 AS (SELECT nprobe, query_id, vec_id FROM (SELECT sw.nprobe, c.query_id, c.vec_id, row_number() OVER (PARTITION BY sw.nprobe, c.query_id ORDER BY c.sc DESC, c.vec_id) AS rn FROM cand2 c JOIN sw ON c.cell_rank <= sw.nprobe) WHERE rn <= 10),
h2 AS (SELECT nprobe, count(*)::BIGINT AS n_hits FROM top2 JOIN brute USING (query_id, vec_id) GROUP BY nprobe)
SELECT * FROM (
SELECT 'seed' AS grid, sw.nprobe::BIGINT AS nprobe, coalesce(h0.n_hits, 0)::BIGINT AS n_hits, ((coalesce(h0.n_hits, 0) * 10000) // (n_q * 10))::DOUBLE / 10000.0 AS recall4 FROM sw LEFT JOIN h0 USING (nprobe), nq
UNION ALL
SELECT 'lloyd2' AS grid, sw.nprobe::BIGINT AS nprobe, coalesce(h2.n_hits, 0)::BIGINT AS n_hits, ((coalesce(h2.n_hits, 0) * 10000) // (n_q * 10))::DOUBLE / 10000.0 AS recall4 FROM sw LEFT JOIN h2 USING (nprobe), nq
) ORDER BY grid, nprobe""",
    // q167: the oracle IS the parity property — q131's full-corpus
    // keep-first apply, restricted to the delta docs
    "q167_span_incremental" ->
      raw"""WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS w FROM documents),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM toks WHERE len(w) >= 5)),
occ AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY g) AS n_occ
  FROM grams),
drops AS (SELECT doc_id, pos FROM occ WHERE n_occ >= 2 AND rn >= 2),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
               OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5 THEN 1 ELSE 0 END AS new_run
  FROM drops),
runs AS (
  SELECT doc_id, run_id, min(pos) AS s, max(pos) + 4 AS e
  FROM (SELECT doc_id, pos, sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id FROM marked)
  GROUP BY doc_id, run_id),
covered AS (SELECT doc_id, unnest(range(s, e + 1)) AS p FROM runs),
tok AS (SELECT doc_id, idx, w[idx] AS tk
        FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS idx FROM toks)),
kept AS (
  SELECT t.doc_id, t.idx, t.tk
  FROM tok t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.idx = c.p
  WHERE c.p IS NULL)
SELECT d.doc_id, len(d.w)::BIGINT AS n_tok,
       coalesce(count(k.idx), 0)::BIGINT AS n_kept,
       (len(d.w) - coalesce(count(k.idx), 0))::BIGINT AS n_dropped,
       coalesce(string_agg(k.tk, ' ' ORDER BY k.idx), '') AS text_clean
FROM toks d LEFT JOIN kept k USING (doc_id)
WHERE d.doc_id >= 400
GROUP BY d.doc_id, len(d.w) ORDER BY d.doc_id""",
    // q168: the decision ladder in exact integer comparisons; has_hot is
    // EXISTS(count > threshold) == max(count) > threshold
    "q168_join_advice" ->
      """WITH ca AS (SELECT user_id AS k, count(*)::BIGINT AS c FROM events GROUP BY 1),
cb AS (SELECT o_custkey AS k, count(*)::BIGINT AS c FROM orders GROUP BY 1),
cc AS (SELECT c_nationkey AS k, count(*)::BIGINT AS c FROM customer GROUP BY 1),
cn AS (SELECT n_nationkey AS k, count(*)::BIGINT AS c FROM nation GROUP BY 1),
sa AS (SELECT coalesce(sum(c), 0)::BIGINT AS n, count(*)::BIGINT AS d, coalesce(max(c), 0)::BIGINT AS mx FROM ca),
sb AS (SELECT coalesce(sum(c), 0)::BIGINT AS n, count(*)::BIGINT AS d, coalesce(max(c), 0)::BIGINT AS mx FROM cb),
sc2 AS (SELECT coalesce(sum(c), 0)::BIGINT AS n, count(*)::BIGINT AS d, coalesce(max(c), 0)::BIGINT AS mx FROM cc),
sn AS (SELECT coalesce(sum(c), 0)::BIGINT AS n, count(*)::BIGINT AS d, coalesce(max(c), 0)::BIGINT AS mx FROM cn),
r AS (
 SELECT 'fact_fact' AS scenario, sa.n AS n_left, sa.d AS d_left, sb.n AS n_right, sb.d AS d_right,
        CASE WHEN sa.mx > 1000000000000 THEN 1 ELSE 0 END AS has_hot_left,
        CASE WHEN sb.mx > 1000000000000 THEN 1 ELSE 0 END AS has_hot_right,
        1000 AS brows FROM sa, sb
 UNION ALL
 SELECT 'fact_dim', sc2.n, sc2.d, sn.n, sn.d,
        CASE WHEN sc2.mx > 1000000000000 THEN 1 ELSE 0 END,
        CASE WHEN sn.mx > 1000000000000 THEN 1 ELSE 0 END, 1000 FROM sc2, sn
 UNION ALL
 SELECT 'forced_salt', sa.n, sa.d, sb.n, sb.d,
        CASE WHEN sa.mx > 0 THEN 1 ELSE 0 END,
        CASE WHEN sb.mx > 0 THEN 1 ELSE 0 END, 0 FROM sa, sb)
SELECT scenario, n_left, d_left, n_right, d_right, has_hot_left::INT AS has_hot_left, has_hot_right::INT AS has_hot_right,
  CASE WHEN least(n_left, n_right) <= brows THEN 'broadcast'
       WHEN has_hot_left = 1 OR has_hot_right = 1 THEN 'salted' ELSE 'shuffle' END AS strategy,
  CASE WHEN least(n_left, n_right) <= brows THEN (CASE WHEN n_right <= n_left THEN 'right' ELSE 'left' END) ELSE '' END AS broadcast_side
FROM r ORDER BY scenario""",
    // q169: the Bloom filter is correctness-transparent (fp cleared by the
    // exact join, fn impossible) — the oracle is the plain filtered join
    "q169_bloom_prune" ->
      """SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY 1, 2 ORDER BY o_orderpriority, month""",
    // q170: exactly 8 unrolled peels — a converged peel is a no-op, so
    // fixpoint-before-8 gives the same relation as the engine's 8 rounds
    "q170_dup_kcore" -> {
      // MATERIALIZED: each e_i is read 4× (degree union + two IN probes of
      // the next peel) — default per-reference inlining would expand the
      // whole LSH pipeline 4^8 times
      val peels = (0 until 8).map { i =>
        s"""d$i AS MATERIALIZED (SELECT v, count(*)::BIGINT AS c FROM (SELECT lo AS v FROM e$i UNION ALL SELECT hi AS v FROM e$i) GROUP BY v),
e${i + 1} AS MATERIALIZED (SELECT lo, hi FROM e$i WHERE lo IN (SELECT v FROM d$i WHERE c >= 2) AND hi IN (SELECT v FROM d$i WHERE c >= 2))"""
      }.mkString(",\n")
      s"""WITH $LshVerifiedCtes,
good AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 0.5),
e0 AS MATERIALIZED (SELECT least(id_a, id_b) AS lo, greatest(id_a, id_b) AS hi FROM good WHERE id_a <> id_b),
$peels
SELECT v AS doc_id, count(*)::BIGINT AS core_degree
FROM (SELECT lo AS v FROM e8 UNION ALL SELECT hi AS v FROM e8) GROUP BY v ORDER BY doc_id"""
    },
    // q171: same fused conditional counts; metrics integer-quantized
    "q171_constraint_report" ->
      """WITH m AS (SELECT count(*)::BIGINT AS n, count(props)::BIGINT AS n_props,
  count(DISTINCT event_id)::BIGINT AS n_eid,
  sum(CASE WHEN value >= 0 THEN 1 ELSE 0 END)::BIGINT AS n_nonneg,
  sum(CASE WHEN event_type IN ('view','click','purchase','signup','error') THEN 1 ELSE 0 END)::BIGINT AS n_domain,
  sum(CASE WHEN ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01' THEN 1 ELSE 0 END)::BIGINT AS n_window,
  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_err
  FROM events),
fk AS (SELECT (SELECT count(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)::BIGINT AS n_orphan, (SELECT count(*) FROM lineitem)::BIGINT AS n),
r AS (
  SELECT 'complete_props' AS check_name, ((n_props * 10000) // n)::DOUBLE / 10000.0 AS metric4, '>=' AS op, 0.999::DOUBLE AS threshold4 FROM m
  UNION ALL SELECT 'domain_event_type', ((n_domain * 10000) // n)::DOUBLE / 10000.0, '>=', 0.999::DOUBLE FROM m
  UNION ALL SELECT 'error_share_slo', ((n_err * 10000) // n)::DOUBLE / 10000.0, '<=', 0.01::DOUBLE FROM m
  UNION ALL SELECT 'nonneg_value', ((n_nonneg * 10000) // n)::DOUBLE / 10000.0, '>=', 0.999::DOUBLE FROM m
  UNION ALL SELECT 'ts_in_window', ((n_window * 10000) // n)::DOUBLE / 10000.0, '>=', 0.999::DOUBLE FROM m
  UNION ALL SELECT 'unique_event_id', ((n_eid * 10000) // n)::DOUBLE / 10000.0, '>=', 0.9999::DOUBLE FROM m
  UNION ALL SELECT 'fk_lineitem_orders', n_orphan::DOUBLE, '<=', 0.0::DOUBLE FROM fk)
SELECT check_name, metric4, op, threshold4,
  (CASE WHEN op = '>=' THEN metric4 >= threshold4 ELSE metric4 <= threshold4 END)::INT AS satisfied
FROM r ORDER BY check_name""",
    // q172: registers rebuilt per (source, lang) on the 64-bucket grid,
    // rolled up by plain GROUP-BY max — q128's estimator formula verbatim
    "q172_sketch_rollup" ->
      raw"""WITH tok AS (SELECT source, lang, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents),
vocab AS MATERIALIZED (SELECT DISTINCT source, lang, w FROM tok),
hashed AS (SELECT source, lang, ('0x' || substr(md5('hll:' || w), 1, 15))::BIGINT AS h FROM vocab),
br AS (SELECT source, lang, h % 64 AS bkt, least(bit_count(((h >> 6) & -(h >> 6)) - 1), 47) + 1 AS rnk FROM hashed),
grid AS (SELECT source, lang, i AS bkt FROM (SELECT DISTINCT source, lang FROM vocab) CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
regs AS MATERIALIZED (SELECT g.source, g.lang, g.bkt, coalesce(max(rnk), 0) AS m FROM grid g LEFT JOIN br ON g.source = br.source AND g.lang = br.lang AND g.bkt = br.bkt GROUP BY 1, 2, 3),
s0 AS (SELECT source, lang, sum(1::BIGINT << (48 - m))::BIGINT AS s, sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros FROM regs GROUP BY 1, 2),
s1 AS (SELECT source, sum(1::BIGINT << (48 - m))::BIGINT AS s, sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros FROM (SELECT source, bkt, max(m) AS m FROM regs GROUP BY 1, 2) GROUP BY 1),
s2 AS (SELECT sum(1::BIGINT << (48 - m))::BIGINT AS s, sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros FROM (SELECT bkt, max(m) AS m FROM regs GROUP BY 1)),
ex0 AS (SELECT source, lang, count(*)::BIGINT AS n_exact FROM vocab GROUP BY 1, 2),
ex1 AS (SELECT source, count(DISTINCT w)::BIGINT AS n_exact FROM vocab GROUP BY 1),
ex2 AS (SELECT count(DISTINCT w)::BIGINT AS n_exact FROM vocab),
r AS (
  SELECT '1_source_lang' AS level, s0.source, s0.lang, ex0.n_exact, s0.s, s0.zeros FROM s0 JOIN ex0 ON s0.source = ex0.source AND s0.lang = ex0.lang
  UNION ALL SELECT '2_source', s1.source, '', ex1.n_exact, s1.s, s1.zeros FROM s1 JOIN ex1 ON s1.source = ex1.source
  UNION ALL SELECT '3_global', '', '', ex2.n_exact, s2.s, s2.zeros FROM s2, ex2)
SELECT level, source, lang, n_exact,
  floor((CASE WHEN (0.709::DOUBLE * 4096.0 * 281474976710656.0 / s::DOUBLE) <= 160.0::DOUBLE AND zeros > 0 THEN 64.0::DOUBLE * ln(64.0::DOUBLE / zeros::DOUBLE) ELSE (0.709::DOUBLE * 4096.0 * 281474976710656.0 / s::DOUBLE) END) * 10000.0)::BIGINT::DOUBLE / 10000.0 AS est4
FROM r ORDER BY level, source, lang""",
    // q173: same instants as TIMESTAMP literals; leakage share integer-quantized
    "q173_embargo_split" ->
      """WITH ev AS (SELECT user_id, CASE WHEN ts < TIMESTAMP '2024-01-20' THEN 'train' WHEN ts >= TIMESTAMP '2024-01-22' THEN 'test' ELSE 'embargo' END AS split FROM events),
tu AS (SELECT DISTINCT user_id FROM ev WHERE split = 'train'),
ov AS (SELECT count(*)::BIGINT AS n_overlap_users FROM (SELECT DISTINCT user_id FROM ev WHERE split = 'test') t WHERE t.user_id IN (SELECT user_id FROM tu)),
lk AS (SELECT (SELECT count(*) FROM ev WHERE split = 'test' AND user_id IN (SELECT user_id FROM tu))::BIGINT AS n_leak, (SELECT count(*) FROM ev WHERE split = 'test')::BIGINT AS n_test)
SELECT split, count(*)::BIGINT AS n_events, count(DISTINCT user_id)::BIGINT AS n_users,
  (SELECT n_overlap_users FROM ov) AS n_overlap_users,
  ((SELECT (n_leak * 10000) // n_test FROM lk))::DOUBLE / 10000.0 AS overlap_test_share4
FROM ev GROUP BY split ORDER BY split""",
    // q174: length(bin(gap)) is floor(log2)+1 on both engines; gaps ≥ 1
    // because the first delta is against -1 and doc ids are distinct
    "q174_postings_size" ->
      raw"""WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS toks FROM documents),
dl AS (SELECT DISTINCT term, doc_id FROM (SELECT doc_id, unnest(toks) AS term FROM tk)),
g AS (SELECT term, doc_id - coalesce(lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id), -1) AS gap FROM dl),
st AS (SELECT term, count(*)::BIGINT AS df, max(gap)::BIGINT AS max_gap,
  sum(CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2 WHEN gap < 2097152 THEN 3 ELSE 4 END)::BIGINT AS varint_bytes
  FROM g GROUP BY term)
SELECT term, df, max_gap, varint_bytes,
  ((df * length(bin(max_gap)) + 7) // 8)::BIGINT AS bitpack_bytes,
  CASE WHEN ((df * length(bin(max_gap)) + 7) // 8) < varint_bytes THEN 'bitpack' ELSE 'varint' END AS winner
FROM st ORDER BY df DESC, term LIMIT 20""",
    // q175: class histogram + 3-row risk rollup, shares integer-quantized
    "q175_k_anonymity" ->
      """WITH cls AS (SELECT lang, source, n_chars // 100 AS len_bucket, count(*)::BIGINT AS sz FROM documents GROUP BY 1, 2, 3),
tot AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT CASE WHEN sz = 1 THEN '1_unique' WHEN sz < 5 THEN '2_small' ELSE '3_anonymous' END AS risk_class,
  count(*)::BIGINT AS n_classes, sum(sz)::BIGINT AS n_docs,
  ((sum(sz) * 10000) // n)::DOUBLE / 10000.0 AS docs_share4
FROM cls, tot GROUP BY 1, n ORDER BY risk_class""",
    // q176: the oracle recomputes from the FULL stream — equality proves
    // the engine's merge-of-partials refresh exact (q128's estimator)
    "q176_incremental_agg" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, cast(floor(value * 1000000) AS BIGINT) AS vu, ('0x' || substr(md5('ivm:' || user_id::VARCHAR), 1, 15))::BIGINT AS h FROM events),
scal AS (SELECT event_type, day, count(*)::BIGINT AS n, sum(vu)::BIGINT AS sum_value_u FROM ev GROUP BY 1, 2),
hashes AS (SELECT DISTINCT event_type, day, h FROM ev),
br AS (SELECT event_type, day, h % 64 AS bkt, least(bit_count(((h >> 6) & -(h >> 6)) - 1), 47) + 1 AS rnk FROM hashes),
grid AS (SELECT event_type, day, i AS bkt FROM (SELECT DISTINCT event_type, day FROM ev) CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
regs AS (SELECT g.event_type, g.day, g.bkt, coalesce(max(rnk), 0) AS m FROM grid g LEFT JOIN br ON g.event_type = br.event_type AND g.day = br.day AND g.bkt = br.bkt GROUP BY 1, 2, 3),
s0 AS (SELECT event_type, day, sum(1::BIGINT << (48 - m))::BIGINT AS s, sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros FROM regs GROUP BY 1, 2)
SELECT scal.event_type, scal.day, n, sum_value_u,
  floor((CASE WHEN (0.709::DOUBLE * 4096.0 * 281474976710656.0 / s::DOUBLE) <= 160.0::DOUBLE AND zeros > 0 THEN 64.0::DOUBLE * ln(64.0::DOUBLE / zeros::DOUBLE) ELSE (0.709::DOUBLE * 4096.0 * 281474976710656.0 / s::DOUBLE) END) * 10000.0)::BIGINT::DOUBLE / 10000.0 AS users_est4
FROM scal JOIN s0 ON scal.event_type = s0.event_type AND scal.day = s0.day
ORDER BY scal.event_type, scal.day""",
    // q177: DuckDB native ASOF after the same per-(user, instant) touch
    // reduction; the 7-day cut as an INTERVAL on timestamps ≡ the
    // engine's nano arithmetic
    "q177_attribution" ->
      """WITH p AS (SELECT user_id, ts, cast(floor(value * 1000000) AS BIGINT) AS vu FROM events WHERE event_type = 'purchase'),
tch AS (SELECT user_id, ts, max_by(event_type, event_id) AS et FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2),
j AS (SELECT p.ts AS pts, p.vu, c.ts AS t, c.et FROM p ASOF LEFT JOIN tch c ON p.user_id = c.user_id AND p.ts >= c.ts)
SELECT CASE WHEN t IS NULL OR pts - t > INTERVAL 7 DAY THEN 'direct' ELSE et END AS channel,
  count(*)::BIGINT AS n_purchases, sum(vu)::BIGINT AS sum_value_u
FROM j GROUP BY 1 ORDER BY channel""",
    // q178: codebooks/encode/LUT/ADC replayed relationally — argmin-L2 as
    // argmax(dot − ‖c‖²/2) with list_inner_product on DOUBLE casts, ADC
    // as BIGINT micro-sums, both rankings id-tiebroken
    "q178_pq_ann" ->
      """WITH subs AS (SELECT unnest(range(0, 8)) AS s),
seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
cb AS MATERIALIZED (SELECT s, code, embedding[s*8+1 : s*8+8] AS cent FROM seeds, subs),
cbs AS (SELECT s, code, cent, list_inner_product(cent::DOUBLE[], cent::DOUBLE[]) / 2.0 AS half_norm2 FROM cb),
enc AS MATERIALIZED (SELECT vec_id, s, code FROM (
  SELECT e.vec_id, c.s, c.code,
    row_number() OVER (PARTITION BY e.vec_id, c.s ORDER BY (list_inner_product((e.embedding[c.s*8+1 : c.s*8+8])::DOUBLE[], c.cent::DOUBLE[]) - c.half_norm2) DESC, c.code) AS rn
  FROM embeddings e, cbs c) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 16),
lut AS MATERIALIZED (SELECT query_id, s, code, floor(list_inner_product((qv[s*8+1 : s*8+8])::DOUBLE[], cent::DOUBLE[]) * 1000000.0)::BIGINT AS dot_u FROM q, cb),
adc AS (SELECT l.query_id, e.vec_id, sum(l.dot_u)::BIGINT AS adc_u FROM enc e JOIN lut l ON e.s = l.s AND e.code = l.code WHERE e.vec_id <> l.query_id GROUP BY 1, 2),
pq AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY adc_u DESC, vec_id) AS rn FROM adc) WHERE rn <= 10),
ex AS (SELECT query_id, vec_id FROM (SELECT q.query_id, e.vec_id, row_number() OVER (PARTITION BY q.query_id ORDER BY floor(list_inner_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) * 1000000.0)::BIGINT DESC, e.vec_id) AS rn FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rn <= 10),
hits AS (SELECT query_id, count(*)::BIGINT AS n_hits FROM pq JOIN ex USING (query_id, vec_id) GROUP BY 1)
SELECT q.query_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits, ((coalesce(h.n_hits, 0) * 10000) // 10)::DOUBLE / 10000.0 AS recall4
FROM q LEFT JOIN hits h ON q.query_id = h.query_id ORDER BY q.query_id""",
    // q179: per-day registers on the 64-bucket grid, window merge as a
    // BETWEEN join + max, q128's estimator; exact sidecar from the
    // (user, day)-distinct fan-out
    "q179_rolling_mau" ->
      """WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day, ('0x' || substr(md5('mau:' || user_id::VARCHAR), 1, 15))::BIGINT AS h, user_id FROM events),
days AS (SELECT DISTINCT day FROM ev),
hashes AS (SELECT DISTINCT day, h FROM ev),
br AS (SELECT day, h % 64 AS bkt, least(bit_count(((h >> 6) & -(h >> 6)) - 1), 47) + 1 AS rnk FROM hashes),
grid AS (SELECT day, i AS bkt FROM days CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
regs AS MATERIALIZED (SELECT g.day, g.bkt, coalesce(max(rnk), 0) AS m FROM grid g LEFT JOIN br ON g.day = br.day AND g.bkt = br.bkt GROUP BY 1, 2),
rolled AS (SELECT d2.day AS target_day, r.bkt, max(r.m) AS m FROM regs r JOIN days d2 ON d2.day BETWEEN r.day AND r.day + 6 GROUP BY 1, 2),
s0 AS (SELECT target_day, sum(1::BIGINT << (48 - m))::BIGINT AS s, sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)::BIGINT AS zeros FROM rolled GROUP BY 1),
ex AS (SELECT d2.day AS target_day, count(DISTINCT u.user_id)::BIGINT AS mau_exact FROM (SELECT DISTINCT day, user_id FROM ev) u JOIN days d2 ON d2.day BETWEEN u.day AND u.day + 6 GROUP BY 1)
SELECT s0.target_day AS day, ex.mau_exact,
  floor((CASE WHEN (0.709::DOUBLE * 4096.0 * 281474976710656.0 / s::DOUBLE) <= 160.0::DOUBLE AND zeros > 0 THEN 64.0::DOUBLE * ln(64.0::DOUBLE / zeros::DOUBLE) ELSE (0.709::DOUBLE * 4096.0 * 281474976710656.0 / s::DOUBLE) END) * 10000.0)::BIGINT::DOUBLE / 10000.0 AS mau_est4
FROM s0 JOIN ex ON s0.target_day = ex.target_day ORDER BY day""",
    // q180: the same anti-join cascade per relation; orphan probes are
    // the kept∩deleted intersection and must be 0
    "q180_delete_cascade" ->
      raw"""WITH del AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
post AS (SELECT doc_id FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS term FROM documents)),
r AS (
  SELECT '1_documents' AS relation,
    (SELECT count(*) FROM documents)::BIGINT AS n_before,
    (SELECT count(*) FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM del))::BIGINT AS n_after,
    (SELECT count(*) FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM del) AND doc_id IN (SELECT doc_id FROM del))::BIGINT AS n_orphans_after
  UNION ALL
  SELECT '2_postings',
    (SELECT count(*) FROM post)::BIGINT,
    (SELECT count(*) FROM post WHERE doc_id NOT IN (SELECT doc_id FROM del))::BIGINT,
    (SELECT count(*) FROM post WHERE doc_id NOT IN (SELECT doc_id FROM del) AND doc_id IN (SELECT doc_id FROM del))::BIGINT
  UNION ALL
  SELECT '3_embeddings',
    (SELECT count(*) FROM embeddings)::BIGINT,
    (SELECT count(*) FROM embeddings WHERE vec_id NOT IN (SELECT doc_id FROM del))::BIGINT,
    (SELECT count(*) FROM embeddings WHERE vec_id NOT IN (SELECT doc_id FROM del) AND vec_id IN (SELECT doc_id FROM del))::BIGINT)
SELECT relation, n_before, (n_before - n_after)::BIGINT AS n_deleted, n_after, n_orphans_after
FROM r ORDER BY relation""",
    // q181: q178's CTEs + shortlist / exact-rerank / ceiling stages
    "q181_pq_rerank" ->
      """WITH subs AS (SELECT unnest(range(0, 8)) AS s),
seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
cb AS MATERIALIZED (SELECT s, code, embedding[s*8+1 : s*8+8] AS cent FROM seeds, subs),
cbs AS (SELECT s, code, cent, list_inner_product(cent::DOUBLE[], cent::DOUBLE[]) / 2.0 AS half_norm2 FROM cb),
enc AS MATERIALIZED (SELECT vec_id, s, code FROM (
  SELECT e.vec_id, c.s, c.code,
    row_number() OVER (PARTITION BY e.vec_id, c.s ORDER BY (list_inner_product((e.embedding[c.s*8+1 : c.s*8+8])::DOUBLE[], c.cent::DOUBLE[]) - c.half_norm2) DESC, c.code) AS rn
  FROM embeddings e, cbs c) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 16),
lut AS MATERIALIZED (SELECT query_id, s, code, floor(list_inner_product((qv[s*8+1 : s*8+8])::DOUBLE[], cent::DOUBLE[]) * 1000000.0)::BIGINT AS dot_u FROM q, cb),
adc AS (SELECT l.query_id, e.vec_id, sum(l.dot_u)::BIGINT AS adc_u FROM enc e JOIN lut l ON e.s = l.s AND e.code = l.code WHERE e.vec_id <> l.query_id GROUP BY 1, 2),
short AS MATERIALIZED (SELECT query_id, vec_id, rn FROM (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY adc_u DESC, vec_id) AS rn FROM adc) WHERE rn <= 50),
rr AS (SELECT query_id, vec_id FROM (SELECT s2.query_id, s2.vec_id, row_number() OVER (PARTITION BY s2.query_id ORDER BY floor(list_inner_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) * 1000000.0)::BIGINT DESC, s2.vec_id) AS rn2 FROM short s2 JOIN embeddings e ON e.vec_id = s2.vec_id JOIN q ON q.query_id = s2.query_id) WHERE rn2 <= 10),
ex AS MATERIALIZED (SELECT query_id, vec_id FROM (SELECT q.query_id, e.vec_id, row_number() OVER (PARTITION BY q.query_id ORDER BY floor(list_inner_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) * 1000000.0)::BIGINT DESC, e.vec_id) AS rn FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rn <= 10),
h1 AS (SELECT p.query_id, count(*)::BIGINT AS nh FROM (SELECT query_id, vec_id FROM short WHERE rn <= 10) p JOIN ex USING (query_id, vec_id) GROUP BY 1),
h2 AS (SELECT rr.query_id, count(*)::BIGINT AS nh FROM rr JOIN ex USING (query_id, vec_id) GROUP BY 1),
h3 AS (SELECT s2.query_id, count(*)::BIGINT AS nh FROM short s2 JOIN ex ON ex.query_id = s2.query_id AND ex.vec_id = s2.vec_id GROUP BY 1)
SELECT q.query_id,
  coalesce(h1.nh, 0)::BIGINT AS n_hits_pq,
  coalesce(h2.nh, 0)::BIGINT AS n_hits_rerank,
  coalesce(h3.nh, 0)::BIGINT AS n_in_shortlist,
  ((coalesce(h1.nh, 0) * 10000) // 10)::DOUBLE / 10000.0 AS recall_pq4,
  ((coalesce(h2.nh, 0) * 10000) // 10)::DOUBLE / 10000.0 AS recall_rerank4
FROM q LEFT JOIN h1 ON q.query_id = h1.query_id LEFT JOIN h2 ON q.query_id = h2.query_id LEFT JOIN h3 ON q.query_id = h3.query_id
ORDER BY q.query_id""",
    // q182: plain NOT-EXISTS dominance — the grid cut is cost, not semantics
    "q182_pareto_frontier" ->
      raw"""WITH d AS (SELECT doc_id, len(toks)::BIGINT AS n_tok, len(list_distinct(toks))::BIGINT AS n_types FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS toks FROM documents) WHERE len(toks) > 0),
p AS MATERIALIZED (SELECT doc_id, n_tok, (n_types * 10000) // n_tok AS ttr4 FROM d)
SELECT doc_id, n_tok, ttr4 FROM p a
WHERE NOT EXISTS (SELECT 1 FROM p b WHERE b.n_tok >= a.n_tok AND b.ttr4 >= a.ttr4 AND (b.n_tok > a.n_tok OR b.ttr4 > a.ttr4))
ORDER BY doc_id""",
    // q183: q105's autoK/cells CTEs + per-cell bottom-k on the stable hash
    "q183_cell_balanced_sample" ->
      """WITH kk AS (SELECT greatest(8, (count(*) + 63) // 64) AS k FROM embeddings),
cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS srn FROM embeddings) s, kk WHERE s.srn <= kk.k),
cells AS (SELECT vec_id, centroid_id FROM (SELECT e.vec_id, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents c) WHERE rn = 1)
SELECT centroid_id, rk, vec_id FROM (
  SELECT centroid_id, vec_id,
    row_number() OVER (PARTITION BY centroid_id ORDER BY h, vec_id)::BIGINT AS rk
  FROM (SELECT centroid_id, vec_id, ('0x' || substr(md5('bal:' || vec_id::VARCHAR), 1, 15))::BIGINT AS h FROM cells))
WHERE rk <= 4 ORDER BY centroid_id, rk""",
    // q184: q105's coarse cells + q178's codes/LUT composed; candidates
    // restricted to the query's nprobe cells before ADC
    "q184_ivfadc" ->
      """WITH kk AS (SELECT greatest(8, (count(*) + 63) // 64) AS k FROM embeddings),
cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS srn FROM embeddings) s0, kk WHERE s0.srn <= kk.k),
cells AS MATERIALIZED (SELECT vec_id, centroid_id FROM (SELECT e.vec_id, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents c) WHERE rn = 1),
subs AS (SELECT unnest(range(0, 8)) AS s),
seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
cb AS MATERIALIZED (SELECT s, code, embedding[s*8+1 : s*8+8] AS cent FROM seeds, subs),
cbs AS (SELECT s, code, cent, list_inner_product(cent::DOUBLE[], cent::DOUBLE[]) / 2.0 AS half_norm2 FROM cb),
enc AS MATERIALIZED (SELECT vec_id, s, code FROM (
  SELECT e.vec_id, c.s, c.code,
    row_number() OVER (PARTITION BY e.vec_id, c.s ORDER BY (list_inner_product((e.embedding[c.s*8+1 : c.s*8+8])::DOUBLE[], c.cent::DOUBLE[]) - c.half_norm2) DESC, c.code) AS rn
  FROM embeddings e, cbs c) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 16),
qc AS MATERIALIZED (SELECT query_id, centroid_id, cell_rank FROM (SELECT q.query_id, c.centroid_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS cell_rank FROM q, cents c) WHERE cell_rank <= 8),
lut AS MATERIALIZED (SELECT query_id, s, code, floor(list_inner_product((qv[s*8+1 : s*8+8])::DOUBLE[], cent::DOUBLE[]) * 1000000.0)::BIGINT AS dot_u FROM q, cb),
cand AS MATERIALIZED (SELECT qc.query_id, e.vec_id, qc.cell_rank, sum(l.dot_u)::BIGINT AS adc_u
  FROM enc e JOIN cells cl ON cl.vec_id = e.vec_id
  JOIN qc ON qc.centroid_id = cl.centroid_id
  JOIN lut l ON l.query_id = qc.query_id AND l.s = e.s AND l.code = e.code
  WHERE e.vec_id <> qc.query_id GROUP BY 1, 2, 3),
ex AS MATERIALIZED (SELECT query_id, vec_id FROM (SELECT q.query_id, e.vec_id, row_number() OVER (PARTITION BY q.query_id ORDER BY floor(list_inner_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) * 1000000.0)::BIGINT DESC, e.vec_id) AS rn FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rn <= 10),
sw AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
scored AS MATERIALIZED (SELECT sw.nprobe, c.query_id, c.vec_id, c.adc_u FROM cand c JOIN sw ON c.cell_rank <= sw.nprobe),
hits AS (SELECT nprobe, count(*)::BIGINT AS n_hits FROM (SELECT nprobe, query_id, vec_id FROM (SELECT nprobe, query_id, vec_id, row_number() OVER (PARTITION BY nprobe, query_id ORDER BY adc_u DESC, vec_id) AS rn FROM scored) WHERE rn <= 10) t JOIN ex USING (query_id, vec_id) GROUP BY 1),
cc AS (SELECT nprobe, count(*)::BIGINT AS n_candidates FROM scored GROUP BY 1),
nq AS (SELECT count(*)::BIGINT AS n_q FROM q)
SELECT sw.nprobe, coalesce(cc.n_candidates, 0)::BIGINT AS n_candidates, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
  ((coalesce(h.n_hits, 0) * 10000) // (nq.n_q * 10))::DOUBLE / 10000.0 AS recall4
FROM sw LEFT JOIN cc ON sw.nprobe = cc.nprobe LEFT JOIN hits h ON sw.nprobe = h.nprobe, nq
ORDER BY sw.nprobe""",
    // q185: same single-window formulation with IGNORE NULLS carries
    "q185_proximity_rank" ->
      raw"""WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS toks FROM documents),
pos AS (SELECT doc_id, i::BIGINT AS pos, toks[i] AS term FROM (SELECT doc_id, unnest(range(1, len(toks)+1)) AS i, toks FROM tk) WHERE toks[i] IN ('hash', 'join')),
g AS (SELECT doc_id, term, pos,
  last_value(CASE WHEN term = 'hash' THEN pos END IGNORE NULLS) OVER (PARTITION BY doc_id ORDER BY pos, term ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_a,
  last_value(CASE WHEN term = 'join' THEN pos END IGNORE NULLS) OVER (PARTITION BY doc_id ORDER BY pos, term ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_b
  FROM pos)
SELECT doc_id, min(CASE WHEN term = 'hash' THEN pos - prev_b ELSE pos - prev_a END)::BIGINT AS min_span,
  sum(CASE WHEN term = 'hash' THEN 1 ELSE 0 END)::BIGINT AS n_a,
  sum(CASE WHEN term = 'join' THEN 1 ELSE 0 END)::BIGINT AS n_b
FROM g GROUP BY doc_id HAVING min_span IS NOT NULL
ORDER BY min_span, doc_id LIMIT 20""",
    // q186: plain BETWEEN join (the bucket cut is cost, not semantics),
    // identical integer credit ladder + last-touch remainder
    "q186_multitouch" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, cast(floor(value * 1000000) AS BIGINT) AS value_u, ts FROM events WHERE event_type = 'purchase'),
tch AS (SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS channel FROM events WHERE event_type <> 'purchase'),
j AS (SELECT p.p_id, p.value_u, t.channel, t.t_ts, t.t_id FROM p JOIN tch t ON t.user_id = p.user_id AND t.t_ts >= p.ts - INTERVAL 7 DAY AND t.t_ts < p.ts),
r AS (SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY t_ts, t_id) AS rn, count(*) OVER (PARTITION BY p_id) AS n FROM j),
b AS (SELECT *, CASE WHEN n = 1 THEN 10000 WHEN n = 2 THEN 5000 WHEN rn = 1 OR rn = n THEN 4000 ELSE 2000 // (n - 2) END AS bp FROM r),
c0 AS (SELECT *, (value_u * bp) // 10000 AS credit0 FROM b),
c AS (SELECT *, credit0 + CASE WHEN rn = n THEN value_u - sum(credit0) OVER (PARTITION BY p_id) ELSE 0 END AS credit_u FROM c0),
att AS (SELECT channel, count(*)::BIGINT AS n_touchpoints, sum(credit_u)::BIGINT AS credit_u FROM c GROUP BY 1),
direct AS (SELECT 'direct' AS channel, count(*)::BIGINT AS n_touchpoints, coalesce(sum(value_u), 0)::BIGINT AS credit_u FROM p WHERE p_id NOT IN (SELECT DISTINCT p_id FROM j))
SELECT channel, n_touchpoints, credit_u FROM (SELECT * FROM att UNION ALL SELECT * FROM direct) ORDER BY channel""",
    // q187: q164's component CTEs + node strength from the edge list +
    // per-component argmax
    "q187_medoid_survivors" ->
      s"""WITH RECURSIVE $LshVerifiedCtes,
good AS (SELECT id_a, id_b, est_jac FROM verified WHERE est_jac >= 0.75),
edges AS (SELECT id_a AS src, id_b AS dst FROM good UNION ALL SELECT id_b AS src, id_a AS dst FROM good),
reach AS (SELECT doc_id AS id, doc_id AS r FROM documents UNION SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id),
lab AS (SELECT id, min(r) AS keeper_id FROM reach GROUP BY id),
str AS (SELECT id, sum(w4)::BIGINT AS strength4, count(*)::BIGINT AS degree FROM (SELECT id_a AS id, floor(est_jac * 10000)::BIGINT AS w4 FROM good UNION ALL SELECT id_b AS id, floor(est_jac * 10000)::BIGINT AS w4 FROM good) GROUP BY id),
l2 AS (SELECT lab.keeper_id, str.id, str.strength4, str.degree FROM lab JOIN str ON lab.id = str.id),
sz AS (SELECT keeper_id, count(*)::BIGINT AS n_members FROM l2 GROUP BY 1),
m AS (SELECT keeper_id, id, strength4, degree, row_number() OVER (PARTITION BY keeper_id ORDER BY strength4 DESC, id) AS rk FROM l2)
SELECT m.keeper_id AS component_id, m.id AS medoid_id, sz.n_members, m.strength4, m.degree
FROM m JOIN sz ON m.keeper_id = sz.keeper_id WHERE m.rk = 1 AND sz.n_members >= 2 ORDER BY component_id""",
    // q188: the same cumulative-sum bucketing, ROWS-framed window per
    // source over the one-file-per-doc manifest
    "q188_compaction_plan" ->
      """WITH f AS (SELECT source, doc_id AS file_id, n_chars AS bytes FROM documents),
b AS (SELECT source, file_id, bytes, CASE WHEN bytes < 400 THEN 1 ELSE 0 END AS is_small,
  sum(CASE WHEN bytes < 400 THEN bytes ELSE 0 END) OVER (PARTITION BY source ORDER BY bytes DESC, file_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csum FROM f),
a AS (SELECT source, file_id, bytes, is_small, CASE WHEN is_small = 1 THEN (csum - 1) // 1500 END AS bin FROM b)
SELECT source, count(*)::BIGINT AS files_before, sum(is_small)::BIGINT AS n_small,
  sum(CASE WHEN is_small = 1 THEN bytes ELSE 0 END)::BIGINT AS small_bytes,
  count(DISTINCT bin)::BIGINT AS n_bins, sum(bytes)::BIGINT AS total_bytes,
  (count(*) - sum(is_small) + count(DISTINCT bin))::BIGINT AS files_after
FROM a GROUP BY source ORDER BY source""",
    // q189: HUGEINT moment sums are the oracle's exact twin of the
    // engine's decimal(38,0); the double ratio mirrors the engine's
    // operation order token for token
    "q189_cuped" ->
      """WITH u AS (SELECT user_id,
  sum(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN cast(floor(value * 1000000) AS BIGINT) ELSE 0 END) AS xu,
  sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' THEN cast(floor(value * 1000000) AS BIGINT) ELSE 0 END) AS yu
  FROM events GROUP BY 1),
mom AS (SELECT count(*)::BIGINT AS n, sum(xu) AS sx, sum(yu) AS sy,
  sum(xu::HUGEINT * yu::HUGEINT) AS sxy, sum(xu::HUGEINT * xu::HUGEINT) AS sxx FROM u),
arms AS (SELECT ('0x' || substr(md5('ab:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 AS cohort,
  count(*)::BIGINT AS n_users, sum(xu) AS sx_a, sum(yu) AS sy_a FROM u GROUP BY 1),
j AS (SELECT cohort, n_users, sx_a, sy_a, n, sx, sy, sxy, sxx,
  n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS denom FROM arms, mom),
th AS (SELECT *, CASE WHEN denom > 0.0 THEN (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) / denom END AS theta FROM j)
SELECT cohort, n_users,
  floor((sx_a::DOUBLE / n_users::DOUBLE) / 100.0)::BIGINT AS mean_x4u,
  floor((sy_a::DOUBLE / n_users::DOUBLE) / 100.0)::BIGINT AS mean_y4u,
  floor(theta * 1000000.0)::BIGINT AS theta6,
  floor(((sy_a::DOUBLE / n_users::DOUBLE) - theta * (sx_a::DOUBLE / n_users::DOUBLE - sx::DOUBLE / n::DOUBLE)) / 100.0)::BIGINT AS mean_yadj4u
FROM th ORDER BY cohort""",
    // q190: exact distinct-source diversity per quasi-id class
    "q190_l_diversity" ->
      """WITH cls AS (SELECT lang, n_chars // 20 AS len_bucket, count(DISTINCT source)::BIGINT AS ndv, count(*)::BIGINT AS sz FROM documents GROUP BY 1, 2)
SELECT CASE WHEN ndv < 3 THEN '1_risky' ELSE '2_diverse' END AS risk_class,
  count(*)::BIGINT AS n_classes, sum(sz)::BIGINT AS n_docs,
  min(ndv) AS min_ndv, max(ndv) AS max_ndv
FROM cls GROUP BY 1 ORDER BY risk_class""",
    // q191: brute-force max-cosine vs the mod-50 eval slice, quantized
    // after the max (q30's double policy)
    "q191_semantic_decontam" ->
      """WITH ev AS (SELECT vec_id AS eval_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 25000),
tr AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE NOT (vec_id % 50 = 0 AND vec_id < 25000)),
m AS (SELECT tr.vec_id, tr.label, floor(max(list_cosine_similarity(tr.v, ev.v)) * 10000.0)::BIGINT AS ms4 FROM tr, ev GROUP BY 1, 2)
SELECT label, count(*)::BIGINT AS n_train,
  sum(CASE WHEN ms4 >= 3000 THEN 1 ELSE 0 END)::BIGINT AS n_contaminated,
  max(ms4) AS max_ms4
FROM m GROUP BY 1 ORDER BY label""",
    // q192: the GLOBAL sweep-line the engine decomposes — prefix sums are
    // associative, so carry-in + local prefix ≡ this one total-order
    // window; peer-inclusive RANGE frames on both engines make ties
    // order-independent
    "q192_peak_concurrency" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
l AS (SELECT user_id, tus, event_id,
  CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
        OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 21600000000 THEN 1 ELSE 0 END AS brk FROM ev),
s AS (SELECT user_id, tus, sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS sid FROM l),
sess AS (SELECT user_id, sid, min(tus) AS st, max(tus) AS en FROM s GROUP BY 1, 2),
pts AS (SELECT st AS tus, 1 AS d FROM sess UNION ALL SELECT en AS tus, -1 AS d FROM sess),
run AS (SELECT tus // 86400000000 AS bucket, d, sum(d) OVER (ORDER BY tus, d) AS pfx FROM pts)
SELECT bucket, sum(CASE WHEN d = 1 THEN 1 ELSE 0 END)::BIGINT AS n_starts,
  sum(CASE WHEN d = -1 THEN 1 ELSE 0 END)::BIGINT AS n_ends,
  max(pfx)::BIGINT AS peak
FROM run GROUP BY 1 ORDER BY bucket""",
    // q193: doc frequency on md5-derived paragraph hashes (the engine's
    // stableHash64), within-doc repeats distinct-ed out of the frequency
    // but fully counted in the strip
    "q193_boilerplate_strip" ->
      raw"""WITH toks AS (SELECT doc_id, source, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS tk FROM documents),
segs AS (SELECT doc_id, source, array_to_string(tk[(i-1)*3+1 : i*3], ' ') AS p
  FROM toks, (SELECT unnest(range(1, 1000)) AS i) WHERE len(tk) > 0 AND (i-1)*3 < len(tk)),
seg2 AS (SELECT doc_id, source, p, len(string_split(p, ' '))::BIGINT AS n_tok, ('0x' || substr(md5(p), 1, 15))::BIGINT AS ph FROM segs),
perdoc AS (SELECT DISTINCT source, doc_id, ph FROM seg2),
sizes AS (SELECT source, count(DISTINCT doc_id) AS n_docs_src FROM perdoc GROUP BY 1),
freq AS (SELECT source, ph, count(*)::BIGINT AS df_docs FROM perdoc GROUP BY 1, 2),
tmpl AS (SELECT f.source, f.ph FROM freq f JOIN sizes s ON f.source = s.source WHERE f.df_docs >= 2 AND f.df_docs * 10000 >= s.n_docs_src * 100)
SELECT s2.source, count(DISTINCT s2.ph)::BIGINT AS n_template_pars,
  count(DISTINCT s2.doc_id)::BIGINT AS n_docs_affected,
  count(*)::BIGINT AS n_instances_removed, sum(s2.n_tok)::BIGINT AS n_tokens_removed
FROM seg2 s2 JOIN tmpl ON s2.source = tmpl.source AND s2.ph = tmpl.ph
GROUP BY 1 ORDER BY s2.source""",
    // q194: rank on the same salted md5 hash, top-5 per language
    "q194_group_sample" ->
      """WITH h AS (SELECT lang, doc_id, ('0x' || substr(md5('samp:' || doc_id::VARCHAR), 1, 15))::BIGINT AS h FROM documents),
r AS (SELECT lang, doc_id, h, row_number() OVER (PARTITION BY lang ORDER BY h DESC, doc_id) AS rk FROM h)
SELECT lang, rk::BIGINT AS rk, doc_id, h FROM r WHERE rk <= 5 ORDER BY lang, rk""",
    // q195: both retrieval rounds + the positional-mean feedback vector
    // replayed relationally; FLOAT cast per component (q166's policy)
    "q195_rocchio_feedback" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id IN (0, 1, 2)),
r1 AS (SELECT query_id, neighbor_id FROM (SELECT q.query_id, e.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, e.vec_id) AS rn FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rn <= 5),
fb AS (SELECT query_id, pos, avg(comp) AS m FROM (SELECT r1.query_id, unnest(e.embedding::DOUBLE[]) AS comp, unnest(range(0, len(e.embedding))) AS pos FROM r1 JOIN embeddings e ON e.vec_id = r1.neighbor_id) GROUP BY 1, 2),
q2 AS (SELECT qq.query_id, list((0.5 * qc + 0.5 * m)::FLOAT ORDER BY qq.pos) AS qv FROM (SELECT q.query_id, unnest(q.embedding::DOUBLE[]) AS qc, unnest(range(0, len(q.embedding))) AS pos FROM q) qq JOIN fb ON qq.query_id = fb.query_id AND qq.pos = fb.pos GROUP BY qq.query_id),
r2 AS (SELECT query_id, neighbor_id, sc, rn AS rank FROM (SELECT q2.query_id, e.vec_id AS neighbor_id, list_cosine_similarity(e.embedding::DOUBLE[], q2.qv::DOUBLE[]) AS sc, row_number() OVER (PARTITION BY q2.query_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q2.qv::DOUBLE[]) DESC, e.vec_id) AS rn FROM embeddings e, q2 WHERE e.vec_id <> q2.query_id) WHERE rn <= 8)
SELECT r2.query_id, r2.rank::BIGINT AS rank, r2.neighbor_id,
  floor(r2.sc * 10000.0) / 10000.0 AS score4,
  (CASE WHEN r1.neighbor_id IS NULL THEN 1 ELSE 0 END)::INT AS is_new
FROM r2 LEFT JOIN r1 ON r2.query_id = r1.query_id AND r2.neighbor_id = r1.neighbor_id
ORDER BY r2.query_id, r2.rank""",
    // q196: integer CUSUM of (n·D − N), argmax packed with the
    // earlier-day tiebreak exactly as the engine packs it
    "q196_cusum_changepoint" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
tot AS (SELECT event_type, sum(n)::BIGINT AS total, count(*)::BIGINT AS n_days FROM daily GROUP BY 1),
cs AS (SELECT d.event_type, d.day, t.n_days, t.total,
  sum(d.n * t.n_days - t.total) OVER (PARTITION BY d.event_type ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM daily d JOIN tot t ON d.event_type = t.event_type)
SELECT event_type, max(n_days) AS n_days, max(total) AS total,
  (9999999 - (max(abs(cusum) * 10000000 + (9999999 - day)) % 10000000))::BIGINT AS cp_day,
  (max(abs(cusum) * 10000000 + (9999999 - day)) // 10000000)::BIGINT AS cusum_abs
FROM cs GROUP BY event_type ORDER BY event_type""",
    // q197: the full RM3 loop relationally — per-(doc, term) micro-unit
    // contributions (exactly the engine's bm25MicroScores algebra), term
    // selection and both rankings id/lex-tiebroken
    "q197_rm3_expansion" ->
      raw"""WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS tk FROM documents),
dl AS (SELECT doc_id, len(tk)::DOUBLE AS dl, tk FROM toks),
st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
bt AS (SELECT unnest(['join', 'vector', 'window', 'stream']) AS term),
tf1 AS (SELECT d.doc_id, bt.term, len(list_filter(d.tk, x -> x = bt.term))::DOUBLE AS tf, d.dl FROM dl d, bt),
df1 AS (SELECT term, sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::DOUBLE AS df FROM tf1 GROUP BY 1),
sc1 AS (SELECT t.doc_id,
  sum(floor((floor(ln(((n_docs - df + 0.5) / (df + 0.5)) + 1.0) * 10000.0) / 10000.0) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1000000.0))::BIGINT AS score_u,
  sum(tf) AS tfsum
  FROM tf1 t JOIN df1 USING (term), st GROUP BY t.doc_id HAVING sum(tf) > 0),
r1 AS (SELECT doc_id, score_u, row_number() OVER (ORDER BY score_u DESC, doc_id) AS rk FROM sc1),
fb AS (SELECT doc_id FROM r1 WHERE rk <= 5),
exp AS (SELECT w FROM (SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rk FROM (SELECT unnest(tk) AS w FROM dl JOIN fb USING (doc_id)) ww(w)
  WHERE len(w) >= 3 AND w NOT IN ('join', 'vector', 'window', 'stream', 'the', 'a', 'of', 'and', 'is', 'to', 'in', 'that', 'it', 'with', 'el', 'la', 'de', 'que', 'y', 'en', 'un', 'los', 'se', 'por', 'der', 'die', 'das', 'und', 'ist', 'nicht', 'ein', 'mit', 'auf', 'zu', 'le', 'les', 'est', 'une', 'dans')
  GROUP BY w) WHERE rk <= 3),
t2 AS (SELECT term FROM bt UNION ALL SELECT w FROM exp),
tf2 AS (SELECT d.doc_id, t2.term, len(list_filter(d.tk, x -> x = t2.term))::DOUBLE AS tf, d.dl FROM dl d, t2),
df2 AS (SELECT term, sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::DOUBLE AS df FROM tf2 GROUP BY 1),
sc2 AS (SELECT t.doc_id,
  sum(floor((floor(ln(((n_docs - df + 0.5) / (df + 0.5)) + 1.0) * 10000.0) / 10000.0) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1000000.0))::BIGINT AS score_u,
  sum(tf) AS tfsum
  FROM tf2 t JOIN df2 USING (term), st GROUP BY t.doc_id HAVING sum(tf) > 0),
r2 AS (SELECT doc_id, score_u, row_number() OVER (ORDER BY score_u DESC, doc_id) AS rank FROM sc2)
SELECT r2.rank::BIGINT AS rank, r2.doc_id, r2.score_u,
  (CASE WHEN r1k.doc_id IS NULL THEN 1 ELSE 0 END)::INT AS is_new
FROM r2 LEFT JOIN (SELECT doc_id FROM r1 WHERE rk <= 10) r1k ON r2.doc_id = r1k.doc_id
WHERE r2.rank <= 10 ORDER BY r2.rank""",
    // q198: the same cross-multiplied integer KS max over the jump grid
    "q198_ks_drift" ->
      """WITH cnt AS (SELECT source, n_chars AS v, count(*)::BIGINT AS c FROM documents GROUP BY 1, 2),
ns AS (SELECT source, sum(c)::BIGINT AS n1 FROM cnt GROUP BY 1),
tot AS (SELECT sum(c)::BIGINT AS n FROM cnt),
gc AS (SELECT v, sum(cv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS call FROM (SELECT v, sum(c)::BIGINT AS cv FROM cnt GROUP BY 1)),
grid AS (SELECT ns.source, ns.n1, vals.v FROM ns, (SELECT DISTINCT v FROM cnt) vals),
c1 AS (SELECT g.source, g.n1, g.v, sum(coalesce(cnt.c, 0)) OVER (PARTITION BY g.source ORDER BY g.v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS c1 FROM grid g LEFT JOIN cnt ON cnt.source = g.source AND cnt.v = g.v),
m AS (SELECT c1.source, c1.n1, n, max(abs(c1.c1 * (n - c1.n1) - (gc.call - c1.c1) * c1.n1))::BIGINT AS maxnum FROM c1 JOIN gc USING (v), tot GROUP BY 1, 2, 3)
SELECT source, n1 AS n_docs, ((maxnum * 10000) // (n1 * (n - n1)))::BIGINT AS d4,
  (CASE WHEN ((maxnum * 10000) // (n1 * (n - n1))) > floor(1.358 * sqrt(n::DOUBLE / (n1::DOUBLE * (n - n1)::DOUBLE)) * 10000.0)::BIGINT THEN 1 ELSE 0 END)::INT AS flagged
FROM m ORDER BY source""",
    // q199: ascending (count, word) vocab ranks; gini as one integer div
    "q199_token_gini" ->
      raw"""WITH cnt AS (SELECT lang, w, count(*)::BIGINT AS c FROM (SELECT lang, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '')) AS w FROM documents) GROUP BY 1, 2),
r AS (SELECT lang, c, row_number() OVER (PARTITION BY lang ORDER BY c, w) AS i FROM cnt)
SELECT lang, count(*)::BIGINT AS vocab, sum(c)::BIGINT AS n_tok,
  ((2 * sum(i * c) - (count(*) + 1) * sum(c)) * 10000 // (count(*) * sum(c)))::BIGINT AS gini4
FROM r GROUP BY lang ORDER BY lang""",
    // q200: Newman r from HUGEINT stub moments over the same verified
    // 0.75 LSH graph, one pinned double ratio
    "q200_dup_assortativity" ->
      s"""WITH $LshVerifiedCtes,
good AS (SELECT id_a AS lo, id_b AS hi FROM verified WHERE est_jac >= 0.75),
deg AS (SELECT v, count(*)::BIGINT AS d FROM (SELECT lo AS v FROM good UNION ALL SELECT hi AS v FROM good) GROUP BY 1),
st AS (SELECT count(*)::BIGINT AS n_edges, sum(dl.d + dh.d)::BIGINT AS sx,
  sum(2::HUGEINT * dl.d::HUGEINT * dh.d::HUGEINT) AS sxy,
  sum(dl.d::HUGEINT * dl.d::HUGEINT + dh.d::HUGEINT * dh.d::HUGEINT) AS sxx
  FROM good JOIN deg dl ON good.lo = dl.v JOIN deg dh ON good.hi = dh.v),
nn AS (SELECT count(*)::BIGINT AS n_nodes FROM deg)
SELECT n_nodes, n_edges,
  CASE WHEN (2 * n_edges)::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0.0
    THEN floor(((2 * n_edges)::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sx::DOUBLE) / ((2 * n_edges)::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) * 1000000.0)::BIGINT END AS r6
FROM nn, st""",
    // q201: q108's unrolled 3-iteration integer walk with the teleport
    // restricted to the seed indicator
    "q201_personalized_pagerank" ->
      s"""WITH $LshVerifiedCtes, prs AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 0.5),
edges AS (SELECT src, dst FROM (SELECT id_a AS src, id_b AS dst FROM prs UNION SELECT id_b, id_a FROM prs) WHERE src <> dst),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT src AS id, deg, CASE WHEN src IN (0, 7) THEN 1 ELSE 0 END AS s, (CASE WHEN src IN (0, 7) THEN 1000000 ELSE 0 END)::BIGINT AS rank_u FROM deg),
c1 AS (SELECT e.dst, sum(r.rank_u // r.deg)::BIGINT AS m FROM edges e JOIN r0 r ON e.src = r.id GROUP BY e.dst),
r1 AS (SELECT r.id, r.deg, r.s, (r.s * 150000 + (85 * coalesce(m, 0)) // 100)::BIGINT AS rank_u FROM r0 r LEFT JOIN c1 ON r.id = c1.dst),
c2 AS (SELECT e.dst, sum(r.rank_u // r.deg)::BIGINT AS m FROM edges e JOIN r1 r ON e.src = r.id GROUP BY e.dst),
r2 AS (SELECT r.id, r.deg, r.s, (r.s * 150000 + (85 * coalesce(m, 0)) // 100)::BIGINT AS rank_u FROM r1 r LEFT JOIN c2 ON r.id = c2.dst),
c3 AS (SELECT e.dst, sum(r.rank_u // r.deg)::BIGINT AS m FROM edges e JOIN r2 r ON e.src = r.id GROUP BY e.dst),
r3 AS (SELECT r.id, r.deg, r.s, (r.s * 150000 + (85 * coalesce(m, 0)) // 100)::BIGINT AS rank_u FROM r2 r LEFT JOIN c3 ON r.id = c3.dst)
SELECT id AS doc_id, deg, rank_u FROM r3 WHERE rank_u > 0 ORDER BY rank_u DESC, doc_id LIMIT 20""",
    // q202: native CUBE + packed GROUPING bitmask, same 'ALL' coalesce
    "q202_cube_revenue" ->
      """SELECT grouping(o_orderstatus, o_orderpriority)::BIGINT AS gid,
  coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
  count(*)::BIGINT AS n, round(sum(o_totalprice), 2) AS rev
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, status, priority""",
    // q208: per-lang nearest-rank — the oracle sorts per group, the
    // engine must not
    "q208_group_quantiles" ->
      """WITH r AS (SELECT lang, n_chars AS v, row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn, count(*) OVER (PARTITION BY lang) AS n FROM documents),
p AS (SELECT unnest([2500, 5000, 9000, 9900]) AS p4),
t AS (SELECT lang, p4, (p4 * n + 9999) // 10000 AS rank FROM (SELECT DISTINCT lang, n FROM r), p)
SELECT t.lang, p4::DOUBLE / 10000.0 AS prob4, t.rank::BIGINT AS rank, r.v::BIGINT AS value
FROM t JOIN r ON r.lang = t.lang AND r.rn = t.rank ORDER BY t.lang, prob4""",
    // q209: the engine's pixels are a REAL PNG encode→ImageIO decode
    // roundtrip of this md5 closed form (lossless grayscale; luma weights
    // sum to 256), so the oracle replays pixels → aHash/dHash bands →
    // band-bucket candidates → hamming arithmetically, no codec needed
    "q209_image_phash_neardup" ->
      """WITH ii AS (SELECT unnest(range(0, 64)) AS i),
px AS (SELECT d.doc_id, ii.i,
  CASE WHEN ('0x' || substr(md5('pert:' || d.doc_id::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT % 29 = 0
    THEN 255 - ('0x' || substr(md5((d.doc_id // 4)::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT
    ELSE ('0x' || substr(md5((d.doc_id // 4)::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT END AS px
  FROM documents d, ii),
s AS (SELECT doc_id, sum(px)::BIGINT AS tot FROM px GROUP BY 1),
ab AS (SELECT px.doc_id, px.i // 16 AS b,
  sum(CASE WHEN px.px * 64 > s.tot THEN 1::BIGINT << (px.i % 16) ELSE 0 END)::BIGINT AS v
  FROM px JOIN s USING (doc_id) GROUP BY 1, 2),
db AS (SELECT a.doc_id, (a.i // 8) // 2 AS b,
  sum(CASE WHEN a.px > b2.px THEN 1::BIGINT << (((a.i // 8) % 2) * 7 + (a.i % 8)) ELSE 0 END)::BIGINT AS v
  FROM px a JOIN px b2 ON a.doc_id = b2.doc_id AND b2.i = a.i + 1 AND a.i % 8 < 7 GROUP BY 1, 2),
ha AS (SELECT doc_id, max(CASE WHEN b = 0 THEN v END) AS a0, max(CASE WHEN b = 1 THEN v END) AS a1,
  max(CASE WHEN b = 2 THEN v END) AS a2, max(CASE WHEN b = 3 THEN v END) AS a3 FROM ab GROUP BY 1),
hd AS (SELECT doc_id, max(CASE WHEN b = 0 THEN v END) AS d0, max(CASE WHEN b = 1 THEN v END) AS d1,
  max(CASE WHEN b = 2 THEN v END) AS d2, max(CASE WHEN b = 3 THEN v END) AS d3 FROM db GROUP BY 1),
cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM ab x JOIN ab y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id)
SELECT c.id_a, c.id_b,
  (bit_count(xor(pa.a0, qa.a0)) + bit_count(xor(pa.a1, qa.a1)) + bit_count(xor(pa.a2, qa.a2)) + bit_count(xor(pa.a3, qa.a3)))::BIGINT AS ham_a,
  (bit_count(xor(pd.d0, qd.d0)) + bit_count(xor(pd.d1, qd.d1)) + bit_count(xor(pd.d2, qd.d2)) + bit_count(xor(pd.d3, qd.d3)))::BIGINT AS ham_d
FROM cand c JOIN ha pa ON c.id_a = pa.doc_id JOIN ha qa ON c.id_b = qa.doc_id
JOIN hd pd ON c.id_a = pd.doc_id JOIN hd qd ON c.id_b = qd.doc_id
WHERE (bit_count(xor(pa.a0, qa.a0)) + bit_count(xor(pa.a1, qa.a1)) + bit_count(xor(pa.a2, qa.a2)) + bit_count(xor(pa.a3, qa.a3))) <= 12
ORDER BY c.id_a, c.id_b""",
    // q210: q184's build CTEs (coarse cells, PQ codebook, codes, LUT)
    // with the serve read at nprobe = 4 returning the top-10 lists the
    // persisted index produces
    "q210_ann_index_serve" ->
      """WITH kk AS (SELECT greatest(8, (count(*) + 63) // 64) AS k FROM embeddings),
cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS srn FROM embeddings) s0, kk WHERE s0.srn <= kk.k),
cells AS MATERIALIZED (SELECT vec_id, centroid_id FROM (SELECT e.vec_id, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents c) WHERE rn = 1),
subs AS (SELECT unnest(range(0, 8)) AS s),
seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
cb AS MATERIALIZED (SELECT s, code, embedding[s*8+1 : s*8+8] AS cent FROM seeds, subs),
cbs AS (SELECT s, code, cent, list_inner_product(cent::DOUBLE[], cent::DOUBLE[]) / 2.0 AS half_norm2 FROM cb),
enc AS MATERIALIZED (SELECT vec_id, s, code FROM (
  SELECT e.vec_id, c.s, c.code,
    row_number() OVER (PARTITION BY e.vec_id, c.s ORDER BY (list_inner_product((e.embedding[c.s*8+1 : c.s*8+8])::DOUBLE[], c.cent::DOUBLE[]) - c.half_norm2) DESC, c.code) AS rn
  FROM embeddings e, cbs c) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 16),
qc AS MATERIALIZED (SELECT query_id, centroid_id FROM (SELECT q.query_id, c.centroid_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS cell_rank FROM q, cents c) WHERE cell_rank <= 4),
lut AS MATERIALIZED (SELECT query_id, s, code, floor(list_inner_product((qv[s*8+1 : s*8+8])::DOUBLE[], cent::DOUBLE[]) * 1000000.0)::BIGINT AS dot_u FROM q, cb),
cand AS (SELECT qc.query_id, e.vec_id, sum(l.dot_u)::BIGINT AS adc_u
  FROM enc e JOIN cells cl ON cl.vec_id = e.vec_id
  JOIN qc ON qc.centroid_id = cl.centroid_id
  JOIN lut l ON l.query_id = qc.query_id AND l.s = e.s AND l.code = e.code
  WHERE e.vec_id <> qc.query_id GROUP BY 1, 2)
SELECT query_id, rn::BIGINT AS rank, vec_id, adc_u
FROM (SELECT query_id, vec_id, adc_u, row_number() OVER (PARTITION BY query_id ORDER BY adc_u DESC, vec_id) AS rn FROM cand)
WHERE rn <= 10 ORDER BY query_id, rank""",
    // q214: verified-LSH text pairs × the image pixel/band/hamming replay
    // (image CTEs prefixed i- to avoid colliding with the LSH names),
    // full-outer 3-way census
    "q214_multimodal_agreement" ->
      s"""WITH $LshVerifiedCtes,
tp AS (SELECT id_a, id_b, 1 AS t FROM verified WHERE est_jac >= 0.75),
ii AS (SELECT unnest(range(0, 64)) AS i),
ipx AS (SELECT d.doc_id, ii.i,
  CASE WHEN ('0x' || substr(md5('pert:' || d.doc_id::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT % 29 = 0
    THEN 255 - ('0x' || substr(md5((d.doc_id // 4)::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT
    ELSE ('0x' || substr(md5((d.doc_id // 4)::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT END AS px
  FROM documents d, ii),
isum AS (SELECT doc_id, sum(px)::BIGINT AS tot FROM ipx GROUP BY 1),
iab AS (SELECT ipx.doc_id, ipx.i // 16 AS b,
  sum(CASE WHEN ipx.px * 64 > isum.tot THEN 1::BIGINT << (ipx.i % 16) ELSE 0 END)::BIGINT AS v
  FROM ipx JOIN isum USING (doc_id) GROUP BY 1, 2),
iha AS (SELECT doc_id, max(CASE WHEN b = 0 THEN v END) AS a0, max(CASE WHEN b = 1 THEN v END) AS a1,
  max(CASE WHEN b = 2 THEN v END) AS a2, max(CASE WHEN b = 3 THEN v END) AS a3 FROM iab GROUP BY 1),
icand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM iab x JOIN iab y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
ip AS (SELECT id_a, id_b, 1 AS i FROM (SELECT c.id_a, c.id_b,
  (bit_count(xor(pa.a0, qa.a0)) + bit_count(xor(pa.a1, qa.a1)) + bit_count(xor(pa.a2, qa.a2)) + bit_count(xor(pa.a3, qa.a3)))::BIGINT AS ham_a
  FROM icand c JOIN iha pa ON c.id_a = pa.doc_id JOIN iha qa ON c.id_b = qa.doc_id) WHERE ham_a <= 6)
SELECT CASE WHEN coalesce(t, 0) = 1 AND coalesce(i, 0) = 1 THEN '1_both'
  WHEN coalesce(t, 0) = 1 THEN '2_text_only' ELSE '3_image_only' END AS agreement,
  count(*)::BIGINT AS n_pairs
FROM tp FULL OUTER JOIN ip USING (id_a, id_b)
GROUP BY 1 ORDER BY agreement""",
    // q213: q209's pixel/band/hamming replay, tight pairs (≤ 6), then the
    // q53 recursive-CTE component resolution and per-cluster census
    "q213_image_dedup_clusters" ->
      """WITH RECURSIVE ii AS (SELECT unnest(range(0, 64)) AS i),
px AS (SELECT d.doc_id, ii.i,
  CASE WHEN ('0x' || substr(md5('pert:' || d.doc_id::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT % 29 = 0
    THEN 255 - ('0x' || substr(md5((d.doc_id // 4)::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT
    ELSE ('0x' || substr(md5((d.doc_id // 4)::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT END AS px
  FROM documents d, ii),
s AS (SELECT doc_id, sum(px)::BIGINT AS tot FROM px GROUP BY 1),
ab AS (SELECT px.doc_id, px.i // 16 AS b,
  sum(CASE WHEN px.px * 64 > s.tot THEN 1::BIGINT << (px.i % 16) ELSE 0 END)::BIGINT AS v
  FROM px JOIN s USING (doc_id) GROUP BY 1, 2),
ha AS (SELECT doc_id, max(CASE WHEN b = 0 THEN v END) AS a0, max(CASE WHEN b = 1 THEN v END) AS a1,
  max(CASE WHEN b = 2 THEN v END) AS a2, max(CASE WHEN b = 3 THEN v END) AS a3 FROM ab GROUP BY 1),
cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM ab x JOIN ab y ON x.b = y.b AND x.v = y.v AND x.doc_id < y.doc_id),
prs AS (SELECT c.id_a, c.id_b,
  (bit_count(xor(pa.a0, qa.a0)) + bit_count(xor(pa.a1, qa.a1)) + bit_count(xor(pa.a2, qa.a2)) + bit_count(xor(pa.a3, qa.a3)))::BIGINT AS ham_a
  FROM cand c JOIN ha pa ON c.id_a = pa.doc_id JOIN ha qa ON c.id_b = qa.doc_id),
good AS (SELECT id_a, id_b, ham_a FROM prs WHERE ham_a <= 6),
edges AS (SELECT id_a AS src, id_b AS dst FROM good UNION ALL SELECT id_b AS src, id_a AS dst FROM good),
reach AS (SELECT doc_id AS id, doc_id AS r FROM documents UNION SELECT e.dst AS id, reach.r AS r FROM reach JOIN edges e ON e.src = reach.id),
lab AS (SELECT id, min(r) AS keeper_id FROM reach GROUP BY id),
sizes AS (SELECT keeper_id, count(*)::BIGINT AS n_members FROM lab GROUP BY 1 HAVING count(*) >= 2),
pstat AS (SELECT l.keeper_id, count(*)::BIGINT AS n_pairs, max(g.ham_a)::BIGINT AS max_ham
  FROM good g JOIN lab l ON g.id_a = l.id GROUP BY 1)
SELECT sizes.keeper_id AS cluster_id, sizes.n_members, pstat.n_pairs, pstat.max_ham
FROM sizes JOIN pstat ON sizes.keeper_id = pstat.keeper_id
ORDER BY cluster_id""",
    // q212: samples replayed from the md5 closed form (WAV PCM roundtrip
    // is verbatim), windowed integer features with BIGINT products
    "q212_audio_features" ->
      """WITH ii AS (SELECT unnest(range(0, 64)) AS i),
sm AS (SELECT d.doc_id, ii.i, ('0x' || substr(md5('au:' || d.doc_id::VARCHAR || ':' || ii.i::VARCHAR), 1, 4))::INT - 32768 AS s FROM documents d, ii)
SELECT doc_id, 8000::BIGINT AS sample_rate, 64::BIGINT AS n_samples, (i // 16)::BIGINT AS win,
  sum(s::BIGINT * s)::BIGINT AS energy,
  sum(CASE WHEN i % 16 > 0 AND prev::BIGINT * s < 0 THEN 1 ELSE 0 END)::BIGINT AS n_zc,
  max(abs(s))::BIGINT AS peak
FROM (SELECT doc_id, i, s, lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM sm)
GROUP BY doc_id, i // 16 ORDER BY doc_id, win""",
    // q211: q210's replay with the coarse/PQ codebooks derived from the
    // BASE slice only (vec_id % 4 <> 0 — the index that existed before
    // tonight's append) and codes over the full corpus
    "q211_ann_delta_append" ->
      """WITH b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 <> 0),
kk AS (SELECT greatest(8, (count(*) + 63) // 64) AS k FROM b),
cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS srn FROM b) s0, kk WHERE s0.srn <= kk.k),
cells AS MATERIALIZED (SELECT vec_id, centroid_id FROM (SELECT e.vec_id, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents c) WHERE rn = 1),
subs AS (SELECT unnest(range(0, 8)) AS s),
seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding FROM (SELECT vec_id, embedding FROM b ORDER BY vec_id LIMIT 16)),
cb AS MATERIALIZED (SELECT s, code, embedding[s*8+1 : s*8+8] AS cent FROM seeds, subs),
cbs AS (SELECT s, code, cent, list_inner_product(cent::DOUBLE[], cent::DOUBLE[]) / 2.0 AS half_norm2 FROM cb),
enc AS MATERIALIZED (SELECT vec_id, s, code FROM (
  SELECT e.vec_id, c.s, c.code,
    row_number() OVER (PARTITION BY e.vec_id, c.s ORDER BY (list_inner_product((e.embedding[c.s*8+1 : c.s*8+8])::DOUBLE[], c.cent::DOUBLE[]) - c.half_norm2) DESC, c.code) AS rn
  FROM embeddings e, cbs c) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 16),
qc AS MATERIALIZED (SELECT query_id, centroid_id FROM (SELECT q.query_id, c.centroid_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS cell_rank FROM q, cents c) WHERE cell_rank <= 4),
lut AS MATERIALIZED (SELECT query_id, s, code, floor(list_inner_product((qv[s*8+1 : s*8+8])::DOUBLE[], cent::DOUBLE[]) * 1000000.0)::BIGINT AS dot_u FROM q, cb),
cand AS (SELECT qc.query_id, e.vec_id, sum(l.dot_u)::BIGINT AS adc_u
  FROM enc e JOIN cells cl ON cl.vec_id = e.vec_id
  JOIN qc ON qc.centroid_id = cl.centroid_id
  JOIN lut l ON l.query_id = qc.query_id AND l.s = e.s AND l.code = e.code
  WHERE e.vec_id <> qc.query_id GROUP BY 1, 2)
SELECT query_id, rn::BIGINT AS rank, vec_id, adc_u
FROM (SELECT query_id, vec_id, adc_u, row_number() OVER (PARTITION BY query_id ORDER BY adc_u DESC, vec_id) AS rn FROM cand)
WHERE rn <= 10 ORDER BY query_id, rank""",
    // q207: the full LSH pipeline (no threshold) joined to the sampled
    // subset, scored against exact cross-multiplied gram Jaccard at the
    // same three cuts
    "q207_dedup_eval" ->
      s"""WITH $LshVerifiedCtes,
sub AS (SELECT doc_id, text FROM documents WHERE ('0x' || substr(md5('de:' || doc_id::VARCHAR), 1, 15))::BIGINT % 8 = 0),
grams_all AS (SELECT DISTINCT doc_id, gh FROM (SELECT doc_id, unnest(list_transform(CASE WHEN length(text) < 4 THEN [text] ELSE list_transform(range(1, length(text)-2), i -> substr(text, i, 4)) END, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647)) AS gh FROM sub)),
hot AS (SELECT gh FROM (SELECT gh, count(*)::BIGINT AS df FROM grams_all GROUP BY 1) WHERE df > 64),
ncap AS (SELECT count(*)::BIGINT AS n_grams_capped FROM hot),
grams AS (SELECT g.doc_id, g.gh FROM grams_all g ANTI JOIN hot ON g.gh = hot.gh),
sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM grams GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS ni FROM grams a JOIN grams b ON a.gh = b.gh AND a.doc_id < b.doc_id GROUP BY 1, 2),
th AS (SELECT unnest([2500, 5000, 7500])::BIGINT AS t4),
truth AS (SELECT t4, id_a, id_b FROM inter JOIN sz za ON inter.id_a = za.doc_id JOIN sz zb ON inter.id_b = zb.doc_id, th WHERE ni * 10000 >= t4 * (za.sz + zb.sz - ni)),
pred AS (SELECT t4, v.id_a, v.id_b FROM verified v JOIN sub a ON v.id_a = a.doc_id JOIN sub b ON v.id_b = b.doc_id, th WHERE v.est_jac * 10000.0 >= t4),
nt AS (SELECT t4, count(*)::BIGINT AS n_true FROM truth GROUP BY 1),
np AS (SELECT t4, count(*)::BIGINT AS n_pred FROM pred GROUP BY 1),
ntp AS (SELECT t4, count(*)::BIGINT AS n_tp FROM pred JOIN truth USING (t4, id_a, id_b) GROUP BY 1),
nd AS (SELECT count(*)::BIGINT AS n_docs FROM sub)
SELECT th.t4, nd.n_docs, ncap.n_grams_capped, coalesce(n_true, 0)::BIGINT AS n_true, coalesce(n_pred, 0)::BIGINT AS n_pred, coalesce(n_tp, 0)::BIGINT AS n_tp,
  CASE WHEN coalesce(n_pred, 0) > 0 THEN (coalesce(n_tp, 0) * 10000) // n_pred END::BIGINT AS precision4,
  CASE WHEN coalesce(n_true, 0) > 0 THEN (coalesce(n_tp, 0) * 10000) // n_true END::BIGINT AS recall4,
  CASE WHEN coalesce(n_pred, 0) + coalesce(n_true, 0) > 0 THEN (2 * coalesce(n_tp, 0) * 10000) // (n_pred + n_true) END::BIGINT AS f1_4
FROM th LEFT JOIN nt USING (t4) LEFT JOIN np USING (t4) LEFT JOIN ntp USING (t4), nd, ncap
ORDER BY th.t4""",
    // q205: q65's sessionization CTEs, then distinct (session, type)
    // self-joined for pair supports; lift as one integer division
    "q205_assoc_lift" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events),
l AS (SELECT user_id, tus, event_id, event_type,
  CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
        OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 21600000000 THEN 1 ELSE 0 END AS brk FROM ev),
st AS (SELECT DISTINCT user_id, sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS sid, event_type FROM l),
n AS (SELECT count(*)::BIGINT AS n_sess FROM (SELECT DISTINCT user_id, sid FROM st)),
singles AS (SELECT event_type, count(*)::BIGINT AS n_t FROM st GROUP BY 1),
pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b, count(*)::BIGINT AS n_ab
  FROM st a JOIN st b ON a.user_id = b.user_id AND a.sid = b.sid AND a.event_type < b.event_type GROUP BY 1, 2)
SELECT type_a, type_b, n_ab, sa.n_t AS n_a, sb.n_t AS n_b,
  ((n.n_sess::HUGEINT * n_ab * 1000000) // (sa.n_t::HUGEINT * sb.n_t))::BIGINT AS lift6
FROM pairs JOIN singles sa ON pairs.type_a = sa.event_type
JOIN singles sb ON pairs.type_b = sb.event_type, n
ORDER BY type_a, type_b""",
    // q206: exact integer recency hours vs the corpus max, fixed-threshold
    // bands, micro-unit monetary
    "q206_rfm" ->
      """WITH mx AS (SELECT epoch_us(max(ts)) AS mxus FROM events),
u AS (SELECT user_id, epoch_us(max(ts)) AS lastus, count(*)::BIGINT AS freq,
  sum(cast(floor(value * 1000000) AS BIGINT))::BIGINT AS mon_u FROM events GROUP BY 1),
b AS (SELECT CASE WHEN (mxus - lastus) // 3600000000 < 6 THEN 3 WHEN (mxus - lastus) // 3600000000 < 24 THEN 2 ELSE 1 END::BIGINT AS r,
  CASE WHEN freq >= 70 THEN 3 WHEN freq >= 55 THEN 2 ELSE 1 END::BIGINT AS f,
  CASE WHEN mon_u >= 4000000000 THEN 3 WHEN mon_u >= 2500000000 THEN 2 ELSE 1 END::BIGINT AS m,
  freq, mon_u FROM u, mx)
SELECT r, f, m, count(*)::BIGINT AS n_users, sum(freq)::BIGINT AS n_events, sum(mon_u)::BIGINT AS sum_mon_u
FROM b GROUP BY 1, 2, 3 ORDER BY r, f, m""",
    // q203: leading digit from exact cent-integers via decimal string
    // length; the nine Benford expectations are the same literal
    // micro-constants; per-digit χ² in one pinned double expression
    "q203_benford" ->
      """WITH vc AS (SELECT cast(floor(value * 100) AS BIGINT) AS vc FROM events WHERE floor(value * 100) > 0),
dg AS (SELECT vc // cast(pow(10, length(vc::VARCHAR) - 1) AS BIGINT) AS digit FROM vc),
cnt AS (SELECT digit, count(*)::BIGINT AS n_obs FROM dg GROUP BY 1),
tot AS (SELECT sum(n_obs)::BIGINT AS n FROM cnt),
p AS (SELECT * FROM (VALUES (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152), (9, 45757)) t(digit, p_u))
SELECT c.digit, c.n_obs, (tot.n * p.p_u)::BIGINT AS exp_u,
  floor(((c.n_obs::DOUBLE - tot.n::DOUBLE * (p.p_u::DOUBLE / 1000000.0)) * (c.n_obs::DOUBLE - tot.n::DOUBLE * (p.p_u::DOUBLE / 1000000.0))) / (tot.n::DOUBLE * (p.p_u::DOUBLE / 1000000.0)) * 1000000.0)::BIGINT AS chi2_u
FROM cnt c JOIN p ON c.digit = p.digit, tot ORDER BY c.digit""",
    // q204: HUGEINT moment sums (the decimal(38,0) twin), one pinned
    // double ratio per signal pair
    "q204_signal_corr" ->
      raw"""WITH s AS (SELECT len(tk)::BIGINT AS s1,
  (list_sum(list_transform(tk, x -> length(x))) * 1000000) // len(tk) AS s2,
  (len(list_distinct(tk)) * 1000000) // len(tk) AS s3
  FROM (SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x != '') AS tk FROM documents) WHERE len(tk) > 0),
m AS (SELECT count(*)::BIGINT AS n, sum(s1)::BIGINT AS m1, sum(s2)::BIGINT AS m2, sum(s3)::BIGINT AS m3,
  sum(s1::HUGEINT * s1::HUGEINT) AS m11, sum(s2::HUGEINT * s2::HUGEINT) AS m22, sum(s3::HUGEINT * s3::HUGEINT) AS m33,
  sum(s1::HUGEINT * s2::HUGEINT) AS m12, sum(s1::HUGEINT * s3::HUGEINT) AS m13, sum(s2::HUGEINT * s3::HUGEINT) AS m23 FROM s)
SELECT * FROM (
  SELECT 'n_tok' AS sig_a, 'mean_len' AS sig_b, floor((n::DOUBLE * m12::DOUBLE - m1::DOUBLE * m2::DOUBLE) / sqrt((n::DOUBLE * m11::DOUBLE - m1::DOUBLE * m1::DOUBLE) * (n::DOUBLE * m22::DOUBLE - m2::DOUBLE * m2::DOUBLE)) * 1000000.0)::BIGINT AS r6 FROM m
  UNION ALL SELECT 'n_tok', 'ttr', floor((n::DOUBLE * m13::DOUBLE - m1::DOUBLE * m3::DOUBLE) / sqrt((n::DOUBLE * m11::DOUBLE - m1::DOUBLE * m1::DOUBLE) * (n::DOUBLE * m33::DOUBLE - m3::DOUBLE * m3::DOUBLE)) * 1000000.0)::BIGINT FROM m
  UNION ALL SELECT 'mean_len', 'ttr', floor((n::DOUBLE * m23::DOUBLE - m2::DOUBLE * m3::DOUBLE) / sqrt((n::DOUBLE * m22::DOUBLE - m2::DOUBLE * m2::DOUBLE) * (n::DOUBLE * m33::DOUBLE - m3::DOUBLE * m3::DOUBLE)) * 1000000.0)::BIGINT FROM m)
ORDER BY sig_a, sig_b""",

    // q215: brute-force exact all-pairs — equality with the engine's
    // prefix-filtered plan IS the exactness proof for the filter
    "q215_setsim_exact" ->
      """WITH win AS (SELECT doc_id*3 + w AS win_id, substr(text, 1 + w*greatest(1, cast(floor(length(text)/8.0) AS BIGINT)), greatest(4, cast(floor(length(text)/2.0) AS BIGINT))) AS wtext FROM (SELECT doc_id, text FROM documents WHERE doc_id < 200), (SELECT unnest([0,1,2]) AS w)),
s AS (SELECT win_id, list_distinct(CASE WHEN length(wtext) < 5 THEN [wtext] ELSE list_transform(range(1, length(wtext)-3), i -> substr(wtext, i, 5)) END) AS sh FROM win),
p AS (SELECT a.win_id AS id_a, b.win_id AS id_b, len(list_intersect(a.sh, b.sh))::BIGINT AS inter, (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::BIGINT AS uni FROM s a JOIN s b ON a.win_id < b.win_id)
SELECT id_a, id_b, inter, uni, inter * 10000 // uni AS jac4 FROM p WHERE inter * 10000 >= 5000 * uni ORDER BY id_a, id_b""",

    // q216: full algorithm replay — deterministic mangle, distinct q-grams
    // with first positions, global df, rarest-2 nomination, candidate
    // join, levenshtein verify, (dist, lid) election with tie census
    "q216_record_linkage" ->
      """WITH clean AS (SELECT c_custkey AS rid, c_name AS name FROM customer),
dirty AS (SELECT c_custkey + 10000000 AS rid, substr(c_name, 1, (9 + (c_custkey % 8))::INTEGER) || substr(c_name, (11 + (c_custkey % 8))::INTEGER) AS name FROM customer),
au AS (SELECT rid, name FROM clean UNION ALL SELECT rid, name FROM dirty),
ag AS (SELECT rid, g, min(pos) AS pos FROM (SELECT rid, i AS pos, substr(name, i::INTEGER, 4) AS g FROM (SELECT rid, name, unnest(range(1, length(name) - 2)) AS i FROM au)) GROUP BY rid, g),
gdf AS (SELECT g, count(*) AS df FROM ag GROUP BY g),
rare AS (SELECT rid, g FROM (SELECT ag.rid, ag.g, row_number() OVER (PARTITION BY ag.rid ORDER BY gdf.df, ag.g, ag.pos) AS rn FROM ag JOIN gdf USING (g)) WHERE rn <= 2),
cand AS (SELECT DISTINCT a.rid AS lid, b.rid AS rid FROM rare a JOIN rare b ON a.g = b.g AND a.rid < 10000000 AND b.rid >= 10000000),
nc AS (SELECT rid, count(*) AS n_cands FROM cand GROUP BY rid),
ver AS (SELECT c.lid, c.rid, levenshtein(cl.name, dr.name)::BIGINT AS dist FROM cand c JOIN clean cl ON cl.rid = c.lid JOIN dirty dr ON dr.rid = c.rid WHERE levenshtein(cl.name, dr.name) <= 2),
mn AS (SELECT rid, min(dist) AS mind FROM ver GROUP BY rid),
ties AS (SELECT ver.rid, count(*) AS n_ties FROM ver JOIN mn USING (rid) WHERE ver.dist = mn.mind GROUP BY ver.rid),
best AS (SELECT rid, lid, dist, row_number() OVER (PARTITION BY rid ORDER BY dist, lid) AS rn FROM ver)
SELECT b.rid AS dirty_id, b.lid AS match_key, b.dist, nc.n_cands, ties.n_ties FROM best b JOIN nc USING (rid) JOIN ties USING (rid) WHERE b.rn = 1 ORDER BY dirty_id""",

    // q217: full LM replay — 80/20 md5 split, train counts, eval pair
    // stream, stupid-backoff CASE in pure integral division
    "q217_bigram_lm_score" ->
      raw"""WITH d AS (SELECT doc_id, lower(text) AS t, ('0x' || substr(md5('lm:' || doc_id::VARCHAR), 1, 15))::BIGINT % 5 AS b FROM documents),
tt AS (SELECT doc_id, b, regexp_extract_all(t, '\w+') AS tk FROM d),
toks AS (SELECT doc_id, b, wi AS pos, tk[wi::INTEGER] AS w FROM (SELECT doc_id, b, tk, unnest(range(1, len(tk)+1)) AS wi FROM tt)),
tp AS (SELECT doc_id, b, pos, w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM toks),
c1 AS (SELECT w, count(*)::BIGINT AS c1 FROM toks WHERE b <> 0 GROUP BY w),
ntot AS (SELECT count(*)::BIGINT AS n_tot FROM toks WHERE b <> 0),
c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM tp WHERE b <> 0 AND w2 IS NOT NULL GROUP BY w1, w2),
ep AS (SELECT doc_id, w1, w2 FROM tp WHERE b = 0 AND w2 IS NOT NULL),
sc AS (SELECT ep.doc_id,
  CASE WHEN c2.c2 IS NOT NULL THEN 1 ELSE 0 END AS hit,
  CASE WHEN c2.c2 IS NULL AND u2.c1 IS NOT NULL THEN 1 ELSE 0 END AS backoff,
  CASE WHEN c2.c2 IS NULL AND u2.c1 IS NULL THEN 1 ELSE 0 END AS oov,
  CASE WHEN c2.c2 IS NOT NULL THEN (c2.c2 * 10000) // u1.c1
       WHEN u2.c1 IS NOT NULL THEN (u2.c1 * 4000) // (SELECT n_tot FROM ntot)
       ELSE 0 END AS bps
  FROM ep LEFT JOIN c2 ON ep.w1 = c2.w1 AND ep.w2 = c2.w2
  LEFT JOIN c1 u1 ON ep.w1 = u1.w LEFT JOIN c1 u2 ON ep.w2 = u2.w)
SELECT doc_id, count(*)::BIGINT AS n_pairs, sum(hit)::BIGINT AS n_hit, sum(backoff)::BIGINT AS n_backoff, sum(oov)::BIGINT AS n_oov, sum(bps)::BIGINT AS sum_bps, (sum(bps)::BIGINT * 1) // count(*) AS mean_bps FROM sc GROUP BY doc_id ORDER BY doc_id""",

    // q218: latest-wins via row_number under (µs seq, event_id) DESC on
    // both sides of the cutoff, then the classified full-outer merge
    "q218_cdc_merge" ->
      """WITH log AS (SELECT user_id AS key, epoch_us(ts) AS seq, event_id AS tb, CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op, cast(floor(value * 1000000) AS BIGINT) AS val FROM events),
bs AS (SELECT key, val AS base_val, n_ops AS n_base_ops FROM (SELECT key, op, val, row_number() OVER (PARTITION BY key ORDER BY seq DESC, tb DESC) AS rn, count(*) OVER (PARTITION BY key) AS n_ops FROM log WHERE seq < 1706140800000000) WHERE rn = 1 AND op = 'U'),
ds AS (SELECT key, op AS d_op, val AS d_val, n_ops AS n_delta_ops FROM (SELECT key, op, val, row_number() OVER (PARTITION BY key ORDER BY seq DESC, tb DESC) AS rn, count(*) OVER (PARTITION BY key) AS n_ops FROM log WHERE seq >= 1706140800000000) WHERE rn = 1)
SELECT coalesce(bs.key, ds.key) AS user_id,
  CASE WHEN d_op IS NULL THEN 'carry' WHEN d_op = 'U' AND n_base_ops IS NULL THEN 'insert' WHEN d_op = 'U' THEN 'update' WHEN n_base_ops IS NOT NULL THEN 'delete' ELSE 'noop_delete' END AS action,
  CASE WHEN d_op = 'U' THEN d_val WHEN d_op IS NULL THEN base_val ELSE NULL END AS live_val_u,
  coalesce(n_base_ops, 0)::BIGINT AS n_base_ops, coalesce(n_delta_ops, 0)::BIGINT AS n_delta_ops
FROM bs FULL JOIN ds ON bs.key = ds.key ORDER BY user_id""",

    // q219: same u48 mod-2⁴⁸ hash, same single double division, same
    // (priority, id) election — sample membership replays exactly
    "q219_weighted_sample" ->
      """WITH d AS (SELECT source, doc_id, n_chars, (('0x' || substr(md5('wps:' || doc_id::VARCHAR), 1, 15))::BIGINT % 281474976710656) AS u48 FROM documents),
r AS (SELECT source, doc_id, n_chars, u48::DOUBLE / n_chars AS pri, row_number() OVER (PARTITION BY source ORDER BY u48::DOUBLE / n_chars, doc_id) AS rank FROM d)
SELECT source, rank::BIGINT AS rank, doc_id, n_chars, floor(pri * 10000)::BIGINT AS pri4 FROM r WHERE rank <= 10 ORDER BY source, rank""",

    // q220: same degree tables, same md5 1-in-4 key draw, exact integer
    // scale-up and error
    "q220_join_size_probe" ->
      """WITH deg AS (SELECT user_id, event_type, count(*)::BIGINT AS d FROM events GROUP BY 1, 2),
pr AS (SELECT 'click' AS side_a, 'view' AS side_b UNION ALL SELECT 'error', 'signup' UNION ALL SELECT 'purchase', 'view'),
j AS (SELECT pr.side_a, pr.side_b, a.user_id, a.d * b.d AS dd, CASE WHEN ('0x' || substr(md5('jse:' || a.user_id::VARCHAR), 1, 15))::BIGINT % 4 = 0 THEN 1 ELSE 0 END AS insample
  FROM pr JOIN deg a ON a.event_type = pr.side_a JOIN deg b ON b.event_type = pr.side_b AND b.user_id = a.user_id)
SELECT side_a, side_b, sum(insample)::BIGINT AS n_keys_sampled, (sum(CASE WHEN insample = 1 THEN dd ELSE 0 END) * 4)::BIGINT AS est_rows, sum(dd)::BIGINT AS actual_rows, (abs(sum(CASE WHEN insample = 1 THEN dd ELSE 0 END) * 4 - sum(dd)) * 10000 // sum(dd))::BIGINT AS err4 FROM j GROUP BY side_a, side_b ORDER BY side_a, side_b""",

    // q221: the q165 component/share CTEs gate which edges the recursive
    // bounded BFS may traverse; flagged members surface with NULL
    // centrality, everything else replays the UNION-dedup BFS + min
    // distance + micro-unit reciprocal sum
    "q221_harmonic_centrality" ->
      s"""WITH RECURSIVE $LshVerifiedCtes,
prs AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 0.75),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs UNION ALL SELECT id_b, id_a FROM prs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
creach AS (SELECT id, id AS r FROM nodes UNION SELECT e.dst AS id, creach.r AS r FROM creach JOIN edges e ON e.src = creach.id),
lab AS (SELECT id, min(r) AS cid FROM creach GROUP BY id),
sizes AS (SELECT cid, count(*)::BIGINT AS sz FROM lab GROUP BY cid),
tot AS (SELECT count(*)::BIGINT AS n FROM documents),
flg AS (SELECT lab.id, (CASE WHEN sz * 10000 > 1000 * n THEN 1 ELSE 0 END)::INT AS flagged FROM lab JOIN sizes ON sizes.cid = lab.cid, tot),
okedges AS (SELECT e.src, e.dst FROM edges e JOIN flg ON flg.id = e.src AND flg.flagged = 0),
reach AS (SELECT src AS u, dst AS v, 1 AS d FROM okedges
  UNION
  SELECT r.u, e.dst AS v, r.d + 1 FROM reach r JOIN okedges e ON e.src = r.v WHERE r.d < 3 AND e.dst <> r.u),
md AS (SELECT u, v, min(d)::BIGINT AS d FROM reach GROUP BY u, v),
hc AS (SELECT u AS id, (count(*) FILTER (d = 1))::BIGINT AS n_1hop, (count(*) FILTER (d > 1))::BIGINT AS n_far, sum(1000000 // d)::BIGINT AS h_micro FROM md GROUP BY u)
SELECT flg.id, hc.n_1hop, hc.n_far, hc.h_micro, flg.flagged FROM flg LEFT JOIN hc ON hc.id = flg.id ORDER BY flg.id""",

    // q222: same window hashing (md5 of the space-joined token slice),
    // same ladder, zero-filled lengths with no repeats
    "q222_repeated_spans" ->
      raw"""WITH tt AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS tk FROM documents),
ls AS (SELECT unnest([4, 8, 16, 32]) AS span_len),
pos AS (SELECT ls.span_len, tt.tk, unnest(range(1, len(tt.tk) - ls.span_len + 2)) AS p FROM tt, ls WHERE len(tt.tk) >= ls.span_len),
g AS (SELECT span_len, ('0x' || substr(md5(array_to_string(tk[p::INTEGER:(p + span_len - 1)::INTEGER], ' ')), 1, 15))::BIGINT AS h FROM pos),
rep AS (SELECT span_len, h, count(*)::BIGINT AS n_occ FROM g GROUP BY span_len, h HAVING count(*) >= 2),
perl AS (SELECT span_len, count(*)::BIGINT AS n_repeat_spans, sum(n_occ)::BIGINT AS n_repeat_positions, max(n_occ)::BIGINT AS max_occ FROM rep GROUP BY span_len),
tops AS (SELECT rep.span_len, min(rep.h) AS top_h FROM rep JOIN perl ON rep.span_len = perl.span_len AND rep.n_occ = perl.max_occ GROUP BY rep.span_len)
SELECT ls.span_len::BIGINT AS span_len, coalesce(n_repeat_spans, 0)::BIGINT AS n_repeat_spans, coalesce(n_repeat_positions, 0)::BIGINT AS n_repeat_positions, coalesce(max_occ, 0)::BIGINT AS max_occ, tops.top_h FROM ls LEFT JOIN perl USING (span_len) LEFT JOIN tops ON ls.span_len = tops.span_len ORDER BY span_len""",

    // q223: q52's multiprobe SQL at k=10 scored against brute truth with
    // the same literal discounts and constant ideal DCG
    "q223_ndcg_eval" ->
      s"""WITH bkt AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
qp AS (SELECT query_id, qv, xor(bucket, flip) AS bucket FROM (SELECT vec_id AS query_id, embedding AS qv, bucket FROM bkt WHERE vec_id < 8), (SELECT unnest([0,1,2,4,8]) AS flip)),
got AS (SELECT query_id, neighbor_id, rank FROM (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC, c.vec_id) AS rank
  FROM bkt c JOIN qp q ON c.bucket = q.bucket WHERE c.vec_id <> q.query_id) WHERE rank <= 10),
tq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
truth AS (SELECT query_id, neighbor_id, CASE WHEN rank = 1 THEN 3 WHEN rank <= 3 THEN 2 ELSE 1 END AS grade FROM (
  SELECT t.query_id, e.vec_id AS neighbor_id, row_number() OVER (PARTITION BY t.query_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], t.qv::DOUBLE[]) DESC, e.vec_id) AS rank
  FROM embeddings e, tq t WHERE e.vec_id <> t.query_id) WHERE rank <= 10),
sc AS (SELECT g.query_id, coalesce(t.grade, 0) AS grade, ([1000000, 630929, 500000, 430676, 386852, 356207, 333333, 315464, 301029, 289064])[g.rank::INTEGER] AS wt FROM got g LEFT JOIN truth t ON g.query_id = t.query_id AND g.neighbor_id = t.neighbor_id)
SELECT query_id, sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END)::BIGINT AS n_hit, sum((CASE grade WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END) * wt)::BIGINT AS dcg_u, (sum((CASE grade WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END) * wt) * 1000000 // 12805412)::BIGINT AS ndcg_micro FROM sc GROUP BY query_id ORDER BY query_id""",

    // q224: same md5 treatment draw, same µs cuts, same integral-division
    // cell means — placebo runs the estimator inside the pre-period
    "q224_diff_in_diff" ->
      """WITH ev AS (SELECT epoch_us(ts) AS tsu, cast(floor(value * 1000000) AS BIGINT) AS vu,
  CASE WHEN ('0x' || substr(md5('did:' || user_id::VARCHAR), 1, 15))::BIGINT % 2 = 0 THEN 1 ELSE 0 END AS tr,
  CASE WHEN epoch_us(ts) >= 1706140800000000 THEN 'post' WHEN epoch_us(ts) >= 1705017600000000 THEN 'mid' ELSE 'early' END AS per
  FROM events WHERE event_type = 'purchase'),
c AS (SELECT
  sum(CASE WHEN tr = 1 AND per = 'early' THEN 1 ELSE 0 END)::BIGINT AS n_t_early,
  sum(CASE WHEN tr = 1 AND per = 'mid' THEN 1 ELSE 0 END)::BIGINT AS n_t_mid,
  sum(CASE WHEN tr = 1 AND per = 'post' THEN 1 ELSE 0 END)::BIGINT AS n_t_post,
  sum(CASE WHEN tr = 0 AND per = 'early' THEN 1 ELSE 0 END)::BIGINT AS n_c_early,
  sum(CASE WHEN tr = 0 AND per = 'mid' THEN 1 ELSE 0 END)::BIGINT AS n_c_mid,
  sum(CASE WHEN tr = 0 AND per = 'post' THEN 1 ELSE 0 END)::BIGINT AS n_c_post,
  sum(CASE WHEN tr = 1 AND per = 'early' THEN vu ELSE 0 END)::BIGINT AS s_t_early,
  sum(CASE WHEN tr = 1 AND per = 'mid' THEN vu ELSE 0 END)::BIGINT AS s_t_mid,
  sum(CASE WHEN tr = 1 AND per = 'post' THEN vu ELSE 0 END)::BIGINT AS s_t_post,
  sum(CASE WHEN tr = 0 AND per = 'early' THEN vu ELSE 0 END)::BIGINT AS s_c_early,
  sum(CASE WHEN tr = 0 AND per = 'mid' THEN vu ELSE 0 END)::BIGINT AS s_c_mid,
  sum(CASE WHEN tr = 0 AND per = 'post' THEN vu ELSE 0 END)::BIGINT AS s_c_post
  FROM ev)
SELECT (n_t_early + n_t_mid)::BIGINT AS n_t_pre, n_t_post, (n_c_early + n_c_mid)::BIGINT AS n_c_pre, n_c_post,
  ((s_t_early + s_t_mid) // (n_t_early + n_t_mid))::BIGINT AS m_t_pre,
  (s_t_post // n_t_post)::BIGINT AS m_t_post,
  ((s_c_early + s_c_mid) // (n_c_early + n_c_mid))::BIGINT AS m_c_pre,
  (s_c_post // n_c_post)::BIGINT AS m_c_post,
  ((s_t_post // n_t_post - (s_t_early + s_t_mid) // (n_t_early + n_t_mid)) - (s_c_post // n_c_post - (s_c_early + s_c_mid) // (n_c_early + n_c_mid)))::BIGINT AS did_u,
  ((s_t_mid // n_t_mid - s_t_early // n_t_early) - (s_c_mid // n_c_mid - s_c_early // n_c_early))::BIGINT AS placebo_did_u
FROM c""",

    // q225: md5 pixel closed form → full-res dHash pack and pooled 12-bit
    // hash, both replayed arithmetically (PNG grayscale is lossless)
    "q225_phash_pooling" ->
      """WITH ii AS (SELECT unnest(range(0, 64)) AS i),
px AS (SELECT d.doc_id, ii.i,
  CASE WHEN ('0x' || substr(md5('pert:' || d.doc_id::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT % 29 = 0
    THEN 255 - ('0x' || substr(md5((d.doc_id // 4)::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT
    ELSE ('0x' || substr(md5((d.doc_id // 4)::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT END AS px
  FROM documents d, ii),
db AS (SELECT a.doc_id, (a.i // 8) // 2 AS b,
  sum(CASE WHEN a.px > b2.px THEN 1::BIGINT << (((a.i // 8) % 2) * 7 + (a.i % 8)) ELSE 0 END)::BIGINT AS v
  FROM px a JOIN px b2 ON a.doc_id = b2.doc_id AND b2.i = a.i + 1 AND a.i % 8 < 7 GROUP BY 1, 2),
fh AS (SELECT doc_id, sum(v << (b * 14))::BIGINT AS full_hash FROM db GROUP BY 1),
pool AS (SELECT doc_id, ((i // 8) // 2) * 4 + (i % 8) // 2 AS p, (sum(px) // 4)::BIGINT AS v FROM px GROUP BY 1, 2),
ph AS (SELECT a.doc_id, coalesce(sum(CASE WHEN a.v > b.v THEN 1::BIGINT << ((a.p // 4) * 3 + a.p % 4) ELSE 0 END), 0)::BIGINT AS pool_hash
  FROM pool a JOIN pool b ON a.doc_id = b.doc_id AND b.p = a.p + 1 AND a.p % 4 < 3 GROUP BY 1)
SELECT d.doc_id // 4 AS group_id, count(*)::BIGINT AS n_members, count(distinct fh.full_hash)::BIGINT AS n_distinct_full, count(distinct ph.pool_hash)::BIGINT AS n_distinct_pooled
FROM documents d JOIN fh ON fh.doc_id = d.doc_id JOIN ph ON ph.doc_id = d.doc_id GROUP BY 1 ORDER BY group_id""",

    // q226: brute force over pairs touching a delta window — the same
    // exactness proof as q215, for the incremental form
    "q226_setsim_incremental" ->
      """WITH win AS (SELECT doc_id*3 + w AS win_id, substr(text, 1 + w*greatest(1, cast(floor(length(text)/8.0) AS BIGINT)), greatest(4, cast(floor(length(text)/2.0) AS BIGINT))) AS wtext FROM (SELECT doc_id, text FROM documents WHERE doc_id < 200), (SELECT unnest([0,1,2]) AS w)),
s AS (SELECT win_id, list_distinct(CASE WHEN length(wtext) < 5 THEN [wtext] ELSE list_transform(range(1, length(wtext)-3), i -> substr(wtext, i, 5)) END) AS sh FROM win),
p AS (SELECT a.win_id AS id_a, b.win_id AS id_b, len(list_intersect(a.sh, b.sh))::BIGINT AS inter, (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::BIGINT AS uni FROM s a JOIN s b ON a.win_id < b.win_id WHERE a.win_id % 4 = 0 OR b.win_id % 4 = 0)
SELECT id_a, id_b, inter, uni, inter * 10000 // uni AS jac4 FROM p WHERE inter * 10000 >= 5000 * uni ORDER BY id_a, id_b""",

    // q227: same planted variants via chr(), DuckDB's standard
    // nfc_normalize as the cross-engine bridge
    "q227_unicode_dedup" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
c2 AS (
  SELECT doc_id*2 AS id, CASE WHEN doc_id % 2 = 0 THEN text || ' caf' || chr(233) || ' jalape' || chr(241) || 'o' ELSE text || ' alpha' END AS txt FROM d
  UNION ALL
  SELECT doc_id*2+1, CASE WHEN doc_id % 2 = 0 THEN text || ' cafe' || chr(769) || ' jalapen' || chr(771) || 'o' ELSE text || ' beta' END FROM d),
raw AS (SELECT count(*)::BIGINT AS raw_groups, coalesce(sum(n), 0)::BIGINT AS raw_members FROM (SELECT md5(txt) AS h, count(*) AS n FROM c2 GROUP BY 1 HAVING count(*) >= 2)),
nrm AS (SELECT count(*)::BIGINT AS norm_groups, coalesce(sum(n), 0)::BIGINT AS norm_members FROM (SELECT md5(nfc_normalize(txt)) AS h, count(*) AS n FROM c2 GROUP BY 1 HAVING count(*) >= 2)),
ch AS (SELECT count(*)::BIGINT AS n_rows, sum(CASE WHEN nfc_normalize(txt) <> txt THEN 1 ELSE 0 END)::BIGINT AS n_changed FROM c2)
SELECT ch.n_rows, ch.n_changed, raw.raw_groups, raw.raw_members, nrm.norm_groups, nrm.norm_members FROM ch, raw, nrm""",

    // q228: same md5 micro-uniform, same literal Poisson-CDF thresholds,
    // same rank-2/rank-31 CI election
    "q228_bootstrap_ci" ->
      """WITH ev AS (SELECT event_type, event_id, cast(floor(value * 1000000) AS BIGINT) AS vu FROM events),
draws AS (SELECT event_type, event_id, vu, b,
  ('0x' || substr(md5('boot:' || b::VARCHAR || ':' || event_id::VARCHAR), 1, 15))::BIGINT % 1000000 AS u
  FROM ev, (SELECT unnest(range(0, 32)) AS b)),
wts AS (SELECT event_type, b, vu, CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1 WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3 ELSE 4 END AS w FROM draws),
means AS (SELECT event_type, b, (sum(w * vu) // sum(w))::BIGINT AS m FROM wts GROUP BY event_type, b),
rk AS (SELECT event_type, m, row_number() OVER (PARTITION BY event_type ORDER BY m, b) AS rk FROM means),
pt AS (SELECT event_type, count(*)::BIGINT AS n, (sum(vu) // count(*))::BIGINT AS mean_u FROM ev GROUP BY event_type)
SELECT pt.event_type, pt.n, pt.mean_u, lo.m AS ci_lo_u, hi.m AS ci_hi_u
FROM pt JOIN (SELECT event_type, m FROM rk WHERE rk = 2) lo USING (event_type)
JOIN (SELECT event_type, m FROM rk WHERE rk = 31) hi USING (event_type) ORDER BY event_type""",

    // q229: same pinned slope expression (divide then scale), same median
    // election, HUGEINT OLS moments
    "q229_theil_sen" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS y FROM events GROUP BY 1, 2),
pairs AS (SELECT a.event_type, a.day AS d1, b.day AS d2, floor((b.y - a.y)::DOUBLE / (b.day - a.day) * 1000000.0)::BIGINT AS slope6 FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.day < b.day),
med AS (SELECT event_type, np::BIGINT AS n_pairs, slope6 AS ts_slope6 FROM (SELECT event_type, slope6, d1, d2, row_number() OVER (PARTITION BY event_type ORDER BY slope6, d1, d2) AS rk, count(*) OVER (PARTITION BY event_type) AS np FROM pairs) WHERE rk = (np + 1) // 2),
ols AS (SELECT event_type, count(*)::BIGINT AS n_days, floor((count(*)::DOUBLE * sum(day::HUGEINT * y::HUGEINT)::DOUBLE - sum(day)::DOUBLE * sum(y)::DOUBLE) / (count(*)::DOUBLE * sum(day::HUGEINT * day::HUGEINT)::DOUBLE - sum(day)::DOUBLE * sum(day)::DOUBLE) * 1000000.0)::BIGINT AS ols_slope6 FROM daily GROUP BY event_type)
SELECT ols.event_type, ols.n_days, med.n_pairs, med.ts_slope6, ols.ols_slope6 FROM ols JOIN med USING (event_type) ORDER BY event_type""",

    // q230: same histogram cumsum ranks, same exact ceil target rank,
    // same covering-row band join on the pooled histogram
    "q230_quantile_normalize" ->
      """WITH sc AS (SELECT source, n_chars AS v FROM documents),
hist AS (SELECT source, v, count(*)::BIGINT AS cnt FROM sc GROUP BY 1, 2),
sizes AS (SELECT source, sum(cnt)::BIGINT AS ns FROM hist GROUP BY 1),
srccum AS (SELECT hist.source, hist.v, hist.cnt, sum(hist.cnt) OVER (PARTITION BY hist.source ORDER BY hist.v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS r, sizes.ns FROM hist JOIN sizes USING (source)),
poolcum AS (SELECT v AS pv, pcnt, sum(pcnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS pcum FROM (SELECT v, count(*)::BIGINT AS pcnt FROM sc GROUP BY 1)),
np AS (SELECT count(*)::BIGINT AS np FROM sc)
SELECT s.source, s.v, s.cnt, s.r AS src_rank, p.pv AS norm_v
FROM srccum s, np, poolcum p
WHERE p.pcum >= (s.r * np.np + s.ns - 1) // s.ns AND p.pcum - p.pcnt < (s.r * np.np + s.ns - 1) // s.ns
ORDER BY s.source, s.v""",

    // q231: md5 sample closed form → sign bands → bucket join → exact
    // differing-sample count, all replayed arithmetically
    "q231_audio_neardup" ->
      """WITH ii AS (SELECT unnest(range(0, 64)) AS i),
smp AS (SELECT d.doc_id, ii.i,
  CASE WHEN ('0x' || substr(md5('aupert:' || d.doc_id::VARCHAR || ':' || ii.i::VARCHAR), 1, 2))::INT % 29 = 0
    THEN -(('0x' || substr(md5('aug:' || (d.doc_id // 4)::VARCHAR || ':' || ii.i::VARCHAR), 1, 4))::INT - 32768) - 1
    ELSE ('0x' || substr(md5('aug:' || (d.doc_id // 4)::VARCHAR || ':' || ii.i::VARCHAR), 1, 4))::INT - 32768 END AS s
  FROM documents d, ii),
bands AS (SELECT doc_id, i // 16 AS band, sum(CASE WHEN s >= 0 THEN 1::BIGINT << (i % 16) ELSE 0 END)::BIGINT AS bh FROM smp GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
nd AS (SELECT c.id_a, c.id_b, (count(*) FILTER (sa.s <> sb.s))::BIGINT AS n_diff FROM cand c JOIN smp sa ON sa.doc_id = c.id_a JOIN smp sb ON sb.doc_id = c.id_b AND sb.i = sa.i GROUP BY 1, 2)
SELECT id_a, id_b, n_diff FROM nd WHERE n_diff <= 6 ORDER BY id_a, id_b""",

    // q232: same manifest grain, same 7-day horizon arithmetic
    "q232_retention_plan" ->
      """WITH files AS (SELECT epoch_us(ts) // 86400000000 AS day, (epoch_us(ts) // 3600000000) % 6 AS slot, count(*)::BIGINT AS n_rows, sum(cast(floor(value * 1000000) AS BIGINT))::BIGINT AS bytes_u FROM events GROUP BY 1, 2),
h AS (SELECT max(day) AS mx FROM files)
SELECT day, CASE WHEN day <= h.mx - 7 THEN 'expire' ELSE 'keep' END AS status, count(*)::BIGINT AS n_files, sum(n_rows)::BIGINT AS n_rows, sum(CASE WHEN day <= h.mx - 7 THEN bytes_u ELSE 0 END)::BIGINT AS reclaim_u
FROM files, h GROUP BY day, status ORDER BY day""",

    // q233: same byte arithmetic, same width ladder
    "q233_dict_advisor" ->
      """WITH a AS (SELECT 'documents' AS tbl, 'lang' AS col_name, lang::VARCHAR AS v, count(*)::BIGINT AS n FROM documents GROUP BY 1, 2, 3
 UNION ALL SELECT 'documents', 'source', source::VARCHAR, count(*) FROM documents GROUP BY 1, 2, 3
 UNION ALL SELECT 'events', 'event_type', event_type::VARCHAR, count(*) FROM events GROUP BY 1, 2, 3
 UNION ALL SELECT 'customer', 'c_mktsegment', c_mktsegment::VARCHAR, count(*) FROM customer GROUP BY 1, 2, 3),
agg AS (SELECT tbl, col_name, sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_distinct, sum(length(v) * n)::BIGINT AS raw_bytes, sum(length(v))::BIGINT AS dict_store FROM a GROUP BY 1, 2)
SELECT tbl, col_name, n_rows, n_distinct, raw_bytes,
 (dict_store + n_rows * CASE WHEN n_distinct <= 256 THEN 1 WHEN n_distinct <= 65536 THEN 2 ELSE 4 END)::BIGINT AS dict_bytes,
 ((raw_bytes - (dict_store + n_rows * CASE WHEN n_distinct <= 256 THEN 1 WHEN n_distinct <= 65536 THEN 2 ELSE 4 END)) * 10000 // raw_bytes)::BIGINT AS save4
FROM agg ORDER BY tbl, col_name""",

    // q235: same histogram grid, same midrank identity, HUGEINT numerator
    "q235_auc_rank" ->
      """WITH h AS (SELECT lang, n_chars AS v, count(*)::BIGINT AS cnt FROM documents GROUP BY 1, 2),
tv AS (SELECT v, sum(cnt)::BIGINT AS tot FROM h GROUP BY 1),
tg AS (SELECT DISTINCT lang AS tgt FROM h),
grid AS (SELECT tg.tgt, tv.v, coalesce(p.cnt, 0)::BIGINT AS pos, (tv.tot - coalesce(p.cnt, 0))::BIGINT AS neg
  FROM tv CROSS JOIN tg LEFT JOIN h p ON p.lang = tg.tgt AND p.v = tv.v),
cum AS (SELECT tgt, v, pos, neg, coalesce(sum(neg) OVER (PARTITION BY tgt ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cb FROM grid),
ag AS (SELECT tgt AS lang, sum(pos)::BIGINT AS n_pos, sum(neg)::BIGINT AS n_neg, sum(pos::HUGEINT * (2 * cb + neg)) AS num2 FROM cum GROUP BY 1)
SELECT lang, n_pos, n_neg, (num2 * 10000 // (2 * n_pos * n_neg))::BIGINT AS auc4 FROM ag ORDER BY lang""",

    // q236: same HUGEINT moments, same pinned-order Cramer doubles, same
    // det-computed-once CASE guard (det = 0 → NULL coefficients)
    "q236_ols2_cramer" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS y FROM events GROUP BY 1, 2),
d0 AS (SELECT min(day) AS d0 FROM daily),
feat AS (SELECT event_type, day - d0.d0 AS x1, day % 7 AS x2, y FROM daily, d0),
m AS (SELECT event_type, count(*)::BIGINT AS n, sum(x1::HUGEINT) AS s1, sum(x2::HUGEINT) AS s2, sum(y::HUGEINT) AS sy, sum((x1 * x1)::HUGEINT) AS s11, sum((x1 * x2)::HUGEINT) AS s12, sum((x2 * x2)::HUGEINT) AS s22, sum((x1 * y)::HUGEINT) AS s1y, sum((x2 * y)::HUGEINT) AS s2y FROM feat GROUP BY 1),
dn AS (SELECT event_type, n,
(n::DOUBLE * (s11::DOUBLE * s22::DOUBLE - s12::DOUBLE * s12::DOUBLE) - s1::DOUBLE * (s1::DOUBLE * s22::DOUBLE - s12::DOUBLE * s2::DOUBLE) + s2::DOUBLE * (s1::DOUBLE * s12::DOUBLE - s11::DOUBLE * s2::DOUBLE)) AS det,
(sy::DOUBLE * (s11::DOUBLE * s22::DOUBLE - s12::DOUBLE * s12::DOUBLE) - s1::DOUBLE * (s1y::DOUBLE * s22::DOUBLE - s12::DOUBLE * s2y::DOUBLE) + s2::DOUBLE * (s1y::DOUBLE * s12::DOUBLE - s11::DOUBLE * s2y::DOUBLE)) AS num0,
(n::DOUBLE * (s1y::DOUBLE * s22::DOUBLE - s12::DOUBLE * s2y::DOUBLE) - sy::DOUBLE * (s1::DOUBLE * s22::DOUBLE - s12::DOUBLE * s2::DOUBLE) + s2::DOUBLE * (s1::DOUBLE * s2y::DOUBLE - s1y::DOUBLE * s2::DOUBLE)) AS num1,
(n::DOUBLE * (s11::DOUBLE * s2y::DOUBLE - s1y::DOUBLE * s12::DOUBLE) - s1::DOUBLE * (s1::DOUBLE * s2y::DOUBLE - s1y::DOUBLE * s2::DOUBLE) + sy::DOUBLE * (s1::DOUBLE * s12::DOUBLE - s11::DOUBLE * s2::DOUBLE)) AS num2
FROM m)
SELECT event_type, n AS n_days,
CASE WHEN det = 0.0 THEN NULL ELSE floor(num0 / det * 1000000.0)::BIGINT END AS b0_6,
CASE WHEN det = 0.0 THEN NULL ELSE floor(num1 / det * 1000000.0)::BIGINT END AS b1_6,
CASE WHEN det = 0.0 THEN NULL ELSE floor(num2 / det * 1000000.0)::BIGINT END AS b2_6
FROM dn ORDER BY event_type""",

    // q237: same md5 micro-uniform, same shifted score, same bin grid and
    // mass-weighted ECE
    "q237_calibration" ->
      """WITH sc AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
  ('0x' || substr(md5('cal:' || event_id::VARCHAR), 1, 15))::BIGINT % 10000 AS u FROM events),
s2 AS (SELECT y, u * 6 // 10 + y * 3000 + (1 - y) * 500 AS score4 FROM sc),
bins AS (SELECT score4 // 1000 AS bin, count(*)::BIGINT AS n, (sum(score4) // count(*))::BIGINT AS mean_score4, (sum(y) * 10000 // count(*))::BIGINT AS pos4 FROM s2 GROUP BY 1),
ece AS (SELECT (sum(n * abs(mean_score4 - pos4)) // sum(n))::BIGINT AS ece4 FROM bins)
SELECT bin, n, mean_score4, pos4, ece.ece4 FROM bins, ece ORDER BY bin""",

    // q238: same class/bucket grid, same exact integer EMD
    "q238_t_closeness" ->
      """WITH rws AS (SELECT lang, source, n_chars // 200 AS b FROM documents),
cls AS (SELECT lang, source, b, count(*)::BIGINT AS cnt FROM rws GROUP BY 1, 2, 3),
gl AS (SELECT b, gcnt, sum(gcnt) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS gcum FROM (SELECT b, sum(cnt)::BIGINT AS gcnt FROM cls GROUP BY 1)),
mm AS (SELECT count(*)::BIGINT AS m, sum(gcnt)::BIGINT AS big_n FROM gl),
grp AS (SELECT lang, source, sum(cnt)::BIGINT AS ng FROM cls GROUP BY 1, 2),
grid AS (SELECT grp.lang, grp.source, grp.ng, gl.b, gl.gcum, coalesce(cls.cnt, 0)::BIGINT AS cnt
  FROM gl CROSS JOIN grp LEFT JOIN cls ON cls.lang = grp.lang AND cls.source = grp.source AND cls.b = gl.b),
pc AS (SELECT lang, source, ng, b, gcum, sum(cnt) OVER (PARTITION BY lang, source ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS pcum FROM grid),
emd AS (SELECT lang, source, ng, sum(abs(pcum::HUGEINT * mm.big_n - gcum::HUGEINT * ng)) AS emd_i, mm.m AS m, mm.big_n AS big_n FROM pc, mm GROUP BY lang, source, ng, mm.m, mm.big_n)
SELECT lang, source, ng AS n_g, (emd_i * 10000 // (ng::HUGEINT * big_n * (m - 1)))::BIGINT AS t4,
CASE WHEN emd_i * 10000 // (ng::HUGEINT * big_n * (m - 1)) > 2000 THEN 'exposed' ELSE 'ok' END AS closeness
FROM emd ORDER BY lang, source""",

    // q239: same verified-pair graph, same wedge/anti-join candidates,
    // same micro-nat Adamic–Adar
    "q239_dup_linkpred" ->
      s"""WITH $LshVerifiedCtes,
prs AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 0.75),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs UNION ALL SELECT id_b, id_a FROM prs),
deg AS (SELECT src AS id, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
wedge AS (SELECT e1.src AS u, e2.dst AS v, e1.dst AS w FROM edges e1 JOIN edges e2 ON e1.dst = e2.src AND e1.src < e2.dst),
lp AS (SELECT wd.u, wd.v, count(*)::BIGINT AS cn,
  sum(CASE WHEN dw.deg >= 2 THEN 1000000000000 // floor(ln(dw.deg::DOUBLE) * 1000000.0)::BIGINT ELSE 0 END)::BIGINT AS aa6
  FROM wedge wd JOIN deg dw ON dw.id = wd.w
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = wd.u AND e.dst = wd.v)
  GROUP BY 1, 2)
SELECT c.u, c.v, c.cn, (c.cn * 10000 // (da.deg + db.deg - c.cn))::BIGINT AS jac4, c.aa6
FROM lp c JOIN deg da ON da.id = c.u JOIN deg db ON db.id = c.v
WHERE c.cn >= 2 ORDER BY c.u, c.v""",

    // q240: same day-keyed forecast joins, same exact bps APE terms
    "q240_seasonal_backtest" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS y FROM events GROUP BY 1, 2),
j AS (SELECT d.event_type, abs(d.y - f7.y) * 10000 // d.y AS ape7, abs(d.y - f1.y) * 10000 // d.y AS ape1
  FROM daily d JOIN daily f7 ON f7.event_type = d.event_type AND f7.day = d.day - 7
  JOIN daily f1 ON f1.event_type = d.event_type AND f1.day = d.day - 1)
SELECT event_type, count(*)::BIGINT AS n_eval, (sum(ape7) // count(*))::BIGINT AS mape7_bps, (sum(ape1) // count(*))::BIGINT AS mape1_bps,
CASE WHEN sum(ape7) // count(*) < sum(ape1) // count(*) THEN 'seasonal' ELSE 'naive' END AS winner
FROM j GROUP BY event_type ORDER BY event_type""",

    // q241: same half split off the same broadcast scalar, same ppm
    // shares, same micro-nat ln quantization (both engines truncate
    // integral division toward zero — verified), same greatest(p6, 1)
    // epsilon clamp inside the term so a zero share can never reach ln
    "q241_drift_psi" ->
      """WITH dz AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
d0 AS (SELECT min(day) AS d0 FROM dz),
h AS (SELECT event_type, CASE WHEN day < d0.d0 + 15 THEN 'old' ELSE 'new' END AS half, count(*)::BIGINT AS n FROM dz, d0 GROUP BY 1, 2),
wide AS (SELECT event_type, coalesce(sum(CASE WHEN half = 'old' THEN n END), 0)::BIGINT AS n_old, coalesce(sum(CASE WHEN half = 'new' THEN n END), 0)::BIGINT AS n_new FROM h GROUP BY 1),
tot AS (SELECT sum(n_old)::BIGINT AS n_old_tot, sum(n_new)::BIGINT AS n_new_tot FROM wide),
sh AS (SELECT event_type, n_old, n_new, n_old * 1000000 // tot.n_old_tot AS p_old6, n_new * 1000000 // tot.n_new_tot AS p_new6 FROM wide, tot)
SELECT event_type, n_old, n_new, p_old6, p_new6,
((greatest(p_new6, 1) - greatest(p_old6, 1)) * floor(ln(greatest(p_new6, 1)::DOUBLE / greatest(p_old6, 1)::DOUBLE) * 1000000.0)::BIGINT // 1000000)::BIGINT AS term6
FROM sh ORDER BY event_type""",

    // q242: same integer weight recurrence literals, same
    // contribute-to-anchor grid, same exact-count gap guard
    "q242_ewma_control" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS y FROM events GROUP BY 1, 2),
w(k, w) AS (SELECT * FROM (VALUES (0, 250000), (1, 187500), (2, 140625), (3, 105468), (4, 79101), (5, 59325), (6, 44493), (7, 33369)) v(k, w)),
contrib AS (SELECT event_type, day + k AS aday, count(*)::BIGINT AS nterms, sum(w * y)::BIGINT AS ewma_u FROM daily, w GROUP BY 1, 2),
ok AS (SELECT * FROM contrib WHERE nterms = 8)
SELECT d.event_type, d.day, d.y, (ok.ewma_u // 899881)::BIGINT AS ewma, (abs(d.y * 899881 - ok.ewma_u) * 10000 // ok.ewma_u)::BIGINT AS dev_bps,
(CASE WHEN abs(d.y * 899881 - ok.ewma_u) * 10000 // ok.ewma_u > 2500 THEN 1 ELSE 0 END)::BIGINT AS alarm
FROM daily d JOIN ok ON ok.event_type = d.event_type AND ok.aday = d.day ORDER BY d.event_type, d.day""",

    // q244: q210's full index-replay CTEs (coarse cells, PQ codebook,
    // codes, LUT, nprobe-4 serve) scored against the q223-style brute
    // cosine truth on the same 16 queries, rolled into agreement counts
    "q244_ann_recall_serve" ->
      """WITH kk AS (SELECT greatest(8, (count(*) + 63) // 64) AS k FROM embeddings),
cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, embedding FROM (SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) AS srn FROM embeddings) s0, kk WHERE s0.srn <= kk.k),
cells AS MATERIALIZED (SELECT vec_id, centroid_id FROM (SELECT e.vec_id, c.centroid_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS rn FROM embeddings e, cents c) WHERE rn = 1),
subs AS (SELECT unnest(range(0, 8)) AS s),
seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
cb AS MATERIALIZED (SELECT s, code, embedding[s*8+1 : s*8+8] AS cent FROM seeds, subs),
cbs AS (SELECT s, code, cent, list_inner_product(cent::DOUBLE[], cent::DOUBLE[]) / 2.0 AS half_norm2 FROM cb),
enc AS MATERIALIZED (SELECT vec_id, s, code FROM (
  SELECT e.vec_id, c.s, c.code,
    row_number() OVER (PARTITION BY e.vec_id, c.s ORDER BY (list_inner_product((e.embedding[c.s*8+1 : c.s*8+8])::DOUBLE[], c.cent::DOUBLE[]) - c.half_norm2) DESC, c.code) AS rn
  FROM embeddings e, cbs c) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 16),
qc AS MATERIALIZED (SELECT query_id, centroid_id FROM (SELECT q.query_id, c.centroid_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.centroid_id) AS cell_rank FROM q, cents c) WHERE cell_rank <= 4),
lut AS MATERIALIZED (SELECT query_id, s, code, floor(list_inner_product((qv[s*8+1 : s*8+8])::DOUBLE[], cent::DOUBLE[]) * 1000000.0)::BIGINT AS dot_u FROM q, cb),
cand AS (SELECT qc.query_id, e.vec_id, sum(l.dot_u)::BIGINT AS adc_u
  FROM enc e JOIN cells cl ON cl.vec_id = e.vec_id
  JOIN qc ON qc.centroid_id = cl.centroid_id
  JOIN lut l ON l.query_id = qc.query_id AND l.s = e.s AND l.code = e.code
  WHERE e.vec_id <> qc.query_id GROUP BY 1, 2),
served AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id, adc_u, row_number() OVER (PARTITION BY query_id ORDER BY adc_u DESC, vec_id) AS rn FROM cand) WHERE rn <= 10),
truth AS (SELECT query_id, vec_id FROM (SELECT q.query_id, e.vec_id, row_number() OVER (PARTITION BY q.query_id ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC, e.vec_id) AS rank FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rank <= 10)
SELECT s.query_id, count(*)::BIGINT AS n_served, sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_agree,
(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 10000 // 10)::BIGINT AS recall_bps
FROM served s LEFT JOIN truth t ON t.query_id = s.query_id AND t.vec_id = s.vec_id
GROUP BY s.query_id ORDER BY s.query_id""",

    // q245: same per-user duration split off the same horizon scalar,
    // same micro-nat KM log-sum with the identically-ordered re-exp
    "q245_kaplan_meier" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day FROM events),
hz AS (SELECT max(day) AS hday FROM ev),
peru AS (SELECT CASE WHEN tp IS NOT NULL THEN tp - t0 ELSE hz.hday - t0 END AS t,
  CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END::BIGINT AS obs
  FROM (SELECT user_id, min(day) AS t0, min(CASE WHEN event_type = 'purchase' THEN day END) AS tp FROM ev GROUP BY 1), hz),
hist AS (SELECT t, sum(obs)::BIGINT AS d, sum(1 - obs)::BIGINT AS c FROM peru GROUP BY 1),
grid AS (SELECT t, d, c, sum(d + c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n_risk FROM hist),
tm AS (SELECT t, d, c, n_risk,
  CASE WHEN d > 0 AND d < n_risk THEN floor(ln((n_risk - d)::DOUBLE / n_risk::DOUBLE) * 1000000.0)::BIGINT ELSE 0 END AS term_u,
  CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dead FROM grid),
cm AS (SELECT t, d, c, n_risk,
  sum(term_u) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_u,
  max(dead) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS any_dead FROM tm)
SELECT t AS t_days, n_risk, d AS n_events, c AS n_censored,
CASE WHEN any_dead = 1 THEN 0.0 ELSE floor(exp(cum_u::DOUBLE / 1000000.0) * 10000.0) / 10000.0 END AS s4
FROM cm ORDER BY t_days""",

    // q246: same cell/margin grid, same HUGEINT-squared per-cell floors,
    // same literal dof + critical value
    "q246_chi2_independence" ->
      """WITH cells AS (SELECT event_type, (epoch_us(ts) // 86400000000) % 7 AS weekday, count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
mt AS (SELECT event_type, sum(n)::BIGINT AS n_t FROM cells GROUP BY 1),
mw AS (SELECT weekday, sum(n)::BIGINT AS n_w FROM cells GROUP BY 1),
tot AS (SELECT sum(n)::BIGINT AS big_n FROM cells),
sc AS (SELECT c.event_type, c.weekday, c.n, (n_t * n_w * 1000 // big_n)::BIGINT AS exp_milli,
  ((c.n::HUGEINT * big_n - n_t::HUGEINT * n_w) * (c.n::HUGEINT * big_n - n_t::HUGEINT * n_w) * 10000 // (n_t::HUGEINT * n_w * big_n))::BIGINT AS cell4
  FROM cells c JOIN mt USING (event_type) JOIN mw USING (weekday), tot),
st AS (SELECT sum(cell4)::BIGINT AS chi2_4 FROM sc)
SELECT event_type, weekday, n, exp_milli, cell4, st.chi2_4, 24::BIGINT AS dof,
(CASE WHEN st.chi2_4 > 512792 THEN 1 ELSE 0 END)::BIGINT AS reject_indep
FROM sc, st ORDER BY event_type, weekday""",

    // q247: same daily grid, same HUGEINT variance algebra, same
    // single-day NULL guard and regime cuts
    "q247_fano_burstiness" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS y FROM events GROUP BY 1, 2),
m AS (SELECT event_type, count(*)::BIGINT AS n_days, sum(y)::BIGINT AS sy, sum((y * y)::HUGEINT) AS sq FROM daily GROUP BY 1),
f AS (SELECT event_type, n_days, (sy * 1000 // n_days)::BIGINT AS mean_milli,
  CASE WHEN n_days < 2 THEN NULL ELSE ((n_days::HUGEINT * sq - sy::HUGEINT * sy) * 10000 // (sy::HUGEINT * (n_days - 1)))::BIGINT END AS fano4
  FROM m)
SELECT event_type, n_days, mean_milli, fano4,
CASE WHEN fano4 IS NULL THEN 'undefined' WHEN fano4 > 15000 THEN 'overdispersed' WHEN fano4 < 6667 THEN 'underdispersed' ELSE 'poisson_like' END AS regime
FROM f ORDER BY event_type""",

    // q248: same keyed-window trigrams, same bps shares
    "q248_session_paths" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tu, event_type AS e1 FROM events),
tri AS (SELECT e1, lead(e1, 1) OVER w AS e2, lead(e1, 2) OVER w AS e3 FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
cen AS (SELECT e1, e2, e3, count(*)::BIGINT AS n_paths FROM tri WHERE e3 IS NOT NULL GROUP BY 1, 2, 3),
tot AS (SELECT sum(n_paths)::BIGINT AS n_tot FROM cen)
SELECT e1 || '>' || e2 || '>' || e3 AS path, n_paths, (n_paths * 10000 // n_tot)::BIGINT AS share_bps
FROM cen, tot ORDER BY path""",

    // q249: same ppm transition matrix, the SAME 16 literal power-
    // iteration steps unrolled as chained CTEs (identical uniform start,
    // identical per-term integer division), same L1 residual
    "q249_markov_stationary" -> {
      val steps = (1 to 16).map { k =>
        s"pi$k AS (SELECT p.nxt AS st, sum(x.pi6 * p.p6 // 1000000)::BIGINT AS pi6 FROM pi${k - 1} x JOIN p ON p.cur = x.st GROUP BY p.nxt)"
      }.mkString(",\n")
      s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tu, event_type AS cur FROM events),
sq AS (SELECT cur, lead(cur, 1) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS nxt FROM ev),
pairs AS (SELECT cur, nxt, count(*)::BIGINT AS c FROM sq WHERE nxt IS NOT NULL GROUP BY 1, 2),
rws AS (SELECT cur, sum(c)::BIGINT AS c_cur FROM pairs GROUP BY 1),
p AS (SELECT pairs.cur, pairs.nxt, (c * 1000000 // c_cur)::BIGINT AS p6 FROM pairs JOIN rws USING (cur)),
states AS (SELECT DISTINCT cur AS st FROM p),
nn AS (SELECT count(*)::BIGINT AS t FROM states),
pi0 AS (SELECT st, (1000000 // t)::BIGINT AS pi6 FROM states, nn),
$steps
SELECT f.st AS event_type, f.pi6, abs(f.pi6 - pr.pi6)::BIGINT AS resid6
FROM pi16 f JOIN pi15 pr ON pr.st = f.st ORDER BY event_type"""
    },

    // q250: one verified-pair relation, five exact-binary τ literals
    "q250_threshold_sweep" ->
      s"""WITH $LshVerifiedCtes,
pr AS (SELECT id_a, id_b, est_jac FROM verified WHERE est_jac >= 0.5),
taus AS (SELECT * FROM (VALUES (0.5), (0.625), (0.75), (0.875), (1.0)) v(tau)),
cut AS (SELECT taus.tau, pr.id_a, pr.id_b FROM pr, taus WHERE pr.est_jac >= taus.tau),
np AS (SELECT tau, count(*)::BIGINT AS n_pairs FROM cut GROUP BY 1),
nd AS (SELECT tau, count(DISTINCT id)::BIGINT AS n_docs FROM (SELECT tau, id_a AS id FROM cut UNION ALL SELECT tau, id_b FROM cut) GROUP BY 1)
SELECT (np.tau * 10000)::BIGINT AS tau4, n_pairs, n_docs FROM np JOIN nd ON np.tau = nd.tau ORDER BY tau4""",

    // q251: same sig/cand CTEs; agreement of full hashes vs their low
    // bits, same 1250-per-step bps algebra
    "q251_bbit_minhash" ->
      s"""WITH $LshVerifiedCtes,
pb AS (SELECT len(list_filter(range(0,8), i -> sa.mh[i+1] = sb.mh[i+1]))::BIGINT AS agree8,
  len(list_filter(range(0,8), i -> (sa.mh[i+1] % 2) = (sb.mh[i+1] % 2)))::BIGINT AS agree1
  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a JOIN sig sb ON sb.doc_id = c.id_b)
SELECT agree8, count(*)::BIGINT AS n_pairs,
(sum((2 * agree1 - 8) * 1250) // count(*))::BIGINT AS avg_est1_bps,
min((2 * agree1 - 8) * 1250)::BIGINT AS min_est1_bps,
max((2 * agree1 - 8) * 1250)::BIGINT AS max_est1_bps
FROM pb GROUP BY agree8 ORDER BY agree8""",

    // q252: the oracle is the FULL view recompute — equality IS the
    // maintenance-correctness test (count/sum are Abelian)
    "q252_incremental_join_view" ->
      """SELECT n_name, count(*)::BIGINT AS n_orders, round(sum(o_totalprice), 2) AS total_price,
sum(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_from_delta
FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name""",

    // q253: the synth box tree is closed-form in doc_id (timescale 600,
    // duration 600·(10+id%7) → (10+id%7)·1000 ms, video 320+16·(id%8) ×
    // 240+16·(id%5), avc1 on even ids else vp09, mp4a audio iff id%3=0)
    "q253_mp4_metadata" ->
      """SELECT doc_id, 1::INT AS is_mp4, 'isom' AS brand,
((10 + doc_id % 7) * 1000)::BIGINT AS duration_ms,
(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END)::BIGINT AS n_tracks,
1::BIGINT AS n_video,
(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_audio,
(320 + 16 * (doc_id % 8))::BIGINT AS width,
(240 + 16 * (doc_id % 5))::BIGINT AS height,
CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'vp09' END AS video_codec
FROM documents ORDER BY doc_id""",

    // q254: closed-form ADTS fixture (20+id%6 frames, rate table at
    // id%9, 1+id%2 channels, profile id%3; duration = frames·1024·10⁶ //
    // rate, zero junk)
    "q254_adts_metadata" ->
      """SELECT doc_id, 1::INT AS is_adts, (20 + doc_id % 6)::BIGINT AS n_frames,
([96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050, 16000])[(doc_id % 9)::INT + 1]::BIGINT AS sample_rate,
(1 + doc_id % 2)::BIGINT AS channels, (doc_id % 3)::BIGINT AS profile,
((20 + doc_id % 6) * 1024 * 1000000 // ([96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050, 16000])[(doc_id % 9)::INT + 1])::BIGINT AS duration_us,
0::BIGINT AS n_junk_bytes
FROM documents ORDER BY doc_id""",

    // q255: all six merge rounds replayed as chained CTEs; each b_i is
    // that round's argmax pair, exactly the trainer's collect
    "q255_bpe_train" ->
      s"""WITH $BpeTrainCtes
SELECT * FROM (SELECT 1::BIGINT AS rank, l, r, cnt FROM b1
UNION ALL SELECT 2::BIGINT, l, r, cnt FROM b2
UNION ALL SELECT 3::BIGINT, l, r, cnt FROM b3
UNION ALL SELECT 4::BIGINT, l, r, cnt FROM b4
UNION ALL SELECT 5::BIGINT, l, r, cnt FROM b5
UNION ALL SELECT 6::BIGINT, l, r, cnt FROM b6) ORDER BY rank""",

    // q256: the post-round-6 symbolization s6 IS the encoded vocab;
    // fertility = its per-type symbol count histogram
    "q256_bpe_fertility" ->
      s"""WITH $BpeTrainCtes
SELECT len(string_split(substr(s, 2, length(s) - 2), chr(3) || chr(2)))::BIGINT AS n_syms,
count(*)::BIGINT AS n_types, sum(c)::BIGINT AS n_occurrences
FROM s6 GROUP BY 1 ORDER BY n_syms""",

    // q259: closed-form FLAC fixture (rate table at id%9, 1+id%8
    // channels, 16/24 bits, total samples rate·(5+id%11) → duration
    // exactly (5+id%11) s, STREAMINFO + PADDING = 2 blocks)
    "q259_flac_metadata" ->
      """SELECT doc_id, 1::INT AS is_flac,
([8000, 16000, 22050, 24000, 32000, 44100, 48000, 88200, 96000])[(doc_id % 9)::INT + 1]::BIGINT AS sample_rate,
(1 + doc_id % 8)::BIGINT AS channels,
(16 + 8 * (doc_id % 2))::BIGINT AS bits_per_sample,
(([8000, 16000, 22050, 24000, 32000, 44100, 48000, 88200, 96000])[(doc_id % 9)::INT + 1] * (5 + doc_id % 11))::BIGINT AS total_samples,
((5 + doc_id % 11) * 1000000)::BIGINT AS duration_us,
2::BIGINT AS n_blocks
FROM documents ORDER BY doc_id""",

    // q257: same 3 hand-chained vote rounds (each node's own label
    // UNION ALL'd in as the self-vote), same (count desc, label) argmax
    // via QUALIFY — SQL cannot loop, so the round count is the query
    // contract (as q255's merge rounds)
    "q257_label_communities" ->
      s"""WITH $LshVerifiedCtes,
prs AS (SELECT id_a, id_b FROM verified WHERE est_jac >= 0.75),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs UNION ALL SELECT id_b, id_a FROM prs),
l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
c1 AS (SELECT id, label, count(*)::BIGINT AS c FROM (SELECT e.dst AS id, l.label FROM edges e JOIN l0 l ON l.id = e.src UNION ALL SELECT id, label FROM l0) GROUP BY 1, 2),
l1 AS (SELECT id, label FROM c1 QUALIFY row_number() OVER (PARTITION BY id ORDER BY c DESC, label) = 1),
c2 AS (SELECT id, label, count(*)::BIGINT AS c FROM (SELECT e.dst AS id, l.label FROM edges e JOIN l1 l ON l.id = e.src UNION ALL SELECT id, label FROM l1) GROUP BY 1, 2),
l2 AS (SELECT id, label FROM c2 QUALIFY row_number() OVER (PARTITION BY id ORDER BY c DESC, label) = 1),
c3 AS (SELECT id, label, count(*)::BIGINT AS c FROM (SELECT e.dst AS id, l.label FROM edges e JOIN l2 l ON l.id = e.src UNION ALL SELECT id, label FROM l2) GROUP BY 1, 2),
l3 AS (SELECT id, label FROM c3 QUALIFY row_number() OVER (PARTITION BY id ORDER BY c DESC, label) = 1),
szs AS (SELECT label, count(*)::BIGINT AS sz FROM l3 GROUP BY 1)
SELECT sz AS community_size, count(*)::BIGINT AS n_communities, sum(sz)::BIGINT AS n_nodes
FROM szs GROUP BY 1 ORDER BY community_size""",

    // q258: same day-pair sign sum, same integer var18, same
    // continuity-corrected bps quantization (sqrt exactly rounded both
    // engines); n_days cast to BIGINT before the cubic so DuckDB's
    // HUGEINT sum never leaks into the arithmetic
    "q258_mann_kendall" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS y FROM events GROUP BY 1, 2),
sagg AS (SELECT a.event_type, sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END)::BIGINT AS s
  FROM daily a JOIN daily b ON b.event_type = a.event_type AND a.day < b.day GROUP BY 1),
ties AS (SELECT event_type, y, count(*)::BIGINT AS t FROM daily GROUP BY 1, 2),
v AS (SELECT event_type, sum(t)::BIGINT AS n_days, sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_corr FROM ties GROUP BY 1),
v2 AS (SELECT event_type, n_days, (n_days * (n_days - 1) * (2 * n_days + 5) - tie_corr)::BIGINT AS var18 FROM v),
z AS (SELECT s.event_type, v2.n_days, s.s, v2.var18,
  CASE WHEN v2.var18 > 0 THEN floor(((s.s - CASE WHEN s.s > 0 THEN 1 WHEN s.s < 0 THEN -1 ELSE 0 END) * 10000)::DOUBLE / sqrt(v2.var18::DOUBLE / 18.0))::BIGINT ELSE 0 END AS z_bps
  FROM sagg s JOIN v2 ON v2.event_type = s.event_type)
SELECT event_type, n_days, s, var18, z_bps,
CASE WHEN z_bps > 19600 THEN 'up' WHEN z_bps < -19600 THEN 'down' ELSE 'none' END AS trend
FROM z ORDER BY event_type""",

    // q243: the synth corpus is closed-form in doc_id (CBR MPEG-1 Layer
    // III: 16 + id%5 frames, bitrate table at 1 + id%14, rate table at
    // id%3, mono on even ids), so the oracle replays the parser's output
    // arithmetically — duration = frames·1152·10⁶ // rate, zero junk
    "q243_mpeg_metadata" ->
      """SELECT doc_id, 1::INT AS is_mpeg, (16 + doc_id % 5)::BIGINT AS n_frames,
([44100, 48000, 32000])[(doc_id % 3)::INT + 1]::BIGINT AS sample_rate,
(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END)::BIGINT AS channels,
([32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320])[(doc_id % 14)::INT + 1]::BIGINT AS kbps,
((16 + doc_id % 5) * 1152 * 1000000 // ([44100, 48000, 32000])[(doc_id % 3)::INT + 1])::BIGINT AS duration_us,
0::BIGINT AS n_junk_bytes
FROM documents ORDER BY doc_id""",

    // q234: same keyed inversion window (first row's NULL prior max
    // compares false on both engines)
    "q234_watermark_lag" ->
      """WITH ev AS (SELECT event_type, user_id, event_id, epoch_us(ts) AS tsu FROM events),
lg AS (SELECT event_type, CASE WHEN pm > tsu THEN pm - tsu ELSE 0 END AS late_us FROM (SELECT event_type, tsu, max(tsu) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM ev))
SELECT event_type, count(*)::BIGINT AS n_events, sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late, (sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 10000 // count(*))::BIGINT AS late_bps, max(late_us)::BIGINT AS max_late_us, (sum(late_us) // count(*))::BIGINT AS mean_late_us FROM lg GROUP BY event_type ORDER BY event_type""",
  )
}
