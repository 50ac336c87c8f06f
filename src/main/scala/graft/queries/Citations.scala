package graft.queries

import graft.{QueryDef, Tables}
import graft.wcd.{Claims, Extract, ReadQueries}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked end-to-end exercises of the citation pipeline
  * (SURVEY.md §3.1): deterministic wikitext is synthesized from the
  * `documents` table (same arithmetic on both engines), Spark runs the
  * REAL parse→normalize→hash→claims pipeline on it, and the DuckDB
  * oracle recomputes the expected outputs directly from the generation
  * formula. Any divergence in the parser, expression library, hashing,
  * dedup or claims projection breaks the hash-compare.
  *
  * Per doc (id = doc_id, N = row count):
  *   - base `cite web`: url https://ex{id%7}.com/a/{id}, title, last=L{id%13},
  *     first=F{id%11}, date in one of the 9 supported formats (id%9),
  *     website=W{id%7}, doi=10.1234/x{id} when id%3=0
  *   - id%5=0: the SAME citation repeated (H5 dedup must drop it)
  *   - id%4=0: a `cite book` with a dashed ISBN-13 (hash from isbn)
  *   - id%6=0: a `cite web` with no identifier at all (md5hash NULL →
  *     STRING_CITATIONS path)
  */
object Citations {

  private val DateForms = Seq(
    "2013-05-09", "May 9, 2013", "Jul 9, 2013", "May 25, 2012a",
    "1 September 2003", "26 Dec 1996", "September 2003", "Sep 2003", "2003")

  /** Expected parse results for DateForms, for the oracle CASE. */
  private val DateValues = Seq(
    "2013-05-09", "2013-05-09", "2013-07-09", "2012-05-25",
    "2003-09-01", "1996-12-26", "2003-09-01", "2003-09-01", "2003-01-01")

  /** The synthesized corpus: documents → (page_id, title, language_code,
    * wikitext). */
  def pages(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val dateStr = element_at(
      array(DateForms.map(lit): _*), (id % 9).cast("int") + 1)
    val url = concat(lit("https://ex"), id % 7, lit(".com/a/"), id)
    val base = concat(
      lit("{{cite web|url="), url,
      lit("|title=Doc "), id,
      lit("|last=L"), id % 13, lit("|first=F"), id % 11,
      lit("|date="), dateStr,
      lit("|website=W"), id % 7,
      when(id % 3 === 0, concat(lit("|doi=10.1234/x"), id)).otherwise(lit("")),
      lit("}}"))
    val dup = when(id % 5 === 0, base).otherwise(lit(""))
    val book = when(id % 4 === 0,
      concat(lit("{{cite book|isbn=978-"), lpad(id.cast("string"), 10, "0"),
        lit("|title=B"), id, lit("}}"))).otherwise(lit(""))
    val noid = when(id % 6 === 0,
      concat(lit("{{cite web|title=NoId"), id, lit("|website=W"), id % 7,
        lit("}}"))).otherwise(lit(""))
    Tables(s, dir, "documents").select(
      id.as("page_id"),
      concat(lit("Doc "), id).as("title"),
      lit("en").as("language_code"),
      concat(base, dup, book, noid).as("wikitext"))
  }

  /** Landed fact tables, one temp parquet dir per source dir, reused
    * for the JVM's lifetime and removed on exit. LANDING (not caching)
    * is the production shape at 100 TB — the parse pipeline runs once,
    * the result persists on storage, and every downstream query plans
    * against a flat columnar scan. The measured difference is not just
    * execution: planning against the plan-keyed CACHE re-analyzes the
    * 300-column enrichment DAG per query (3–25 s of driver time per
    * c-query at sf0.1), while planning against the landed scan is
    * milliseconds. */
  private val landedTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** computeIfAbsent owns the write atomically per key, so concurrent
    * suites can't race on the same landing path. The build must NOT land
    * another table (nested computeIfAbsent on one ConcurrentHashMap is a
    * forbidden recursive update) — land dependencies first, outside. */
  private def landOnce(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val path = landedTables.computeIfAbsent(s"$dir/$name", _ => {
      val root = graft.TempTrees.scratch("graft-landed")
      graft.TempTrees.deleteOnExit(root)
      val p = root.resolve(name)
      build.write.parquet(p.toString)
      p.toString
    })
    s.read.parquet(path)
  }

  /** The 39 columns downstream consumers actually read — the projection
    * that prunes the ~290 unused enrichment expressions out of the
    * parse pipeline (shared by the [[refs]] landing and c15's in-plan
    * chain). */
  private val RefsNeeded = Seq(
    "page_id", "page_title", "language_code", "ref_pos", "template_name",
    "md5hash", "date_ts", "access_date_ts", "archive_date_ts",
    "publication_date_ts", "doi", "google_books_id", "internet_archive_id",
    "isbn_10", "isbn_13", "oclc", "pmid", "wikidata_qid", "location",
    "vauthors", "periodical", "publisher", "title", "website", "url",
    "archive_url", "chapter_url", "conference_url", "lay_url",
    "transcripturl", "detected_archive_of_archive_url",
    "first_level_domain_of_url", "first_level_domain_of_url_hash",
    "authors_list", "persons_without_role", "editors_list", "hosts_list",
    "interviewers_list", "translators_list")

  /** The parsed references fact table, landed on first use with the
    * [[RefsNeeded]] projection — 39 columns instead of 330, the same
    * trimming a production run applies when landing the refs table. */
  private def refs(s: SparkSession, dir: String): DataFrame =
    landOnce(s, dir, "refs.parquet") {
      Extract.references(pages(s, dir)).select(RefsNeeded.map(col): _*)
    }

  /** The claims table, landed once per source dir: c6/c7/c11 read it
    * (the production analog lands the claims table before serving read
    * queries). On a cache hit, read directly; otherwise land refs FIRST,
    * outside the claims landing (landOnce's no-nesting contract), so the
    * hit path never re-reads the refs footers it won't use. */
  private def claimsTable(s: SparkSession, dir: String): DataFrame = {
    val existing = landedTables.get(s"$dir/claims.parquet")
    if (existing != null) s.read.parquet(existing)
    else {
      val landedRefs = refs(s, dir)
      landOnce(s, dir, "claims.parquet") {
        Claims.allClaims(pages(s, dir), landedRefs,
          to_timestamp(lit("2026-08-12 00:00:00")))
      }
    }
  }

  /** Materialize the landed refs + claims tables. Bench calls this once,
    * outside the per-query timed region, and reports it as its own
    * line. */
  def warmShared(s: SparkSession, dir: String): Unit = warmSharedTimed(s, dir)

  /** [[warmShared]] with per-table landing seconds, so the bench record
    * can attribute the warm cost (claims dominates — it replans the
    * parse pipeline) instead of reporting one opaque number.
    *
    * Build order (round-6): `refs` lands FIRST and ALONE — its landing
    * time is the bench's box-noise canary, and co-running work would
    * fold scheduler contention into the one number whose whole job is
    * to certify the box. The remaining eight landings are mutually
    * independent (claims' refs dependency is already on disk by then)
    * and build CONCURRENTLY on six futures — a Spark driver schedules
    * concurrent jobs fine, and the landings contend only on executor
    * slots. A production snapshot build runs its index-build DAG the
    * same way: the critical path is the longest chain, not the sum.
    * Per-table seconds are wall times INSIDE the parallel region, so
    * they can overlap — they attribute cost; Bench reports warm_sec as
    * the wall time around the whole call. */
  def warmSharedTimed(s: SparkSession, dir: String): Seq[(String, Double)] = {
    def timed(name: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      body
      name -> (System.nanoTime() - t0) / 1e9
    }
    // multi-file re-landing of the single-row-group driver tables runs
    // FIRST: every later landing (refs included) then scans in
    // parallel instead of one task per raw file (round-9 finding: a
    // parquet scan cannot split inside a row group, so the wikitext
    // parse behind refs ran on ONE core however many the session had)
    val relandPart = timed("reland")(graft.Tables.reland(s, dir,
      s.conf.get("spark.sql.shuffle.partitions").toInt))
    val refsPart = timed("refs")(refs(s, dir))
    // r16 (VERDICT r15 #1, guide §2.6 "2-3 jobs in flight is plenty"):
    // the 17 landings were 7 fixed chains on a 6-thread pool — fine on
    // the quiet builder box (warm ~22-25 s), but 7-way concurrency is
    // exactly what degraded on the driver's box (warm 32.3 → 74.9 s on
    // an essentially unchanged table set, canary flat). The chains are
    // now a dependency-aware task list drained HEAVIEST-FIRST by a
    // bounded pool (default 3 workers): enough overlap to fill each
    // build's scheduling tail, never 7 concurrent multi-stage builds
    // fighting for the same task slots. Priorities are measured serial
    // costs (LandingBench, r15/r16) plus each task's downstream weight,
    // so the long poles (claims, the dedup-cluster chain, pq/kmeans
    // training) start first and the critical path stays ~Σcost/3.
    // A landing referenced from two tasks is still built exactly once —
    // landDeriv's computeIfAbsent makes the loser block on the winner.
    val workers = math.max(1, s.conf.getOption("spark.graft.warmWorkers")
      .map(_.toInt).getOrElse(3))
    // (name, deps, priority = own serial cost + downstream cost, build)
    val tasks: Seq[(String, Seq[String], Double, () => Unit)] = Seq(
      ("claims", Nil, 6.0, () => { claimsTable(s, dir); () }),
      ("co_order_edges", Nil, 5.0,
        () => { Pipelines.partCoOrderEdges(s, dir); () }),
      ("node_route_coorder", Seq("co_order_edges"), 1.2,
        () => { Pipelines.coorderRouteCardLanded(s, dir); () }),
      ("sp_pairs", Nil, 3.1, () => { Pipelines.supplierPartPairs(s, dir); () }),
      ("node_route_pagerank", Seq("sp_pairs"), 1.3,
        () => { Pipelines.pagerankRouteCardLanded(s, dir); () }),
      ("doc_shingles", Nil, 4.3, () => { TrainingData.docShingles(s, dir); () }),
      ("minhash_sigs", Nil, 4.8,
        () => { TrainingData.docMinhashSigs(s, dir); () }),
      ("node_route_cc", Nil, 3.6,
        () => { TrainingData.ccRouteCardLanded(s, dir); () }),
      ("dedup_clusters", Seq("doc_shingles", "minhash_sigs", "node_route_cc"),
        3.5, () => { TrainingData.dedupClusters(s, dir); () }),
      ("seed_grams", Nil, 4.3, () => { TrainingData.seedGramsLanded(s, dir); () }),
      ("shared_runs", Seq("seed_grams"), 3.3,
        () => { TrainingData.sharedRunsLanded(s, dir); () }),
      ("emb_buckets_neardup", Nil, 0.9, () => { TrainingData.embBuckets(s, dir,
        TrainingData.NearDupLshTables, TrainingData.NearDupLshPlanes); () }),
      ("emb_buckets_ann", Nil, 0.7, () => { TrainingData.embBuckets(s, dir,
        TrainingData.AnnLshTables, TrainingData.AnnLshPlanes); () }),
      ("kmeans_books", Nil, 3.9, () => { TrainingData.kmeansBooks(s, dir); () }),
      ("pq_books", Nil, 4.5, () => { TrainingData.pqBooks(s, dir); () }),
      ("lm_unigrams", Nil, 0.9, () => { TrainingData.lmUnigrams(s, dir); () }),
      ("lm_bigrams", Nil, 1.2, () => { TrainingData.lmBigrams(s, dir); () }))
    val parts2 = runWarmTasks(tasks, workers)
    val parts = Seq(relandPart, refsPart) ++ parts2
    // canonical record order, independent of completion order
    val order = Seq("reland", "refs", "claims", "co_order_edges",
      "node_route_coorder", "sp_pairs", "node_route_pagerank",
      "doc_shingles", "lm_unigrams", "lm_bigrams", "minhash_sigs",
      "kmeans_books", "emb_buckets_neardup", "emb_buckets_ann", "pq_books",
      "node_route_cc", "seed_grams", "shared_runs", "dedup_clusters")
    order.flatMap(n => parts.find(_._1 == n))
  }

  /** Bounded-concurrency dependency scheduler for the warm landings:
    * `workers` threads drain a ready queue ordered by descending
    * priority; a task becomes ready when every dependency has finished.
    * On any failure the remaining queue is abandoned and the pool is
    * interrupted (Spark cancels jobs on interrupt) and DRAINED before
    * the failure propagates — a failed build must not let the JVM exit
    * (TempTrees shutdown hooks delete landing dirs) while sibling
    * landing jobs are still writing (ADVICE r6). */
  private[graft] def runWarmTasks(
      tasks: Seq[(String, Seq[String], Double, () => Unit)],
      workers: Int): Seq[(String, Double)] = {
    // per-table wall seconds INSIDE the bounded-parallel region — they
    // attribute cost and can overlap, same contract as before
    def timed(name: String)(body: () => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      body()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val lock = new Object
    val done = scala.collection.mutable.Set[String]()
    val results = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    var failure: Option[Throwable] = None
    var pendingOrRunning = tasks.length
    val waiting = scala.collection.mutable.ArrayBuffer[
      (String, Seq[String], Double, () => Unit)](tasks: _*)
    val ready = scala.collection.mutable.PriorityQueue.empty[
      (Double, String, () => Unit)](
      Ordering.by[(Double, String, () => Unit), Double](_._1))
    def promote(): Unit = { // lock held
      val (now, later) = waiting.partition(_._2.forall(done.contains))
      waiting.clear(); waiting ++= later
      now.foreach(t => ready.enqueue((t._3, t._1, t._4)))
    }
    lock.synchronized(promote())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
    (1 to workers).foreach { _ =>
      pool.execute(() => {
        var running = true
        while (running) {
          val next = lock.synchronized {
            if (failure.nonEmpty || pendingOrRunning == 0) { running = false; None }
            else if (ready.isEmpty) { lock.wait(50); None }
            else Some(ready.dequeue())
          }
          next.foreach { case (_, name, build) =>
            try {
              val r = timed(name)(build)
              lock.synchronized {
                results += r; done += name; pendingOrRunning -= 1
                promote(); lock.notifyAll()
              }
            } catch { case e: Throwable =>
              lock.synchronized {
                if (failure.isEmpty) failure = Some(e)
                pendingOrRunning -= 1; lock.notifyAll()
              }
            }
          }
        }
      })
    }
    pool.shutdown()
    val failed = lock.synchronized(failure)
    if (failed.nonEmpty) pool.shutdownNow()
    pool.awaitTermination(Long.MaxValue >> 32, java.util.concurrent.TimeUnit.SECONDS)
    lock.synchronized(failure).foreach(throw _)
    lock.synchronized(results.toSeq)
  }

  /** Oracle helper: the per-doc modular helpers as a DuckDB CTE. */
  private val D =
    """WITH d AS (SELECT doc_id, doc_id % 3 AS m3, doc_id % 4 AS m4,
      |  doc_id % 5 AS m5, doc_id % 6 AS m6, doc_id % 7 AS m7,
      |  doc_id % 9 AS m9, doc_id % 11 AS m11, doc_id % 13 AS m13
      |  FROM documents)""".stripMargin

  private val dateCase =
    "CASE m9 " + DateValues.zipWithIndex.map { case (v, i) =>
      s"WHEN $i THEN TIMESTAMP '$v 00:00:00' "
    }.mkString + "END"

  val defs: Seq[QueryDef] = Seq(

    // --- F1→F7: the 9-format date parser through the whole pipeline
    QueryDef.sql(
      "c1_parse_dates",
      s"""$D
         |SELECT doc_id AS page_id, $dateCase AS date_ts
         |FROM d ORDER BY page_id""".stripMargin) { (s, dir) =>
      refs(s, dir)
        .filter(col("template_name") === "cite web" && col("md5hash").isNotNull)
        .select(col("page_id"), col("date_ts"))
        .orderBy(col("page_id"))
    },

    // --- the flagship: top cited first-level domains (SURVEY §7.3)
    QueryDef.sql(
      "c2_top_fld",
      s"""$D
         |SELECT 'ex' || CAST(m7 AS VARCHAR) || '.com' AS fld,
         |  CAST(COUNT(*) AS BIGINT) AS n_refs,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_pages
         |FROM d GROUP BY 1 ORDER BY n_refs DESC, fld""".stripMargin) { (s, dir) =>
      refs(s, dir)
        .filter(col("first_level_domain_of_url").isNotNull)
        .groupBy(col("first_level_domain_of_url").as("fld"))
        .agg(count(lit(1)).as("n_refs"), countDistinct(col("page_id")).as("n_pages"))
        .orderBy(col("n_refs").desc, col("fld"))
    },

    // --- H1: the priority-chain content hash, exact md5 hex
    QueryDef.sql(
      "c3_reference_hash",
      s"""$D
         |SELECT doc_id AS page_id,
         |  md5('WikiCitations' || CASE WHEN m3 = 0
         |    THEN '10.1234/x' || CAST(doc_id AS VARCHAR)
         |    ELSE 'https://ex' || CAST(m7 AS VARCHAR) || '.com/a/' || CAST(doc_id AS VARCHAR)
         |    END) AS md5hash
         |FROM d ORDER BY page_id""".stripMargin) { (s, dir) =>
      refs(s, dir)
        .filter(col("template_name") === "cite web" && col("md5hash").isNotNull)
        .select(col("page_id"), col("md5hash"))
        .orderBy(col("page_id"))
    },

    // --- F18/F19: person assembly through the pipeline
    QueryDef.sql(
      "c4_persons",
      s"""$D
         |SELECT doc_id AS page_id,
         |  'F' || CAST(m11 AS VARCHAR) || ' ' || 'L' || CAST(m13 AS VARCHAR) AS full_name
         |FROM d ORDER BY page_id""".stripMargin) { (s, dir) =>
      refs(s, dir)
        .filter(col("template_name") === "cite web" && col("md5hash").isNotNull)
        .select(col("page_id"),
          explode(col("persons_without_role.full_name")).as("full_name"))
        .orderBy(col("page_id"))
    },

    // --- H5+Q6: per-page reference statistics after in-page dedup
    QueryDef.sql(
      "c5_page_stats",
      s"""$D
         |SELECT doc_id AS page_id,
         |  CAST(1 + (m4 = 0)::INT + (m6 = 0)::INT AS BIGINT) AS number_of_references,
         |  CAST(1 + (m4 = 0)::INT AS BIGINT) AS number_of_hashed_references,
         |  CAST(FLOOR((1 + (m4 = 0)::INT) * 100 / (1 + (m4 = 0)::INT + (m6 = 0)::INT)) AS INT)
         |    AS percent_hashed
         |FROM d ORDER BY page_id""".stripMargin) { (s, dir) =>
      ReadQueries.pageHashStatistics(refs(s, dir)).orderBy(col("page_id"))
    },

    // --- C1–C9+Q2: the whole claims projection, counted per property
    QueryDef.sql(
      "c6_claims_stats",
      s"""WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(COUNT(*) FILTER (doc_id % 3 = 0) AS BIGINT) AS n3,
         |    CAST(COUNT(*) FILTER (doc_id % 4 = 0) AS BIGINT) AS n4,
         |    CAST(COUNT(*) FILTER (doc_id % 6 = 0) AS BIGINT) AS n6,
         |    CAST(COUNT(DISTINCT doc_id % 7) AS BIGINT) AS nfld
         |  FROM documents)
         |SELECT 'CITATIONS' AS property, n AS n_items, n + n4 AS n_claims FROM c
         |UNION ALL SELECT 'DOI', n3, n3 FROM c
         |UNION ALL SELECT 'FIRST_LEVEL_DOMAIN_STRING', nfld, nfld FROM c
         |UNION ALL SELECT 'FULL_NAME_STRING', n, n FROM c
         |UNION ALL SELECT 'HASH', n + n4 + nfld + n, n + n4 + nfld + n FROM c
         |UNION ALL SELECT 'INSTANCE_OF', n + n4 + nfld + n, n + n4 + nfld + n FROM c
         |UNION ALL SELECT 'ISBN_13', n4, n4 FROM c
         |UNION ALL SELECT 'LAST_UPDATE', n, n FROM c
         |UNION ALL SELECT 'MEDIAWIKI_PAGE_ID', n, n FROM c
         |UNION ALL SELECT 'PUBLISHED_IN', n, n FROM c
         |UNION ALL SELECT 'RETRIEVED_DATE', n + n4, n + n4 FROM c
         |UNION ALL SELECT 'SOURCE_WIKIPEDIA', n + n4 + nfld, n + n4 + nfld FROM c
         |UNION ALL SELECT 'STRING_CITATIONS', n6, n6 FROM c
         |UNION ALL SELECT 'TEMPLATE_NAME', n + n4, n + n4 FROM c
         |UNION ALL SELECT 'TITLE', n + n4 + n, n + n4 + n FROM c
         |UNION ALL SELECT 'URL', n + n, n + n FROM c
         |UNION ALL SELECT 'WEBSITE', n, n FROM c
         |UNION ALL SELECT 'WEBSITE_STRING', n, n FROM c
         |ORDER BY property""".stripMargin) { (s, dir) =>
      // the three claim branches (reference/website/page items) read the
      // LANDED refs table instead of re-planning and re-running the parse
      // pipeline three times — the same shape as a production run that
      // lands the refs fact table before projecting claims
      ReadQueries.propertyStatistics(claimsTable(s, dir)).orderBy(col("property"))
    },

    // --- A7 rinse: delete all reference items, count what remains
    QueryDef.sql(
      "c7_rinse",
      """WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT doc_id % 7) AS BIGINT) AS nfld FROM documents)
        |SELECT 'WEBSITE_ITEM' AS item_class, nfld AS n_items FROM c
        |UNION ALL SELECT 'WIKIPEDIA_PAGE', n FROM c
        |ORDER BY item_class""".stripMargin) { (s, dir) =>
      ReadQueries.classCounts(
          ReadQueries.deleteItemsOfClass(claimsTable(s, dir), Claims.WikipediaReference))
        .orderBy(col("item_class"))
    },

    // --- the SQL surface: registered template UDTF via LATERAL VIEW
    QueryDef.sql(
      "c8_sql_templates",
      s"""$D
         |SELECT 'cite book' AS template_name,
         |  CAST(COUNT(*) FILTER (m4 = 0) AS BIGINT) AS n FROM d
         |UNION ALL
         |SELECT 'cite web',
         |  CAST(COUNT(*) + COUNT(*) FILTER (m5 = 0)
         |     + COUNT(*) FILTER (m6 = 0) AS BIGINT) FROM d
         |ORDER BY template_name""".stripMargin) { (s, dir) =>
      graft.parse.TemplateFunctions.register(s)
      org.apache.spark.sql.graftshim.SqlFunctions.register(s)
      pages(s, dir).createOrReplaceTempView("wiki_pages")
      s.sql(
        """SELECT t.name AS template_name, COUNT(*) AS n
          |FROM wiki_pages LATERAL VIEW explode(extract_templates(wikitext)) e AS t
          |GROUP BY t.name ORDER BY template_name""".stripMargin)
    },

    // --- A8 rejects channel: strict-load drops flow to the error sink
    QueryDef.sql(
      "c9_rejects",
      s"""$D
         |SELECT doc_id AS page_id, 'bogus_key' AS unknown_key FROM d
         |WHERE doc_id % 2 = 0 ORDER BY page_id""".stripMargin) { (s, dir) =>
      val id = col("doc_id")
      val wt = when(id % 2 === 0,
          concat(lit("{{cite web|bogus_key=1|title=T"), id, lit("}}")))
        .otherwise(concat(lit("{{cite web|title=T"), id, lit("}}")))
      val p = Tables(s, dir, "documents").select(
        id.as("page_id"), concat(lit("Doc "), id).as("title"),
        lit("en").as("language_code"), wt.as("wikitext"))
      Extract.rejects(p)
        .select(col("page_id"), explode(col("unknown_keys")).as("unknown_key"))
        .orderBy(col("page_id"))
    },

    // --- A5/H6/H8: the idempotent hash-index merge, run twice — the
    // second run must mint nothing and resolve identically
    QueryDef.sql(
      "c10_hash_index",
      s"""$D
         |, h AS (
         |  SELECT md5('WikiCitations' || CASE WHEN m3 = 0
         |    THEN '10.1234/x' || CAST(doc_id AS VARCHAR)
         |    ELSE 'https://ex' || CAST(m7 AS VARCHAR) || '.com/a/' || CAST(doc_id AS VARCHAR)
         |    END) AS hash FROM d
         |  UNION
         |  SELECT md5('WikiCitations' || '978' || lpad(CAST(doc_id AS VARCHAR), 10, '0'))
         |  FROM d WHERE m4 = 0)
         |SELECT hash, 'WCD' || upper(substring(hash, 1, 16)) AS qid,
         |  CAST(0 AS BIGINT) AS minted_second_run
         |FROM h ORDER BY hash""".stripMargin) { (s, dir) =>
      import graft.wcd.HashIndex
      val incoming = refs(s, dir).filter(col("md5hash").isNotNull)
        .select(col("md5hash").as("hash"))
      val (minted1, _) = HashIndex.merge(HashIndex.empty(s), incoming, "reference")
      val index1 = HashIndex.empty(s).unionByName(minted1)
      val (minted2, resolved2) = HashIndex.merge(index1, incoming, "reference")
      // the second-run mint count rides the SAME lazy plan as the resolve:
      // a 1-row aggregate cross-joined (Catalyst broadcasts it), so the
      // whole query is one job with no driver-side action in the plan path
      resolved2.crossJoin(
          minted2.agg(count(lit(1)).as("minted_second_run")))
        .orderBy(col("hash"))
    },

    // --- incremental delta gate: previous run indexed docs with
    // doc_id%3=0; meanwhile docs with doc_id%7=0 were edited (text+'x').
    // changedPages must emit exactly the new (%3≠0) and edited (%7=0)
    // docs, with the hash the next run's table will record.
    QueryDef.sql(
      "c12_incremental_delta",
      """SELECT doc_id,
        |  md5(CASE WHEN doc_id % 7 = 0 THEN text || 'x' ELSE text END)
        |    AS page_content_hash
        |FROM documents
        |WHERE doc_id % 3 <> 0 OR doc_id % 7 = 0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val current = docs.select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit("x")))
          .otherwise(col("text")).as("text"))
      val prev = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), md5(col("text")).as("page_content_hash"))
      Extract.changedPages(current, "doc_id", col("text"), prev)
        .select(col("doc_id"), col("page_content_hash"))
        .orderBy(col("doc_id"))
    },

    // --- Q5: point item fetch (crud/read.py:148-153) — all claims of one
    // item, here the page item of doc 42 (42%3=0 ⇒ a DOI-hashed cite web
    // ⇒ one CITATIONS edge; 42%6=0 ⇒ one un-hashable ref ⇒ one
    // STRING_CITATIONS). Scalar claim columns only: the oracle recomputes
    // every row from the generation formula.
    QueryDef.sql(
      "c11_fetch_item",
      """WITH ids AS (SELECT
        |    md5('WikiCitations'||'en'||CAST(doc_id AS VARCHAR)) AS item_id,
        |    md5('WikiCitations'||'10.1234/x'||CAST(doc_id AS VARCHAR)) AS ref_hash,
        |    doc_id FROM documents WHERE doc_id = 42)
        |SELECT item_id, 'wikipedia_page' AS item_type, 'CITATIONS' AS property,
        |  'item' AS datatype, NULL::VARCHAR AS value_str,
        |  NULL::TIMESTAMP AS value_time, ref_hash AS value_qid FROM ids
        |UNION ALL SELECT item_id, 'wikipedia_page', 'HASH', 'external_id',
        |  item_id, NULL, NULL FROM ids
        |UNION ALL SELECT item_id, 'wikipedia_page', 'INSTANCE_OF', 'item',
        |  NULL, NULL, 'WIKIPEDIA_PAGE' FROM ids
        |UNION ALL SELECT item_id, 'wikipedia_page', 'LAST_UPDATE', 'time',
        |  NULL, TIMESTAMP '2026-08-12 00:00:00', NULL FROM ids
        |UNION ALL SELECT item_id, 'wikipedia_page', 'MEDIAWIKI_PAGE_ID', 'external_id',
        |  CAST(doc_id AS VARCHAR), NULL, NULL FROM ids
        |UNION ALL SELECT item_id, 'wikipedia_page', 'PUBLISHED_IN', 'item',
        |  NULL, NULL, 'ENGLISH_WIKIPEDIA' FROM ids
        |UNION ALL SELECT item_id, 'wikipedia_page', 'STRING_CITATIONS', 'string',
        |  'cite web', NULL, NULL FROM ids
        |UNION ALL SELECT item_id, 'wikipedia_page', 'TITLE', 'string',
        |  'Doc '||CAST(doc_id AS VARCHAR), NULL, NULL FROM ids
        |UNION ALL SELECT item_id, 'wikipedia_page', 'URL', 'url',
        |  'https://en.wikipedia.org/?curid='||CAST(doc_id AS VARCHAR), NULL, NULL FROM ids
        |ORDER BY property""".stripMargin) { (s, dir) =>
      val itemId = java.security.MessageDigest.getInstance("MD5")
        .digest("WikiCitationsen42".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      ReadQueries.fetchItem(claimsTable(s, dir), itemId)
        .select(col("item_id"), col("item_type"), col("property"), col("datatype"),
          col("value_str"), col("value_time"), col("value_qid"))
        .orderBy(col("property"))
    },

    // --- author analytics through the persons arrays (F18/F19 as a
    // registered analytic, not just claims plumbing): citation counts,
    // page reach and domain spread per author surname. Per generation
    // formula each page's one authored ref carries last=L{m13},
    // first=F{m11}, fld=ex{m7}.com.
    QueryDef.sql(
      "c13_author_citations",
      s"""$D
         |SELECT 'L' || CAST(m13 AS VARCHAR) AS author_last,
         |  MIN('F' || CAST(m11 AS VARCHAR) || ' L' || CAST(m13 AS VARCHAR)) AS sample_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_refs,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_pages,
         |  CAST(COUNT(DISTINCT m7) AS BIGINT) AS n_domains
         |FROM d GROUP BY 1 ORDER BY author_last""".stripMargin) { (s, dir) =>
      // unnumbered last=/first= params normalize to last1/first1 — the
      // roleless shape (reference: persons_without_role), same struct
      refs(s, dir)
        .select(col("page_id"), col("first_level_domain_of_url").as("fld"),
          explode(col("persons_without_role")).as("p"))
        .select(col("page_id"), col("fld"),
          col("p.surname").as("author_last"), col("p.full_name").as("full_name"))
        .groupBy(col("author_last"))
        .agg(min(col("full_name")).as("sample_name"),
          count(lit(1)).as("n_refs"),
          countDistinct(col("page_id")).as("n_pages"),
          countDistinct(col("fld")).as("n_domains"))
        .orderBy(col("author_last"))
    },

    // --- F20 on the claims side: the item label every minted reference
    // item carries — `"{title} | {md5[:7]}"` (crud/__init__.py:200, via
    // RefExprs.labelWithHash / textwrap.shorten semantics). One label
    // per HASHED reference (the H5-deduped cite web + the m4=0 book);
    // the oracle rebuilds title and hash from the generation formula.
    QueryDef.sql(
      "c14_item_labels",
      s"""$D
         |SELECT doc_id AS page_id,
         |  'Doc ' || CAST(doc_id AS VARCHAR) || ' | ' ||
         |  substring(md5('WikiCitations' || CASE WHEN m3 = 0
         |    THEN '10.1234/x' || CAST(doc_id AS VARCHAR)
         |    ELSE 'https://ex' || CAST(m7 AS VARCHAR) || '.com/a/' || CAST(doc_id AS VARCHAR)
         |    END), 1, 7) AS label
         |FROM d
         |UNION ALL
         |SELECT doc_id,
         |  'B' || CAST(doc_id AS VARCHAR) || ' | ' ||
         |  substring(md5('WikiCitations' || '978' || lpad(CAST(doc_id AS VARCHAR), 10, '0')), 1, 7)
         |FROM d WHERE m4 = 0
         |ORDER BY page_id, label""".stripMargin) { (s, dir) =>
      refs(s, dir)
        .filter(col("md5hash").isNotNull)
        .select(col("page_id"),
          graft.expr.RefExprs.labelWithHash(col("title"), col("md5hash")).as("label"))
        .orderBy(col("page_id"), col("label"))
    },

    // --- the flagship --import-title lifecycle as ONE composed plan
    // (SURVEY §3.1, wikipedia_page.py:601-634, src/__init__.py:197-208):
    // pages → F1 parse → F3/F4/F5 strict load → enrichment → F18 persons
    // → H1 hash → H5 in-page dedup → C1–C9 claims projection → A5/H6/H8
    // hash-index MERGE (run twice: the second mints nothing) → Q1/Q2
    // statistics readback. Unlike c1–c14, which each read the LANDED
    // refs/claims tables, this query runs the whole chain from raw
    // wikitext as ONE registered query — no user-level landing between
    // stages (the c-query analog of t15_curation_pipeline). One honest
    // caveat: Claims.allClaims detects the un-landed 3-branch refs
    // input and cache-materializes it once (its documented planning
    // guard, announced on stderr) — an ENGINE-internal stage boundary,
    // exactly the materialization a production import would pay by
    // landing refs; the composition still needs no seam from the
    // caller. The oracle recomputes every output row of the chain from
    // the corpus generation formula.
    QueryDef.sql(
      "c15_import_e2e",
      """WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(*) FILTER (doc_id % 3 = 0) AS BIGINT) AS n3,
        |    CAST(COUNT(*) FILTER (doc_id % 4 = 0) AS BIGINT) AS n4,
        |    CAST(COUNT(*) FILTER (doc_id % 6 = 0) AS BIGINT) AS n6,
        |    CAST(COUNT(DISTINCT doc_id % 7) AS BIGINT) AS nfld
        |  FROM documents)
        |SELECT * FROM (
        |SELECT 'CITATIONS' AS metric, n AS n_items, n + n4 AS n_claims FROM c
        |UNION ALL SELECT 'DOI', n3, n3 FROM c
        |UNION ALL SELECT 'FIRST_LEVEL_DOMAIN_STRING', nfld, nfld FROM c
        |UNION ALL SELECT 'FULL_NAME_STRING', n, n FROM c
        |UNION ALL SELECT 'HASH', n + n4 + nfld + n, n + n4 + nfld + n FROM c
        |UNION ALL SELECT 'INSTANCE_OF', n + n4 + nfld + n, n + n4 + nfld + n FROM c
        |UNION ALL SELECT 'ISBN_13', n4, n4 FROM c
        |UNION ALL SELECT 'LAST_UPDATE', n, n FROM c
        |UNION ALL SELECT 'MEDIAWIKI_PAGE_ID', n, n FROM c
        |UNION ALL SELECT 'PUBLISHED_IN', n, n FROM c
        |UNION ALL SELECT 'RETRIEVED_DATE', n + n4, n + n4 FROM c
        |UNION ALL SELECT 'SOURCE_WIKIPEDIA', n + n4 + nfld, n + n4 + nfld FROM c
        |UNION ALL SELECT 'STRING_CITATIONS', n6, n6 FROM c
        |UNION ALL SELECT 'TEMPLATE_NAME', n + n4, n + n4 FROM c
        |UNION ALL SELECT 'TITLE', n + n4 + n, n + n4 + n FROM c
        |UNION ALL SELECT 'URL', n + n, n + n FROM c
        |UNION ALL SELECT 'WEBSITE', n, n FROM c
        |UNION ALL SELECT 'WEBSITE_STRING', n, n FROM c
        |UNION ALL SELECT 'CLASS:WEBSITE_ITEM', nfld, nfld FROM c
        |UNION ALL SELECT 'CLASS:WIKIPEDIA_PAGE', n, n FROM c
        |UNION ALL SELECT 'CLASS:WIKIPEDIA_REFERENCE', n + n4, n + n4 FROM c
        |UNION ALL SELECT 'MINTED_FIRST_RUN', n + n4, n + n4 FROM c
        |UNION ALL SELECT 'MINTED_SECOND_RUN', 0, 0 FROM c
        |) ORDER BY metric""".stripMargin) { (s, dir) =>
      import graft.wcd.HashIndex
      val p = pages(s, dir)
      // the FULL pipeline in-plan: parse + strict load + enrichment +
      // persons + hashes + in-page dedup — deliberately NOT the landed
      // refs table; same 39-column projection the landing applies, so
      // the parse runs narrow here too
      val refsAll = Extract.references(p).select(RefsNeeded.map(col): _*)
      // r16 (guide §3.3 — huge unions make planning itself the
      // bottleneck; materialize to truncate the plan): claims feeds BOTH
      // propertyStatistics and classCounts below, so in one lazy plan
      // the 3-branch claim projection executed twice and the registered
      // plan was a 252 KB / 48-Exchange union. localCheckpoint runs the
      // union once (eagerly, inside the timed region — Bench sweeps the
      // blocks after every run, so each run still computes from the
      // parquet inputs) and the consumers read the materialized rows.
      val claims = Claims.allClaims(p, refsAll,
        to_timestamp(lit("2026-08-12 00:00:00"))).localCheckpoint()
      val incoming = refsAll.filter(col("md5hash").isNotNull)
        .select(col("md5hash").as("hash"))
      val (minted1, _) = HashIndex.merge(HashIndex.empty(s), incoming, "reference")
      // minted1 feeds both the second merge's index and its own
      // MINTED_FIRST_RUN count — same §3.3 move as claims above
      val minted1M = minted1.localCheckpoint()
      val index1 = HashIndex.empty(s).unionByName(minted1M)
      val (minted2, _) = HashIndex.merge(index1, incoming, "reference")
      val propStats = ReadQueries.propertyStatistics(claims)
        .select(col("property").as("metric"), col("n_items"), col("n_claims"))
      val classStats = ReadQueries.classCounts(claims)
        .select(concat(lit("CLASS:"), col("item_class")).as("metric"),
          col("n_items"), col("n_items").as("n_claims"))
      def mintRow(name: String, m: DataFrame) = m
        .agg(count(lit(1)).as("n"))
        .select(lit(name).as("metric"), col("n").as("n_items"),
          col("n").as("n_claims"))
      propStats
        .unionByName(classStats)
        .unionByName(mintRow("MINTED_FIRST_RUN", minted1M))
        .unionByName(mintRow("MINTED_SECOND_RUN", minted2))
        .orderBy(col("metric"))
    },
  )
}
