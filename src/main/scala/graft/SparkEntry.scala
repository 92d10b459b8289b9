package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph._
import graft.algos._
import graft.ops._

/** Driver contract — one `queries` entry per operator family from
  * SURVEY.md §2 (+ the training-data ops), each over the driver's
  * parquet tables under `sfDir`; `oracleSql` gives the DuckDB-
  * equivalent SQL for the SQL-expressible subset. Graph queries run on
  * a deterministic derived edge table (mod-bucketed lineitem keys) so
  * Spark and DuckDB see the identical graph.
  */
object SparkEntry {

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Derived edge table: src = l_orderkey mod 1000, dst = l_partkey
    * mod 1000, one row per lineitem (parallel edges kept; graph algos
    * shape as needed). Same expression in the DuckDB oracles. */
  private def edges(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "lineitem").select(
      (col("l_orderkey") % 1000).as("src"),
      (col("l_partkey") % 1000).as("dst"))

  private val edgesSql =
    "SELECT l_orderkey % 1000 AS src, l_partkey % 1000 AS dst FROM lineitem"

  private def parts(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Flagship: PageRank over the repo-link pipeline at tiny scale —
    * corpus → edge extraction (sha256 invariant) → 10 supersteps →
    * top-ranked repos. Exercises ingest + engine end-to-end. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.ingest._
    val corpus = RepoCorpus.generate(spark, RepoCorpus.Config(nRepos = 300, filesPerRepo = 3))
    val (e, dict) = EdgeExtraction.ingest(EdgeExtraction.withSha(corpus))
    val adj = Adjacency.build(e, parts(spark))
    val pr = PageRank.run(adj, maxIters = 10)
    pr.state.join(dict, "vid").select(col("repo"), col("rank"))
      .orderBy(desc("rank"), asc("repo")).limit(20)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans/aggregations over the driver tables (S-/A-family)
    "q_checksum" -> ((s, d) => read(s, d, "lineitem")
      .agg(round(sum(col("l_quantity")), 2).as("checksum"),
        count(lit(1)).as("n_rows"))),
    "q_stats" -> ((s, d) => read(s, d, "orders")
      .agg(round(avg(col("o_totalprice")), 4).as("avg_price"),
        round(stddev(col("o_totalprice")), 4).as("sd_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        count(lit(1)).as("n_rows"))),
    "q_topk" -> ((s, d) => read(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(10)),
    "q_events_hourly" -> ((s, d) => read(s, d, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))),
    "q_mode_degree" -> ((s, d) => Degree.out(edges(s, d))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_vertices"))
      .orderBy(desc("n_vertices"), asc("degree")).limit(1)),

    // ---- graph: degree / filtering / classification (F-family)
    "q_degree_out" -> ((s, d) => Degree.out(edges(s, d))),
    "q_degree_in" -> ((s, d) => Degree.in(edges(s, d))),
    "q_vertex_classes" -> ((s, d) => {
      // reference classify_vertices (matrix.hpp:1125-1282): regular =
      // in∩out, source = out-only, sink = in-only
      val e = edges(s, d)
      val outV = e.select(col("src").as("vid")).distinct()
      val inV = e.select(col("dst").as("vid")).distinct()
      val regular = outV.join(inV, Seq("vid"), "left_semi").count()
      val source = outV.join(inV, Seq("vid"), "left_anti").count()
      val sink = inV.join(outV, Seq("vid"), "left_anti").count()
      val sp = s; import sp.implicits._
      Seq((regular, source, sink)).toDF("n_regular", "n_source", "n_sink")
    }),

    // ---- graph algorithms (J-/A-family; exact parity vs reference semantics)
    "q_triangles" -> ((s, d) => {
      val n = TriangleCount.count(edges(s, d), parts(s))
      val sp = s; import sp.implicits._
      Seq(n).toDF("n_triangles")
    }),
    "q_pagerank_top" -> ((s, d) => {
      val adj = Adjacency.build(edges(s, d), parts(s))
      PageRank.run(adj, maxIters = 20).state
        .select(col("vid"), round(col("rank"), 6).as("rank"))
        .orderBy(desc("rank"), asc("vid")).limit(25)
    }),
    "q_cc_sizes" -> ((s, d) =>
      ConnectedComponents.sizes(ConnectedComponents.run(edges(s, d), parts(s)).state)
        .orderBy(asc("label"))),
    "q_lpa" -> ((s, d) => {
      val r = LabelPropagation.run(edges(s, d), parts(s), maxIters = 5)
      r.state.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("label")).limit(20)
    }),
    "q_bfs_depths" -> ((s, d) => {
      val r = Traversal.bfs(edges(s, d), root = 0L, parts(s))
      r.state.groupBy(col("hops")).agg(count(lit(1)).as("n")).orderBy(asc("hops"))
    }),
    "q_sssp" -> ((s, d) => {
      val r = Traversal.sssp(edges(s, d), root = 0L, parts(s))
      r.state.filter(col("dist").isNotNull)
        .groupBy(col("dist")).agg(count(lit(1)).as("n")).orderBy(asc("dist"))
    }),

    // ---- training-data ops: dedup / text / similarity
    "q_dedup_exact" -> ((s, d) => Dedup.exact(read(s, d, "documents"), "doc_id", "text")),
    "q_token_counts" -> ((s, d) => read(s, d, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_ws_tokens"))),
    "q_quality" -> ((s, d) => TextAnalysis.withQuality(read(s, d, "documents"))
      .select(col("doc_id"), col("n_words"),
        round(col("punct_ratio"), 4).as("punct_ratio"),
        round(col("quality_score"), 4).as("quality_score"))),
    "q_lang_id" -> ((s, d) => TextAnalysis.withLangId(read(s, d, "documents"))
      .groupBy(col("lang_id")).agg(count(lit(1)).as("n"))),
    "q_minhash_dups" -> ((s, d) =>
      Dedup.minhashCandidates(read(s, d, "documents"), threshold = 0.5)),
    "q_dedup_clusters" -> ((s, d) => {
      // full near-dup pipeline: minhash LSH candidates → CC clusters →
      // canonical representative per document
      val docs = read(s, d, "documents")
      val cands = Dedup.minhashCandidates(docs, threshold = 0.5)
      docs.select(col("doc_id"))
        .join(Dedup.duplicateClusters(cands, parts(s)), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
    }),
    "q_ngram_jaccard" -> ((s, d) => {
      // exact 3-gram Jaccard over a deterministic pair set (each doc
      // with its successor) — the LSH-candidate verification operator
      val docs = read(s, d, "documents")
      val pairs = docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      Dedup.ngramJaccard(pairs, docs)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),
    "q_simhash" -> ((s, d) => Dedup.simhash(read(s, d, "documents"))),
    "q_fingerprints" -> ((s, d) =>
      TextAnalysis.withFingerprint(read(s, d, "documents")).select("doc_id", "fingerprint")),
    "q_ann_topk" -> ((s, d) => {
      val em = read(s, d, "embeddings")
      Similarity.bruteForceTopK(em, em.limit(16), k = 5)
        .select(col("query_id"), col("nbr_id"), col("rank"))
    }),
    "q_cosine_neardup" -> ((s, d) => {
      // random embeddings contain no true near-dups, so plant some:
      // shifted-id near-copies (tiny deterministic perturbation) must
      // come back out of the LSH-bucketed pair search
      val em = read(s, d, "embeddings")
      val planted = em.limit(8).select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.001f)).as("embedding"))
      Similarity.cosineNearDup(em.select("vec_id", "embedding").unionAll(planted),
        threshold = 0.99)
    }))

  /** Undirected closure of the derived edge table as a DuckDB CTE
    * body; `selfLoops=false` drops src==dst first when asked. */
  private def undirectedSql(dropSelfLoops: Boolean): String = {
    val w = if (dropSelfLoops) " WHERE src<>dst" else ""
    s"ue AS (SELECT DISTINCT a,b FROM (SELECT src AS a,dst AS b FROM raw$w " +
      s"UNION ALL SELECT dst,src FROM raw$w))"
  }

  /** CC oracle: min-label over the undirected closure via recursive
    * reachability pairs (terminates — UNION dedups (v,m) pairs, both
    * drawn from the finite vertex set). */
  private def ccSizesSql: String =
    s"WITH RECURSIVE raw AS ($edgesSql), ${undirectedSql(dropSelfLoops = false)}, " +
      "v AS (SELECT DISTINCT a AS vid FROM ue), " +
      "r AS (SELECT vid AS v, vid AS m FROM v " +
      "UNION SELECT ue.b, r.m FROM r JOIN ue ON ue.a=r.v) " +
      "SELECT label, COUNT(*) AS size FROM " +
      "(SELECT v, MIN(m) AS label FROM r GROUP BY v) GROUP BY label"

  /** Shortest-hop recursion bounded at 100 — these mod-1000 graphs are
    * dense (≥6 edges/vertex at the smallest sf) so the true diameter
    * is single-digit; 100 only caps the cycle-walk frontier. */
  private val HopBound = 100

  private def bfsDepthsSql: String =
    s"WITH RECURSIVE raw AS ($edgesSql), ${undirectedSql(dropSelfLoops = true)}, " +
      "v AS (SELECT DISTINCT a AS vid FROM ue), " +
      s"r AS (SELECT vid AS v, 0 AS d FROM v WHERE vid=0 " +
      s"UNION SELECT ue.b, r.d+1 FROM r JOIN ue ON ue.a=r.v WHERE r.d < $HopBound), " +
      "h AS (SELECT v, MIN(d) AS hops FROM r GROUP BY v) " +
      "SELECT h.hops AS hops, COUNT(*) AS n FROM v LEFT JOIN h ON v.vid=h.v GROUP BY h.hops"

  private def ssspSql: String =
    s"WITH RECURSIVE raw AS ($edgesSql), " +
      "e AS (SELECT DISTINCT src,dst FROM raw), " +
      "v AS (SELECT DISTINCT src AS vid FROM raw UNION SELECT DISTINCT dst FROM raw), " +
      s"r AS (SELECT vid AS v, 0 AS d FROM v WHERE vid=0 " +
      s"UNION SELECT e.dst, r.d+1 FROM r JOIN e ON e.src=r.v WHERE r.d < $HopBound) " +
      "SELECT CAST(dist AS DOUBLE) AS dist, COUNT(*) AS n FROM " +
      "(SELECT v, MIN(d) AS dist FROM r GROUP BY v) GROUP BY 1"

  /** Frequency-LPA unrolled to exactly `iters` synchronous steps —
    * identical tie-break to LabelPropagation (max count, then min
    * label). A converged run is a fixpoint, so running the full
    * unrolled budget matches Spark's early-stop. */
  private def lpaSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"w$i AS (SELECT ue.b AS vid, p.label AS lab, COUNT(*) AS c " +
        s"FROM ue JOIN l${i - 1} p ON p.vid=ue.a GROUP BY 1,2 " +
        s"QUALIFY ROW_NUMBER() OVER (PARTITION BY ue.b ORDER BY COUNT(*) DESC, p.label ASC) = 1), " +
        s"l$i AS (SELECT v.vid, COALESCE(w$i.lab, p.label) AS label FROM v " +
        s"JOIN l${i - 1} p ON p.vid=v.vid LEFT JOIN w$i ON w$i.vid=v.vid)"
    }.mkString(", ")
    s"WITH raw AS ($edgesSql), ${undirectedSql(dropSelfLoops = true)}, " +
      "v AS (SELECT DISTINCT a AS vid FROM ue), " +
      s"l0 AS (SELECT vid, vid AS label FROM v), $steps " +
      s"SELECT label, COUNT(*) AS n FROM l$iters GROUP BY label ORDER BY n DESC, label LIMIT 20"
  }

  /** Reference-semantics PageRank (rank₀=α; rank←α+(1−α)·Σ rank/deg;
    * no dangling redistribution; parallel edges each contribute)
    * unrolled to exactly `iters` steps — the fixed-budget mode never
    * stops early, so the unrolled SQL is step-for-step identical. */
  private def pagerankSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"r$i AS (SELECT v.vid, 0.15 + 0.85*COALESCE(s.y, 0) AS rank FROM v LEFT JOIN " +
        s"(SELECT e.dst AS vid, SUM(p.rank/deg.d) AS y FROM e JOIN r${i - 1} p ON p.vid=e.src " +
        s"JOIN deg ON deg.vid=e.src GROUP BY e.dst) s ON s.vid=v.vid)"
    }.mkString(", ")
    s"WITH e AS ($edgesSql), " +
      "v AS (SELECT DISTINCT src AS vid FROM e UNION SELECT DISTINCT dst FROM e), " +
      "deg AS (SELECT src AS vid, COUNT(*) AS d FROM e GROUP BY src), " +
      s"r0 AS (SELECT vid, CAST(0.15 AS DOUBLE) AS rank FROM v), $steps " +
      s"SELECT vid, ROUND(rank, 6) AS rank FROM r$iters " +
      "ORDER BY ROUND(rank,6) DESC, vid LIMIT 25"
  }

  /** DuckDB array literals of the embedded stopword lists (kept in
    * lockstep with graft.ops.Stopwords). */
  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ",", "]")

  /** q_quality oracle: replicates TextAnalysis.qualityColumns
    * term-for-term. `[!-/:-@\[-`{-~]` is ASCII \p{Punct} spelled as
    * RE2 ranges (the documents are pure ASCII). */
  private def qualitySql: String = {
    val en = sqlList(graft.ops.Stopwords.enWords)
    "WITH base AS (SELECT doc_id, text, LENGTH(text) AS n_chars, " +
      "list_filter(regexp_split_to_array(LOWER(text), '\\W+'), w -> LENGTH(w)>0) AS words, " +
      "LENGTH(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS punct FROM documents), " +
      "b2 AS (SELECT doc_id, n_chars, words, punct, LENGTH(words) AS n_words, " +
      "list_distinct(words) AS dwords, " +
      "CASE WHEN LENGTH(words)>0 THEN CAST(list_sum(list_transform(words, w -> LENGTH(w))) AS DOUBLE)/LENGTH(words) ELSE 0.0 END AS mean_word_len FROM base), " +
      "b3 AS (SELECT doc_id, n_words, " +
      "CASE WHEN n_chars>0 THEN CAST(punct AS DOUBLE)/n_chars ELSE 1.0 END AS punct_ratio, " +
      s"CASE WHEN LENGTH(dwords)>0 THEN CAST(LENGTH(list_intersect(dwords, $en)) AS DOUBLE)/LENGTH(dwords) ELSE 0.0 END AS stop_ratio, " +
      "CASE WHEN n_words>=5 AND n_chars>=20 THEN 1.0 ELSE 0.0 END AS length_ok, mean_word_len FROM b2) " +
      "SELECT doc_id, n_words, ROUND(punct_ratio,4) AS punct_ratio, " +
      "ROUND(length_ok * (1.0 - LEAST(punct_ratio*4, 1.0)) * LEAST(stop_ratio*5 + 0.2, 1.0) * " +
      "(CASE WHEN mean_word_len BETWEEN 2.5 AND 12.0 THEN 1.0 ELSE 0.3 END), 4) AS quality_score FROM b3"
  }

  /** q_lang_id oracle: same stopword-hit argmax; the CASE order
    * (de, en, es, fr) reproduces the lexicographic tie-break. */
  private def langIdSql: String = {
    val ls = graft.ops.Stopwords.lists
    val scoreCols = ls.map { case (k, ws) =>
      s"CAST(LENGTH(list_intersect(dwords, ${sqlList(ws)})) AS DOUBLE)/${ws.size} AS s_$k"
    }.mkString(", ")
    val g = ls.map(l => s"s_${l._1}").mkString("GREATEST(", ",", ")")
    val cases = ls.init.map { case (k, _) => s"WHEN s_$k = $g THEN '$k'" }.mkString(" ")
    "WITH base AS (SELECT doc_id, " +
      "list_distinct(list_filter(regexp_split_to_array(LOWER(text), '\\W+'), w -> LENGTH(w)>0)) AS dwords FROM documents), " +
      s"sc AS (SELECT doc_id, $scoreCols FROM base), " +
      s"best AS (SELECT doc_id, CASE WHEN $g <= 0 THEN 'und' $cases ELSE '${ls.last._1}' END AS lang_id FROM sc) " +
      "SELECT lang_id, COUNT(*) AS n FROM best GROUP BY lang_id"
  }

  /** q_ngram_jaccard oracle: replicates Dedup.shingles exactly —
    * tokens = `\W+` split of lowercase text WITHOUT empty-token
    * filtering, 3-gram windows joined by ' ', distinct; empty shingle
    * set when fewer than 3 tokens. */
  private def ngramJaccardSql: String =
    "WITH toks AS (SELECT doc_id, regexp_split_to_array(LOWER(text), '\\W+') AS t FROM documents), " +
      "sh AS (SELECT doc_id, CASE WHEN LENGTH(t) >= 3 THEN " +
      "list_distinct(list_transform(range(0, LENGTH(t)-2), i -> array_to_string(list_slice(t, i+1, i+3), ' '))) " +
      "ELSE [] END AS s FROM toks), " +
      "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb " +
      "FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1) " +
      "SELECT id_a, id_b, ROUND(CASE WHEN LENGTH(list_distinct(list_concat(sa, sb))) = 0 THEN 0.0 " +
      "ELSE CAST(LENGTH(list_intersect(sa, sb)) AS DOUBLE) / LENGTH(list_distinct(list_concat(sa, sb))) END, 6) AS jaccard " +
      "FROM pairs"

  def oracleSql: Map[String, String] = Map(
    "q_ngram_jaccard" -> ngramJaccardSql,
    "q_quality" -> qualitySql,
    "q_lang_id" -> langIdSql,
    "q_cc_sizes" -> ccSizesSql,
    "q_bfs_depths" -> bfsDepthsSql,
    "q_sssp" -> ssspSql,
    "q_lpa" -> lpaSql(5),
    "q_pagerank_top" -> pagerankSql(20),
    "q_checksum" ->
      "SELECT ROUND(SUM(l_quantity), 2) AS checksum, COUNT(*) AS n_rows FROM lineitem",
    "q_stats" ->
      ("SELECT ROUND(AVG(o_totalprice), 4) AS avg_price, " +
        "ROUND(STDDEV_SAMP(o_totalprice), 4) AS sd_price, " +
        "ROUND(MAX(o_totalprice), 2) AS max_price, COUNT(*) AS n_rows FROM orders"),
    "q_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_events_hourly" ->
      ("SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n, " +
        "ROUND(SUM(value), 4) AS total FROM events GROUP BY 1, 2"),
    "q_mode_degree" ->
      (s"WITH e AS ($edgesSql), deg AS (SELECT src, COUNT(*) AS degree FROM e GROUP BY src) " +
        "SELECT degree, COUNT(*) AS n_vertices FROM deg GROUP BY degree " +
        "ORDER BY n_vertices DESC, degree LIMIT 1"),
    "q_degree_out" ->
      s"WITH e AS ($edgesSql) SELECT src AS vid, COUNT(*) AS degree FROM e GROUP BY src",
    "q_degree_in" ->
      s"WITH e AS ($edgesSql) SELECT dst AS vid, COUNT(*) AS degree FROM e GROUP BY dst",
    "q_vertex_classes" ->
      (s"WITH e AS ($edgesSql), o AS (SELECT DISTINCT src AS vid FROM e), " +
        "i AS (SELECT DISTINCT dst AS vid FROM e) " +
        "SELECT (SELECT COUNT(*) FROM o WHERE vid IN (SELECT vid FROM i)) AS n_regular, " +
        "(SELECT COUNT(*) FROM o WHERE vid NOT IN (SELECT vid FROM i)) AS n_source, " +
        "(SELECT COUNT(*) FROM i WHERE vid NOT IN (SELECT vid FROM o)) AS n_sink"),
    "q_triangles" ->
      (s"WITH raw AS ($edgesSql), e AS (SELECT DISTINCT LEAST(src, dst) AS a, " +
        "GREATEST(src, dst) AS b FROM raw WHERE src <> dst) " +
        "SELECT COUNT(*) AS n_triangles FROM e e1 " +
        "JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b"),
    "q_dedup_exact" ->
      ("SELECT sha256(text) AS sha, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count " +
        "FROM documents GROUP BY sha256(text)"),
    "q_token_counts" ->
      ("SELECT doc_id, LENGTH(list_filter(regexp_split_to_array(text, '\\s+'), " +
        "x -> LENGTH(x) > 0)) AS n_ws_tokens FROM documents"))
}
