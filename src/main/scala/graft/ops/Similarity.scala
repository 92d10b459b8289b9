package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over (vec_id: long,
  * embedding: array<float>) — brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH-bucketed variant as the path
  * that survives 10^9 vectors. Dot products use `aggregate(zip_with)`
  * higher-order expressions (codegen'd, no UDF).
  */
object Similarity {

  /** dot(a, b) over two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Exact brute-force cosine top-k neighbors for each query vector:
    * queries × corpus cross join, windowed rank. Correctness baseline;
    * quadratic — only for small query sets (broadcast the queries). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_emb"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        cosine(col("q_emb"), col("nbr_emb")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Sign-random-projection LSH bucket key: `nPlanes` hyperplane sign
    * bits packed to a long. Cosine-similar vectors collide whp. */
  def srpBucket(emb: Column, nPlanes: Int): Column =
    srpBucketSeeded(emb, nPlanes, lit(0))

  /** Approximate NN: bucket corpus and queries by `tables` independent
    * SRP keys, join within buckets, exact-rank the union of candidates.
    * Shuffle is keyed by (table, bucket) — bucket population is
    * balanced by construction (uniform sign bits), the scale-out path
    * for ANN at 10^9 vectors. Recall grows with `tables`, cost with
    * bucket width (2^-nPlanes of the corpus per bucket).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 8, tables: Int = 4): DataFrame = {
    // per-table bucket: include the table id in the plane seed so the
    // `tables` hash families are independent
    def bucketedT(df: DataFrame, idName: String, embName: String): DataFrame = {
      val t = explode(sequence(lit(0), lit(tables - 1)))
      val base = df.select(col("vec_id").as(idName), col("embedding").as(embName), t.as("tbl"))
      base.withColumn("bkt", srpBucketSeeded(col(embName), nPlanes, col("tbl")))
    }

    val c = bucketedT(corpus, "nbr_id", "nbr_emb")
    val q = bucketedT(queries, "query_id", "q_emb")
    val cands = c.join(q, Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        cosine(col("q_emb"), col("nbr_emb")).as("cos"))
      .dropDuplicates("query_id", "nbr_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** SRP bucket with a table-seed column mixed into every hyperplane —
    * the `tables` hash families stay independent. Bit packing unrolls
    * over the (static) plane count so everything stays a flat codegen
    * expression. */
  def srpBucketSeeded(emb: Column, nPlanes: Int, seed: Column): Column =
    (0 until nPlanes).map { p =>
      val s = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, i) => x * ((pmod(xxhash64(lit(p), i, seed), lit(2000000L)).cast("double") / 1000000.0) - 1.0)),
        lit(0.0d), (acc, v) => acc + v)
      when(s >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Embedding-cosine near-duplicate pairs (dedup use): all pairs with
    * cosine ≥ threshold among LSH candidates. */
  def cosineNearDup(vectors: DataFrame, threshold: Double,
                    nPlanes: Int = 8, tables: Int = 4): DataFrame = {
    def b(df: DataFrame, idName: String, embName: String): DataFrame = {
      val base = df.select(col("vec_id").as(idName), col("embedding").as(embName),
        explode(sequence(lit(0), lit(tables - 1))).as("tbl"))
      base.withColumn("bkt", srpBucketSeeded(col(embName), nPlanes, col("tbl")))
    }
    val l = b(vectors, "id_a", "emb_a")
    val r = b(vectors, "id_b", "emb_b")
    l.join(r, Seq("tbl", "bkt"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
