package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StableHash

/** Embedding similarity search over (vec_id: long,
  * embedding: array<float>) — brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH-bucketed variant as the path
  * that survives 10^9 vectors. Dot products run through the custom
  * codegen'd Catalyst expression graft.functions.FloatDotProduct (a
  * fused whole-stage-codegen loop; the `aggregate(zip_with)`
  * composition it replaces is CodegenFallback and re-evaluates its
  * interpreted lambda per element).
  *
  * Numeric determinism: elements are widened to double BEFORE the
  * multiply and accumulated in a strict left fold, so any engine that
  * evaluates the same left-fold (e.g. a SQL list_reduce) produces the
  * bit-identical double — which is what lets the ANN queries carry an
  * independent SQL oracle.
  */
object Similarity {

  /** dot(a, b) over two float-array columns (left-fold, double math). */
  def dot(a: Column, b: Column): Column =
    graft.functions.FloatDotProduct.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Decimals the ranking cosine is rounded to: ranking on
    * round(cos, 6) with a vec-id tie-break makes the top-k order
    * reproducible across engines — two engines computing cos with a
    * different summation order differ by ~1e-15, which only flips a
    * rank when the true value sits within 1e-15 of a 0.5e-6 rounding
    * boundary. Raw-double ordering would flip on ANY tie-adjacent
    * pair. */
  val RankDecimals = 6

  /** Exact brute-force cosine top-k neighbors for each query vector:
    * queries × corpus cross join, windowed rank on the rounded cosine
    * (see RankDecimals). Correctness baseline; quadratic — only for
    * small query sets (broadcast the queries). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_emb"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(cosine(col("q_emb"), col("nbr_emb")), RankDecimals).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic literal hyperplanes for sign-random-projection:
    * planes(p)(i) ∈ [−1, 1) derived from splitmix64 of (table, p, i) at
    * PLAN BUILD time and embedded as literals — zero per-row hashing
    * (the bucket is `nPlanes` fused multiply-add folds) and exactly
    * reproducible in any engine that parses decimal double literals
    * (shortest-roundtrip rendering on our side, correctly-rounded parse
    * on theirs). */
  def srpPlanes(dim: Int, nPlanes: Int, table: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, i) =>
      val v = StableHash.mix64(table.toLong * 1000003L + p.toLong * 100003L + i)
      ((v >>> 11) * (1.0 / (1L << 53))) * 2.0 - 1.0
    }

  /** SRP bucket key from literal planes: sign bit of each plane's
    * projection, packed to a long. Each per-plane sum is a
    * FloatDotProduct against the plane as a LITERAL array — a strict
    * left-fold in the same order as a SQL list_reduce (bucket keys are
    * engine-reproducible), in one codegen'd loop per plane. (A fully
    * unrolled element_at chain was tried first: it blows janino's
    * 64 KB method limit and drops the whole projection to interpreted
    * mode.) */
  def srpBucketLit(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (w, p) =>
      // ONE ArrayType literal per plane, not a CreateArray of `dim`
      // scalar literals: the per-plane value is identical (constant
      // folding collapses the CreateArray form to this literal
      // eventually), but the analyzer/optimizer walk the unfolded tree
      // several times first — with tables×planes×dim = 2048 literal
      // nodes per projection that planning overhead was the dominant
      // cost of the LSH queries (measured: q_ann_lsh 6.5 s cold /
      // 1.5 s warm at sf0.1 with 6 single-task stages — all plan time).
      val warr = typedlit(w.toIndexedSeq)
      when(dot(emb, warr) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate NN: bucket corpus and queries by `tables` independent
    * SRP keys, join within buckets, exact-rank the union of candidates.
    * Shuffle is keyed by (table, bucket) — bucket population is
    * balanced by construction (uniform sign bits), the scale-out path
    * for ANN at 10^9 vectors. Recall grows with `tables`, cost with
    * bucket width (2^-nPlanes of the corpus per bucket). `dim` is the
    * (fixed) embedding dimensionality — plane literals are generated
    * from it at plan time.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nPlanes: Int = 8, tables: Int = 4): DataFrame = {
    val c = bucketed(corpus, dim, nPlanes, tables, "nbr_id", "nbr_emb")
    val q = bucketed(queries, dim, nPlanes, tables, "query_id", "q_emb")
    val cands = c.join(q, Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        round(cosine(col("q_emb"), col("nbr_emb")), RankDecimals).as("cos"))
      .dropDuplicates("query_id", "nbr_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Fail-fast dimensionality gate: `FloatDotProduct` returns null on
    * an array-length mismatch, `when(null >= 0)` falls through to 0,
    * and every SRP bit silently becomes 0 — all vectors collapse into
    * one bucket and the candidate join degenerates to a quadratic
    * cross-join with no error. Raise instead, at the first mismatched
    * row. */
  private def checkedDim(emb: Column, dim: Int): Column =
    when(size(emb) === dim, emb).otherwise(raise_error(concat(
      lit(s"graft.Similarity: embedding dimensionality mismatch — expected $dim, got "),
      size(emb).cast("string"))))

  /** One pass over `df`: every row exploded into its `tables`
    * (tbl, bkt) keys, all bucket bits computed in a single projection
    * — no per-table re-scan. */
  private def bucketed(df: DataFrame, dim: Int, nPlanes: Int, tables: Int,
                       idName: String, embName: String): DataFrame = {
    val emb = checkedDim(col("embedding"), dim)
    df.select(col("vec_id").as(idName), col("embedding").as(embName),
        explode(array((0 until tables).map(t => struct(
          lit(t).as("tbl"),
          srpBucketLit(emb, srpPlanes(dim, nPlanes, t)).as("bkt"))): _*)).as("tb"))
      .select(col(idName), col(embName), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
  }

  /** Embedding-cosine near-duplicate pairs (dedup use): all pairs with
    * cosine ≥ threshold among LSH candidates. The bucketed frame is
    * persisted before the self-join so projections compute once, and
    * released once the (materialized) result exists — release the
    * returned frame itself with `graft.graph.Engine.release(result)`. */
  def cosineNearDup(vectors: DataFrame, threshold: Double, dim: Int,
                    nPlanes: Int = 8, tables: Int = 4): DataFrame = {
    val bk = bucketed(vectors, dim, nPlanes, tables, "id", "emb")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = bk.select(col("id").as("id_a"), col("emb").as("emb_a"), col("tbl"), col("bkt"))
    val r = bk.select(col("id").as("id_b"), col("emb").as("emb_b"), col("tbl"), col("bkt"))
    val out = l.join(r, Seq("tbl", "bkt"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .localCheckpoint(true)
    bk.unpersist(false)
    out
  }
}
