package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** CSR-like grouped adjacency, the Spark-native analog of the
  * reference's per-tile compressed columns (reference:
  * src/ds/compressed_column.hpp:63-1120). Instead of a 2D tile grid +
  * MPI all-to-all (src/mat/matrix.hpp:692-810), edges are grouped by
  * source vertex into `(src, salt, nbrs: array<struct<dst,w>>)` rows,
  * hash-co-partitioned by `src` and persisted, so every superstep's
  * gather join reuses the same layout with zero adjacency movement —
  * only the (V-sized) message table shuffles, or nothing at all when
  * the message side is broadcast.
  *
  * Skew (power-law out-degree — the moral successor of the reference's
  * `Matrix::balance` audit, matrix.hpp:562-687) is handled by explicit
  * SALTING: a vertex whose out-degree exceeds `chunk` is split into
  * `ceil(outdeg/chunk)` rows keyed by `pmod(xxhash64(dst), nsalts)`.
  * The superstep join key stays `src` (salt rows duplicate the message,
  * which is correct for gather), so no hot row ever materializes an
  * arbitrarily large neighbor array and explode work is balanced.
  */
final class Adjacency private[graph] (
    val out: DataFrame,        // (src: long, salt: int, nbrs) — see `weighted`
    val vertices: DataFrame,   // (vid: long) — distinct vertex universe (nnz rows ∪ cols)
    val numVertices: Long,
    val numEdges: Long,
    val parts: Int,
    /** true → nbrs: array<struct<dst:long, w:double>> (16 B/edge);
      * false → nbrs: array<long> of dst only (8 B/edge) — the compact
      * layout for weight-ignoring programs (CC/BFS/LPA), halving cache
      * footprint and explode traffic. Parallel edges stay distinct
      * array elements in both layouts. */
    val weighted: Boolean) extends Serializable {

  import org.apache.spark.sql.Column

  /** Exploded-neighbor accessors for the gather path: given the alias
    * of an `explode(nbrs)` column, the destination and weight columns
    * under this layout. */
  def dstOf(e: Column): Column = if (weighted) e.getField("dst") else e
  def wOf(e: Column): Column = if (weighted) e.getField("w") else lit(1.0)
  /** All destinations across neighbor arrays (pre-explode column). */
  def nbrDsts: Column = if (weighted) col("nbrs.dst") else col("nbrs")

  def unpersist(): Unit = { out.unpersist(); vertices.unpersist() }
}

object Adjacency {

  /** Same adjacency with a substituted (e.g. annotated) vertex table. */
  def withVertices(a: Adjacency, vertices: DataFrame): Adjacency =
    new Adjacency(a.out, vertices, a.numVertices, a.numEdges, a.parts, a.weighted)

  /** Same adjacency with both frames re-bound to another session (the
    * loop-session clone Engine/LabelPropagation run their supersteps
    * on — see Engine.loopSession). */
  private[graft] def rebind(a: Adjacency, spark: SparkSession): Adjacency = {
    import org.apache.spark.sql.graftbridge.SessionBridge
    new Adjacency(SessionBridge.rebind(spark, a.out),
      SessionBridge.rebind(spark, a.vertices),
      a.numVertices, a.numEdges, a.parts, a.weighted)
  }

  /** Default neighbor-array chunk size. 2^13 structs ≈ 128 KiB per row
    * — big enough to amortize per-row overhead, small enough that a
    * 10^8-degree hub becomes ~12k balanced rows instead of one 1.6 GB
    * cell at 100 TB scale. */
  val DefaultChunk = 8192

  /** Build the persisted, co-partitioned adjacency from an edge table
    * (src, dst[, w]). `parts` should match spark.sql.shuffle.partitions
    * so downstream groupBy/join stages reuse the partitioning without
    * an extra exchange.
    */
  /** @param weighted false → compact dst-only neighbor arrays; pass it
    *                  from programs whose combiner ignores the weight
    *                  (CC/BFS/LPA). An edge table without a `w` column
    *                  is compact regardless. */
  def build(edges: DataFrame, parts: Int, chunk: Int = DefaultChunk,
            weighted: Boolean = true): Adjacency = {
    val spark = edges.sparkSession
    val hasW = edges.columns.contains("w")
    val keepW = weighted && hasW
    // The build makes several passes over the edge plan (degree agg,
    // salted join, vertex union, count) — pin it for the duration so an
    // expensive upstream (shaping union, LSH pair join, parquet scan)
    // executes once, then release the blocks.
    val e = (if (hasW)
      edges.select(col("src"), col("dst"), coalesce(col("w"), lit(1.0)).cast("double").as("w"))
    else
      edges.select(col("src"), col("dst"), lit(1.0).as("w")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Out-degree per source — drives the per-vertex salt count. V-sized,
    // broadcast when small; Spark falls back to shuffle join otherwise.
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))

    val salted = e
      .join(outdeg, "src")
      .withColumn("nsalts",
        greatest(lit(1L), ceil(col("outdeg").cast("double") / chunk)).cast("int"))
      .withColumn("salt", pmod(xxhash64(col("dst")), col("nsalts")).cast("int"))

    // repartition by src ONLY, then group by (src, salt): HashPartitioning(src)
    // satisfies ClusteredDistribution(src, salt), so the aggregation runs
    // without a second exchange and the result stays partitioned by src —
    // exactly what the per-superstep gather join needs.
    val nbrElem = if (keepW) struct(col("dst"), col("w")) else col("dst")
    val out = salted
      .repartition(parts, col("src"))
      .groupBy(col("src"), col("salt"))
      .agg(collect_list(nbrElem).as("nbrs"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // repartition BEFORE distinct: hash(vid, parts) satisfies the
    // dedup aggregation's required distribution AND is the layout the
    // engine wants, so one exchange does both (distinct-then-
    // repartition paid a second, session-width exchange).
    val vertices = e.select(col("src").as("vid"))
      .unionAll(e.select(col("dst").as("vid")))
      .repartition(parts, col("vid"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val nV = vertices.count()
    // ONE job both materializes the CSR cache and returns the edge
    // count (Σ|nbrs| ≡ e.count() — salting splits a source's edges
    // across rows but never duplicates an edge), replacing the two
    // separate count jobs of the round-5 build.
    val nE = out.agg(coalesce(sum(size(col("nbrs")).cast("long")), lit(0L)))
      .head.getLong(0)
    e.unpersist(false) // out+vertices are materialized; edge blocks done
    new Adjacency(out, vertices, nV, nE, parts, keepW)
  }
}
