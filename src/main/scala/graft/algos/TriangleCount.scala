package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting — the operator the reference prepared for
  * but never shipped (vestigial hooks: `W` values member,
  * src/vp/vertex_program.hpp:62; the dedup comment "necessary for
  * triangle couting", src/mat/matrix.hpp:551-552; the `acyclic`
  * low→high edge orientation, src/mat/graph.hpp:271-275). Built for
  * real here (north_rule: exact count), as the classic two-self-join
  * DataFrame plan.
  *
  * Scale design: edges are oriented by DEGREE order (lower-degree
  * endpoint → higher-degree endpoint, ties by vid), not by raw vid.
  * Degree orientation bounds per-vertex out-degree by O(√E) on any
  * graph, which caps the wedge blow-up of the first join on power-law
  * graphs — the difference between feasible and not at 100 TB. The
  * triangle COUNT is orientation-invariant, so a plain a<b<c oracle
  * verifies it.
  */
object TriangleCount {

  /** Degree-ordered orientation of the undirected simple closure of
    * `edges`: one row per undirected edge, src "smaller" than dst in
    * (degree, vid) order, self-loops dropped, parallel edges deduped. */
  def orient(edges: DataFrame): DataFrame = {
    val simple = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = simple.select(col("u").as("vid"))
      .unionAll(simple.select(col("v").as("vid")))
      .groupBy("vid").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    simple
      .join(deg.withColumnRenamed("vid", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("vid", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("dst"))
  }

  /** Global exact triangle count — node-iterator over the degree-
    * oriented graph: Σ_{(u,v)∈o} |N⁺(u) ∩ N⁺(v)|. Each triangle has
    * exactly one orientation x→y, y→z, x→z, and z is counted exactly
    * once, as a common out-neighbor on edge (x,y) — the same count the
    * wedge-join form produced, without ever materializing the wedge
    * set: the earlier e1⋈e2 plan generated Σ indeg·outdeg rows
    * (≈90M at sf0.1, the query's entire cost) and shuffled them into a
    * semi join, where this shape moves only the E edge rows plus a
    * V-row adjacency-list table whose arrays are O(√E) by the degree
    * orientation. */
  def count(edges: DataFrame, parts: Int): Long = {
    val o = orient(edges).repartition(parts, col("src")).persist()
    try {
      // sorted adjacency lists: deterministic layout (contents are a
      // set either way — intersection size is order-invariant)
      val adjl = o.groupBy(col("src").as("vid"))
        .agg(sort_array(collect_list(col("dst"))).as("ns"))
      val withLists = o
        .join(adjl.select(col("vid").as("src"), col("ns").as("ns_u")), "src")
        .join(adjl.select(col("vid").as("dst"), col("ns").as("ns_v")), "dst")
      withLists
        .agg(coalesce(sum(size(array_intersect(col("ns_u"), col("ns_v"))).cast("long")),
          lit(0L)))
        .head.getLong(0)
    } finally o.unpersist()
  }
}
