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

  /** Global exact triangle count: wedge join + closing-edge semi join. */
  def count(edges: DataFrame, parts: Int): Long = {
    val o = orient(edges).repartition(parts, col("src")).persist()
    try {
      val e1 = o.as("e1")
      val e2 = o.as("e2")
      val wedges = e1.join(e2, col("e1.dst") === col("e2.src"))
        .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
      val closing = o.select(col("src").as("a"), col("dst").as("c"))
      wedges.join(closing, Seq("a", "c"), "left_semi").count()
    } finally o.unpersist()
  }
}
