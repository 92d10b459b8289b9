package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph._

/** PageRank with the reference's EXACT semantics (src/apps/pr.h):
  *
  *   - α = 0.15, tol = 1e-5 (pr.h:12-13) — both overridable;
  *   - rank₀ = α (pr.h:16, 28);
  *   - messenger: rank/degree, 0 when degree = 0 (pr.h:31-33) where
  *     degree is the OUT-degree from the phase-1 Degree program
  *     (pr.cpp:38-49, seeding join vp:466-501);
  *   - combiner: y += msg · w (pr.h:35-37);
  *   - applicator: rank ← α + (1−α)·y, changed iff |Δrank| > tol
  *     (pr.h:43-47).
  *
  * This is the UNNORMALIZED form — constant teleport α (not α/N) and
  * NO dangling-mass redistribution (sink rank simply leaks). GraphX /
  * textbook PR would diverge from the reference here; we encode the
  * reference formula (SURVEY.md §2.8).
  *
  * Stationary: every vertex messages every superstep; a vertex with no
  * in-edges gets y = null → 0 → rank = α, identical to the reference's
  * zero-filled accumulator.
  */
final class PageRankProgram(degrees: DataFrame, alpha: Double, tol: Double)
    extends VertexProgram {
  val name = "pagerank"
  val stationary = true

  def init(vertices: DataFrame): DataFrame =
    vertices
      .join(degrees, Seq("vid"), "left_outer")
      .select(
        col("vid"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        lit(alpha).as("rank"),
        lit(true).as("changed"))

  def message(state: DataFrame): Column =
    when(col("degree") > 0, col("rank") / col("degree")).otherwise(lit(0.0))

  def edgeCombine(msg: Column, w: Column): Column = msg * w

  def aggregate(v: Column): Column = sum(v)

  def apply(joined: DataFrame, iter: Int): DataFrame = {
    val newRank = lit(alpha) + lit(1.0 - alpha) * coalesce(col("y"), lit(0.0))
    joined.select(
      col("vid"),
      col("degree"),
      newRank.as("rank"),
      (abs(newRank - col("rank")) > tol).as("changed"))
  }
}

object PageRank {
  val DefaultAlpha = 0.15
  val DefaultTol = 1e-5

  /** Run PageRank over a prebuilt adjacency. `maxIters > 0` runs a
    * fixed budget (the reference slurm runs use 20, graphtap.slurm:72);
    * 0 runs to convergence (all |Δrank| ≤ tol). Degree is derived from
    * the adjacency itself — no second pass over raw edges. */
  def run(adj: Adjacency,
          maxIters: Int = 20,
          alpha: Double = DefaultAlpha,
          tol: Double = DefaultTol,
          ckpt: Option[graft.ckpt.CheckpointManager] = None): RunResult = {
    val degrees = Degree.outFromAdjacency(adj)
    Engine.run(adj, new PageRankProgram(degrees, alpha, tol),
      RunConfig(maxIters = maxIters, ckpt = ckpt))
  }

  /** Convenience: edges → adjacency → run. */
  def fromEdges(edges: DataFrame, parts: Int, maxIters: Int = 20): RunResult = {
    val adj = Adjacency.build(edges, parts)
    try run(adj, maxIters) finally {}
  }
}
