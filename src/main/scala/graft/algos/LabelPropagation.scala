package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer
import graft.graph._
import graft.ckpt.IterMetrics

/** Synchronous label propagation (community detection) — the
  * north_rule's fourth algorithm. The reference ships only the
  * min-label variant (its CC program, src/apps/cc.h, doubles as LPA
  * per SURVEY.md §2.8); this is the full frequency-based LPA with a
  * DETERMINISTIC tie-break (max count, then min label) so results are
  * exactly reproducible run-to-run (north_rule: label assignments
  * exact).
  *
  * Each superstep is two hash aggregations instead of the engine's
  * one: count labels per (vertex, label), then arg-max per vertex via
  * `max(struct(count, -label))` — both stay in whole-stage codegen
  * with map-side partial aggregation; the adjacency side never moves.
  */
object LabelPropagation {

  def run(edges: DataFrame, parts: Int, maxIters: Int = 10): RunResult = {
    val und = GraphShaping.shape(edges,
      EdgeShaping(selfLoops = false, directed = false, parallelEdges = false))
    val adj = Adjacency.build(und, parts, weighted = false)
    runOnAdjacency(adj, maxIters)
  }

  def runOnAdjacency(adj: Adjacency, maxIters: Int): RunResult = {
    val metrics = ArrayBuffer.empty[IterMetrics]
    var state = adj.vertices
      .select(col("vid"), col("vid").as("label"), lit(true).as("changed"))
      .localCheckpoint(true)
    var iter = 0
    var active = adj.numVertices
    var prevState: DataFrame = null

    while (active > 0 && iter < maxIters) {
      val t0 = System.nanoTime()
      // SHUFFLE_HASH: state is a localCheckpoint LogicalRDD with
      // unknown stats — same sort-merge-fallback hazard as Engine's
      // gather join (Engine.scala:108-117).
      val msgs = state.select(col("vid"), col("label").as("msg"))
        .repartition(adj.parts, col("vid")).hint("SHUFFLE_HASH")

      val newLabels = adj.out
        .join(msgs, adj.out("src") === msgs("vid"), "inner")
        .select(col("msg"), explode(col("nbrs")).as("e"))
        .groupBy(adj.dstOf(col("e")).as("vid"), col("msg").as("nbrLabel"))
        .agg(count(lit(1)).as("cnt"))
        // arg-max with deterministic tie-break: highest count wins,
        // ties resolved toward the SMALLEST label (hence -nbrLabel in
        // the struct ordering).
        .groupBy(col("vid"))
        .agg(max(struct(col("cnt"), (-col("nbrLabel")).as("negLabel"))).as("top"))
        .select(col("vid"), (-col("top.negLabel")).as("newLabel"))

      val applied = state
        .join(newLabels.hint("SHUFFLE_HASH"), Seq("vid"), "left_outer")
        .select(
          col("vid"),
          coalesce(col("newLabel"), col("label")).as("label"),
          (coalesce(col("newLabel"), col("label")) =!= col("label")).as("changed"))

      // Same one-action-per-superstep shape as Engine (Engine.scala:
      // 135-153): the convergence count rides the materializing job as
      // a CollectMetrics accumulator, the EAGER localCheckpoint
      // truncates the per-iteration plan growth, and the previous
      // superstep's checkpoint blocks are dropped once the new state is
      // materialized — stable block-manager footprint over long runs.
      val metricName = s"graft_lpa_converge_$iter"
      val observed = applied.observe(metricName,
        sum(when(col("changed"), 1L).otherwise(0L)).as("active"))
      val newState = observed.localCheckpoint(true)
      active = observed.queryExecution.observedMetrics.get(metricName) match {
        case Some(row) if !row.isNullAt(0) => row.getLong(0)
        case _ => newState.filter(col("changed")).count() // fallback
      }
      if (prevState ne null) Engine.unpersistCheckpointed(prevState)
      prevState = state
      state = newState
      iter += 1
      metrics += IterMetrics(iter, active, (System.nanoTime() - t0) / 1000000, adj.numVertices)
    }
    if (prevState ne null) Engine.unpersistCheckpointed(prevState)
    RunResult(state, iter, metrics.toSeq)
  }
}
