package graft.graph

import org.apache.spark.sql.{Column, DataFrame}

/** The engine's extension contract — the Spark-native re-expression of
  * the reference's five `Vertex_Program` virtuals (reference:
  * src/vp/vertex_program.hpp:32-45 — initializer / messenger /
  * combiner / applicator / infinity). Each hook is declared as a
  * DataFrame/Column transformation so the whole superstep stays inside
  * Catalyst + whole-stage codegen; no row-at-a-time closures.
  *
  * State is a DataFrame with at least columns
  *   vid: long, changed: boolean
  * plus algorithm-specific columns. `changed` doubles as the frontier
  * bit for nonstationary programs (reference's activity bits `T`,
  * vp:161-171).
  */
trait VertexProgram extends Serializable {
  def name: String

  /** true = every vertex messages every superstep (PR, Degree);
    * false = only vertices changed last superstep message (CC, BFS,
    * SSSP) — the reference's stationary/nonstationary split
    * (vp:688-784). */
  def stationary: Boolean

  /** Initial state from the vertex universe `(vid)`; must emit
    * `changed` (the reference initializer's boolean return,
    * vp:32-33). Extra inputs (e.g. PR's degree seed, vp:466-501) are
    * closed over by the concrete program. */
  def init(vertices: DataFrame): DataFrame

  /** Message projection: state → (vid, msg). For nonstationary
    * programs the engine pre-filters to the frontier; this hook only
    * selects the payload (reference messenger, vp:34). */
  def message(state: DataFrame): Column

  /** Per-edge combine of the in-flight message with the edge weight —
    * the reference's 3-arg combiner (vp:35-36), e.g. `msg * w` (PR) or
    * `msg + w` (SSSP). */
  def edgeCombine(msg: Column, w: Column): Column

  /** Aggregate of all incoming per-edge values into y — the
    * reference's 2-arg combiner: `sum` or `min` for all shipped apps
    * (SURVEY.md §2.7). Must be an aggregate expression so Spark's
    * partial+final hash aggregation applies. */
  def aggregate(v: Column): Column

  /** New state from `state ⟗ y` (left-outer; column "y" is null when
    * a vertex received no message — the reference's infinity()
    * sentinel becomes SQL null). Must re-emit vid and `changed`
    * (reference applicator, vp:37-39). `iter` is 0-based, matching
    * the reference's applicator iteration argument (bfs.h:65-77). */
  def apply(joined: DataFrame, iter: Int): DataFrame
}
