package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.graph._
import graft.algos._

/** Compact (dst-only, array<long>) vs weighted (array<struct<dst,w>>)
  * adjacency layouts: the compact one halves bytes/edge for programs
  * whose combiner ignores the weight, and must be result-identical.
  */
class AdjacencyLayoutSpec extends SparkTestBase {

  private val es: Seq[(Long, Long)] =
    Fixtures.twoComp ++ Fixtures.star8.map { case (a, b) => (a + 20L, b + 20L) }

  test("compact layout stores array<long> neighbors; weighted stores structs") {
    val w = Adjacency.build(wEdgesDF(es.map { case (a, b) => (a, b, 2.0) }), parts)
    val c = Adjacency.build(wEdgesDF(es.map { case (a, b) => (a, b, 2.0) }), parts,
      weighted = false)
    assert(w.weighted)
    assert(!c.weighted)
    assert(c.out.schema("nbrs").dataType == ArrayType(LongType, containsNull = false) ||
      c.out.schema("nbrs").dataType == ArrayType(LongType, containsNull = true))
    assert(w.out.schema("nbrs").dataType.isInstanceOf[ArrayType])
    assert(w.out.schema("nbrs").dataType.asInstanceOf[ArrayType]
      .elementType.typeName == "struct")
    // no-w edge tables are compact automatically
    val auto = Adjacency.build(edgesDF(es), parts)
    assert(!auto.weighted)
    w.unpersist(); c.unpersist(); auto.unpersist()
  }

  test("CC/BFS results identical across layouts, incl. parallel edges kept distinct") {
    // duplicate one edge: both layouts must keep it as a distinct element
    val dup = es ++ Seq(es.head)
    def ccLabels(weighted: Boolean): Map[Long, Long] = {
      val und = GraphShaping.shape(edgesDF(dup),
        EdgeShaping(directed = false, parallelEdges = false))
      val adj = Adjacency.build(und, parts, weighted = weighted)
      val r = Engine.run(adj, new MinLabelProgram("cc"), RunConfig(maxIters = 0))
      val out = r.state.select("vid", "label").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      adj.unpersist(); out
    }
    assert(ccLabels(weighted = true) == ccLabels(weighted = false))

    def parallelEdgeCount(weighted: Boolean): Long = {
      val adj = Adjacency.build(edgesDF(dup), parts, weighted = weighted)
      val n = adj.numEdges
      adj.unpersist(); n
    }
    assert(parallelEdgeCount(weighted = true) == dup.size.toLong)
    assert(parallelEdgeCount(weighted = false) == dup.size.toLong)
  }

  test("PageRank over an unweighted edge table matches across layouts") {
    def pr(weighted: Boolean): Map[Long, Double] = {
      // edge table WITHOUT w column: multiplicity via duplicate rows
      val dup = edgesDF(es ++ Seq(es.head))
      val adj =
        if (weighted) Adjacency.build(dup.withColumn("w", lit(1.0)), parts)
        else Adjacency.build(dup, parts)
      val r = PageRank.run(adj, maxIters = 8)
      val out = r.state.select("vid", "rank").collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      adj.unpersist(); out
    }
    val a = pr(weighted = true)
    val b = pr(weighted = false)
    assert(a.keySet == b.keySet)
    a.foreach { case (v, x) => assert(math.abs(x - b(v)) <= 1e-12, s"vid=$v") }
  }
}
