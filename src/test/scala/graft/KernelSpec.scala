package graft

import graft.graph._

/** The tile-compiled SpMV fast path must be a drop-in for the
  * DataFrame engine's PageRank: same reference semantics (pr.h), same
  * results vs the in-memory oracle, deterministic run-to-run. */
class KernelSpec extends SparkTestBase {

  private def kernelRanks(es: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val g = SpmvKernel.compile(edgesDF(es), parts)
    try {
      val r = g.pagerank(maxIters = iters)
      r.state.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    } finally g.unpersist()
  }

  test("random skewed graph matches the reference oracle allclose 1e-9 (20 iters)") {
    val es = randomEdges(400, 3000, seed = 91)
    val want = ReferenceOracle.pagerank(es, iters = 20)
    val got = kernelRanks(es, iters = 20)
    assert(got.keySet == want.keySet)
    want.foreach { case (v, x) =>
      assert(math.abs(got(v) - x) <= 1e-9, s"vid=$v want=$x got=${got(v)}")
    }
  }

  test("kernel equals the DataFrame engine path (same adjacency semantics)") {
    val es = randomEdges(200, 1500, seed = 93)
    val adj = Adjacency.build(edgesDF(es), parts)
    val engine = graft.algos.PageRank.run(adj, maxIters = 15)
      .state.select("vid", "rank").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val kernel = kernelRanks(es, iters = 15)
    assert(kernel.keySet == engine.keySet)
    engine.foreach { case (v, x) =>
      assert(math.abs(kernel(v) - x) <= 1e-9, s"vid=$v engine=$x kernel=${kernel(v)}")
    }
    adj.unpersist()
  }

  test("weighted edges: combiner multiplies by w (matches hand-rolled sweep)") {
    val es = Seq((0L, 1L, 2.0), (0L, 2L, 1.0), (1L, 2L, 3.0), (2L, 0L, 1.0))
    val g = SpmvKernel.compile(wEdgesDF(es), parts)
    val got = g.pagerank(maxIters = 5).state.collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    g.unpersist()
    // in-memory weighted sweep, same formula
    val vs = Seq(0L, 1L, 2L)
    val outdeg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rank = vs.map(_ -> 0.15).toMap
    (1 to 5).foreach { _ =>
      val y = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      es.foreach { case (u, v, w) => y(v) += rank(u) / outdeg(u) * w }
      rank = vs.map(v => v -> (0.15 + 0.85 * y(v))).toMap
    }
    vs.foreach(v => assert(math.abs(got(v) - rank(v)) <= 1e-12, s"vid=$v"))
  }

  test("convergence mode stops at the tol fixpoint like the engine") {
    val es = Fixtures.cycle6
    val g = SpmvKernel.compile(edgesDF(es), parts)
    val r = g.pagerank(maxIters = 0, tol = 1e-6)
    g.unpersist()
    // cycle: fixpoint rank=1 everywhere
    r.state.collect().foreach(x => assert(math.abs(x.getDouble(1) - 1.0) <= 1e-4))
    assert(r.iterations > 5) // actually iterated to the fixpoint
    assert(math.abs(r.checksum - 6.0) <= 1e-3)
  }

  test("two compiles + runs are bit-identical (deterministic tiles and fold order)") {
    val es = randomEdges(150, 900, seed = 97)
    val a = kernelRanks(es, iters = 12)
    val b = kernelRanks(es, iters = 12)
    assert(a == b, "kernel runs are not bit-deterministic")
  }

  test("parallel edges each contribute; empty graph is a no-op") {
    val dup = Seq((0L, 1L), (0L, 1L), (1L, 0L))
    val got = kernelRanks(dup, iters = 3)
    val want = ReferenceOracle.pagerank(dup, iters = 3)
    want.foreach { case (v, x) => assert(math.abs(got(v) - x) <= 1e-12) }

    val empty = SpmvKernel.compile(edgesDF(Seq.empty), parts)
    val r = empty.pagerank(maxIters = 5)
    assert(r.iterations == 0 && r.state.count() == 0)
    empty.unpersist()
  }

  test("compile audit: V/E counts and bounded imbalance on a skewed graph") {
    val es = randomEdges(300, 4000, seed = 99)
    val g = SpmvKernel.compile(edgesDF(es), parts)
    assert(g.numEdges == es.length)
    assert(g.numVertices == ReferenceOracle.vertices(es).length)
    assert(g.edgeImbalance >= 0.0)
    g.unpersist()
  }
}
