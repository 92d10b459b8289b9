package graft.graph

import org.apache.spark.{HashPartitioner, Partitioner, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable.ArrayBuffer
import graft.ckpt.IterMetrics

/** Tile-compiled SpMV fast path for the STATIONARY superstep loop —
  * the "drive the loop below Catalyst" half of the engine.
  *
  * The DataFrame Engine (graph/Engine.scala) re-analyzes, re-plans and
  * re-launches a Catalyst job every superstep; the plan is IDENTICAL
  * every iteration (PLAN.md), so at small per-superstep runtimes the
  * fixed driver barrier (~0.3-0.5 s of planning + task launch at
  * local[32]) dominates, and inside the stages the generic hash
  * aggregate pays a DRAM-random probe per edge. This kernel is the
  * reference's answer re-expressed on Spark RDDs: GraphTap compiles
  * the matrix ONCE into per-tile compressed columns
  * (src/ds/compressed_column.hpp:63-1120, 2D tiling at
  * src/mat/matrix.hpp:271-368) and its superstep loop re-plans nothing
  * (src/vp/vertex_program.hpp:408-441). Here:
  *
  *  - `compile` partitions edges by hash(src) into P partitions, and
  *    inside each partition p builds one CSR TILE per destination
  *    partition q: source rows as state-slot indices, destinations as
  *    TILE-LOCAL dense indices (0..nDsts-1), weights optional. All
  *    indices int, all static, built once, cached.
  *  - each superstep is ONE two-stage RDD job:
  *      stage 1 (scatter_gather+combine, vp:688-861): per tile, a
  *        tight primitive-array loop accumulates rank·invdeg[·w] into a
  *        DENSE per-tile accumulator (cache-resident — no hash probes,
  *        no explode iterators, no codegen'd row pipelines), then ships
  *        the packed double array to q; the shuffle carries ONLY
  *        doubles (the dst ids were exchanged once at compile time —
  *        the analog of the reference's static communicator layout).
  *      stage 2 (combine-final + apply, vp:1058-1113, 1641-1802):
  *        partition q folds incoming tile accumulators — in SORTED
  *        source-partition order, so the float sum is deterministic
  *        run-to-run — into its V/P-sized y vector and applies
  *        rank' = α + (1−α)·y in place.
  *    No Catalyst, no per-iteration planning; driver overhead per
  *    superstep is one job submission (~10 ms class).
  *
  * Scale shape at 100 TB: the per-superstep exchange is Σ_pq
  * |distinct dsts of tile (p,q)| doubles ≤ min(E, P·V) — the same
  * V-bounded exchange as the DataFrame path, but packed; per-tile
  * accumulators are V/P-sized, so executor memory per task stays flat
  * as P grows with the cluster. Known trade-off vs the salted
  * DataFrame path: edges partition by hash(src), so a pathological
  * hub vertex concentrates its out-edges in one partition (the
  * DataFrame engine salts those rows; the reference's 2D grid has the
  * matching limitation per rank row). `edgeImbalance` reports the
  * realized skew; the DataFrame engine remains the general path
  * (frontier algorithms, checkpoint/resume, arbitrary programs).
  */
object SpmvKernel {

  /** Minimal open-addressing Long→Int map (linear probing, splitmix
    * finalizer) for the compile phase: a binarySearch per edge was the
    * compile bottleneck (460M edges × ~20 probes); this is O(1) with
    * two primitive arrays and no boxing. Build-time only. */
  private final class LongIntMap(expected: Int) {
    private val cap = Integer.highestOneBit(math.max(16, expected * 2) * 2 - 1)
    private val mask = cap - 1
    private val keys = new Array[Long](cap)
    private val vals = new Array[Int](cap)
    private val used = new Array[Boolean](cap)
    private def idx(k: Long): Int = {
      var h = k * -7046029254386353131L
      h ^= h >>> 32
      (h & mask).toInt
    }
    def put(k: Long, v: Int): Unit = {
      var i = idx(k)
      while (used(i) && keys(i) != k) i = (i + 1) & mask
      keys(i) = k; vals(i) = v; used(i) = true
    }
    /** Caller guarantees the key exists. */
    def get(k: Long): Int = {
      var i = idx(k)
      while (keys(i) != k || !used(i)) i = (i + 1) & mask
      vals(i)
    }
  }

  /** Identity partitioner for pre-bucketed (Int-keyed) tile traffic. */
  private final class IdPartitioner(val numPartitions: Int) extends Partitioner {
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
    override def equals(o: Any): Boolean = o match {
      case p: IdPartitioner => p.numPartitions == numPartitions
      case _ => false
    }
    override def hashCode: Int = numPartitions
  }

  /** One compiled CSR tile (p, q): edges of source-partition p whose
    * destinations hash to partition q. `srcSlots` indexes the owning
    * partition's state arrays; `dstLocal` indexes the tile's (sorted,
    * deterministic) distinct-destination list, whose slots on q are
    * precomputed in KernelPartition.inSlots. */
  private[graph] final case class Tile(
      srcSlots: Array[Int],
      offsets: Array[Int],
      dstLocal: Array[Int],
      weights: Array[Double], // null → all 1.0
      nDsts: Int) {
    def nEdges: Int = dstLocal.length
  }

  /** Partition p's compiled state: owned (sorted) vertex ids = state
    * slots, per-slot 1/outdeg, the P outgoing tiles, and — after the
    * one-time compile-phase exchange — for every source partition the
    * mapping from its tile-local destination index to a slot here. */
  private[graph] final case class KernelPartition(
      vids: Array[Long],
      invDeg: Array[Double],
      tiles: Array[Tile],
      inSlots: Array[Array[Int]]) // by source partition; null when no tile

  final case class KernelResult(state: DataFrame, iterations: Int,
                                metrics: Seq[IterMetrics], checksum: Double)

  /** Compiled graph handle: run `pagerank` any number of times; call
    * `unpersist()` when done with the graph. */
  final class CompiledGraph private[SpmvKernel] (
      private[graph] val kernel: RDD[KernelPartition],
      val spark: SparkSession,
      val parts: Int,
      val numVertices: Long,
      val numEdges: Long,
      val weighted: Boolean) {

    private val sc = spark.sparkContext
    private val idPart = new IdPartitioner(parts)

    /** Exact per-superstep exchange volume in DOUBLES: Σ over tiles of
      * |distinct destinations| — every superstep ships exactly one
      * double per tile-destination. Bounded by min(E, P·V); grows with
      * P toward E as per-tile destination dedup thins out (the
      * all-to-all volume physics a cluster pays in network). */
    def exchangeDoubles: Long = kernel
      .map(kp => kp.tiles.map(t => if (t == null) 0L else t.nDsts.toLong).sum)
      .fold(0L)(_ + _)

    /** max/mean−1 over per-partition edge counts — the kernel's
      * realized skew (reference Matrix::balance, matrix.hpp:562-687).
      * hash(src) partitioning concentrates a hub's out-edges; audit it. */
    def edgeImbalance: Double = {
      val counts = kernel.map(kp => kp.tiles.map(t => if (t == null) 0L else t.nEdges.toLong).sum)
        .collect()
      val mean = counts.sum.toDouble / counts.length
      if (mean == 0) 0.0 else counts.max / mean - 1.0
    }

    /** Re-slot a saved (vid, rank) frame into the kernel's partition
      * layout — the resume half of the checkpoint contract. */
    private def stateFromDF(df: DataFrame): RDD[Array[Double]] = {
      val hp = new HashPartitioner(parts)
      val keyed = df.select("vid", "rank").queryExecution.toRdd
        .map(ir => (ir.getLong(0), ir.getDouble(1)))
        .partitionBy(hp)
      kernel.zipPartitions(keyed, preservesPartitioning = false) { (kIt, rIt) =>
        val kp = kIt.next()
        val slot = new LongIntMap(kp.vids.length)
        var i = 0
        while (i < kp.vids.length) { slot.put(kp.vids(i), i); i += 1 }
        val arr = new Array[Double](kp.vids.length)
        rIt.foreach { case (v, r) => arr(slot.get(v)) = r }
        Iterator.single(arr)
      }
    }

    private def stateDF(state: RDD[Array[Double]]): DataFrame = {
      val sp = spark
      import sp.implicits._
      kernel.zipPartitions(state, preservesPartitioning = false) { (kIt, sIt) =>
        val kp = kIt.next(); val ranks = sIt.next()
        Iterator.range(0, kp.vids.length).map(i => (kp.vids(i), ranks(i)))
      }.toDF("vid", "rank")
    }

    /** Reference-exact PageRank (src/apps/pr.h: rank₀=α; msg=rank/deg,
      * 0 when deg 0; y=Σ msg·w; rank←α+(1−α)y; changed iff |Δ|>tol;
      * Always source semantics). `maxIters>0` = fixed budget (the
      * convergence check is disabled, vp:412-413); 0 = run until no
      * vertex moves more than `tol`. `ckpt` gives the fast path the
      * same durable resume contract as the Engine loop: resume from
      * the latest snapshot (ranks re-slotted into the tile layout),
      * save every `ckpt.every` supersteps plus a final snapshot. */
    def pagerank(maxIters: Int, alpha: Double = 0.15, tol: Double = 1e-5,
                 lineageTruncateEvery: Int = 20,
                 ckpt: Option[graft.ckpt.CheckpointManager] = None): KernelResult = {
      val P = parts
      val metrics = ArrayBuffer.empty[IterMetrics]
      val resumed = ckpt.flatMap(c => c.latestIter().map(i => (i, c.load(spark, i))))
      var state: RDD[Array[Double]] = resumed
        .map { case (_, df) => stateFromDF(df) }
        .getOrElse(kernel.map(kp => Array.fill(kp.vids.length)(alpha)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      state.count()
      var prev: RDD[Array[Double]] = null
      var iter = resumed.map(_._1).getOrElse(0)
      var active = numVertices

      def keepGoing: Boolean =
        if (numVertices == 0) false
        else if (maxIters > 0) iter < maxIters
        else active > 0

      while (keepGoing) {
        val t0 = System.nanoTime()
        sc.setJobGroup(s"graft-superstep-$iter", s"spmv pagerank superstep $iter",
          interruptOnCancel = false)
        val changedAcc = sc.longAccumulator(s"graft_spmv_changed_$iter")
        // GRAFT_KERNEL_PROFILE=1 → split pure tile-compute ns from the
        // framework residue (iterator/serialization/shuffle)
        val profAcc =
          if (sys.env.contains("GRAFT_KERNEL_PROFILE"))
            Some(sc.longAccumulator(s"graft_spmv_compute_ns_$iter"))
          else None

        // ---- stage 1: per-tile gather into dense accumulators.
        // The tile accumulator ships as a PACKED byte array
        // ([int p][pad][doubles…]): primitive byte arrays take the
        // serializer's bulk path (a block copy), where a boxed
        // (Int, Array[Double]) record pays elementwise object-stream
        // writes — measured 10-20× the kernel's actual compute time at
        // local[32] (the compute loop is ~8 ms/thread/superstep; the
        // boxed-record shuffle made the wall 395 ms).
        val msgs: RDD[(Int, Array[Byte])] =
          kernel.zipPartitions(state, preservesPartitioning = false) { (kIt, sIt) =>
            val kp = kIt.next(); val ranks = sIt.next()
            val p = TaskContext.getPartitionId()
            Iterator.range(0, P).flatMap { q =>
              val t = kp.tiles(q)
              if (t == null) Iterator.empty
              else {
                val c0 = if (profAcc.isDefined) System.nanoTime() else 0L
                val acc = new Array[Double](t.nDsts)
                val srcSlots = t.srcSlots; val offsets = t.offsets
                val dstLocal = t.dstLocal; val w = t.weights
                val invDeg = kp.invDeg
                var i = 0
                while (i < srcSlots.length) {
                  val slot = srcSlots(i)
                  val msg = ranks(slot) * invDeg(slot) // hoisted: one mul per source row
                  var e = offsets(i); val end = offsets(i + 1)
                  if (w == null) { while (e < end) { acc(dstLocal(e)) += msg; e += 1 } }
                  else { while (e < end) { acc(dstLocal(e)) += msg * w(e); e += 1 } }
                  i += 1
                }
                // pack [int p][pad][doubles…] with ONE bulk copy
                val bytes = new Array[Byte](8 + t.nDsts * 8)
                val bb = java.nio.ByteBuffer.wrap(bytes)
                bb.putInt(0, p)
                bb.position(8)
                bb.asDoubleBuffer().put(acc)
                profAcc.foreach(_.add(System.nanoTime() - c0))
                Iterator.single((q, bytes))
              }
            }
          }

        // ---- exchange (packed doubles only) + stage 2: fold + apply
        val shuffled = msgs.partitionBy(idPart)
        val newState = shuffled.zipPartitions(kernel, state,
          preservesPartitioning = false) { (mIt, kIt, sIt) =>
          val kp = kIt.next(); val old = sIt.next()
          val y = new Array[Double](kp.vids.length)
          // fold in SORTED source-partition order: deterministic sums
          val incoming = mIt.map(_._2).toArray
          java.util.Arrays.sort(incoming, (a: Array[Byte], b: Array[Byte]) =>
            Integer.compare(java.nio.ByteBuffer.wrap(a).getInt(0),
              java.nio.ByteBuffer.wrap(b).getInt(0)))
          var scratch = new Array[Double](0)
          incoming.foreach { bytes =>
            val bb = java.nio.ByteBuffer.wrap(bytes)
            val p = bb.getInt(0)
            val n = (bytes.length - 8) / 8
            if (scratch.length < n) scratch = new Array[Double](n)
            bb.position(8)
            bb.asDoubleBuffer().get(scratch, 0, n) // one bulk copy back out
            val slots = kp.inSlots(p)
            var t = 0
            while (t < n) { y(slots(t)) += scratch(t); t += 1 }
          }
          val out = new Array[Double](y.length)
          var changed = 0L
          var i = 0
          while (i < out.length) {
            val nr = alpha + (1.0 - alpha) * y(i)
            if (math.abs(nr - old(i)) > tol) changed += 1
            out(i) = nr
            i += 1
          }
          changedAcc.add(changed)
          Iterator.single(out)
        }.persist(StorageLevel.MEMORY_AND_DISK)

        // RDD lineage (unlike the Engine's per-superstep eager
        // localCheckpoint) grows one zip+shuffle layer per iteration —
        // truncate periodically so task closures stay O(1)
        if (lineageTruncateEvery > 0 && (iter + 1) % lineageTruncateEvery == 0)
          newState.localCheckpoint()
        newState.count() // the ONE action per superstep
        profAcc.foreach(a => System.err.println(
          s"[kernel-profile] iter=$iter computeMs=${a.value / 1000000}"))
        active = changedAcc.value
        if (prev != null) prev.unpersist(false)
        prev = state
        state = newState
        iter += 1
        metrics += IterMetrics(iter, active, (System.nanoTime() - t0) / 1000000, numVertices)
        ckpt.foreach { c =>
          if (c.shouldCheckpoint(iter)) c.save("pagerank-kernel", iter, stateDF(state), metrics.toSeq)
        }
      }
      sc.clearJobGroup()
      ckpt.foreach(c => c.save("pagerank-kernel", iter, stateDF(state), metrics.toSeq))

      val ranksRdd = kernel.zipPartitions(state, preservesPartitioning = false) { (kIt, sIt) =>
        val kp = kIt.next(); val ranks = sIt.next()
        Iterator.range(0, kp.vids.length).map(i => (kp.vids(i), ranks(i)))
      }
      val checksum = ranksRdd.map(_._2).sum()
      val sp = spark
      import sp.implicits._
      // SELF-CONTAINED result: materialize (vid, rank) as an eager
      // localCheckpoint, then drop the loop's internal state blocks —
      // the returned frame never depends on kernel/state lineage, so
      // the caller may unpersist() the CompiledGraph in any order.
      // Release the result itself with Engine.release(result.state).
      val df = ranksRdd.toDF("vid", "rank").localCheckpoint(true)
      state.unpersist(false)
      if (prev != null) prev.unpersist(false)
      KernelResult(df, iter, metrics.toSeq, checksum)
    }

    def unpersist(): Unit = kernel.unpersist(false)
  }

  /** Compile an edge table (src, dst[, w]) into the tiled kernel form.
    * Three one-time shuffles: edges→hash(src), vertex-universe dedup,
    * and the tile-destination-list exchange that precomputes every
    * (p,q) slot mapping. Deterministic: tile edges sorted (src, dst),
    * tile destination lists sorted, so recompiles are bit-identical. */
  def compile(edges: DataFrame, parts: Int): CompiledGraph = {
    val spark = edges.sparkSession
    val weighted = edges.columns.contains("w")
    val hp = new HashPartitioner(parts)
    val idPart = new IdPartitioner(parts)

    // InternalRow scan (no per-row Row allocation): compile reads the
    // edge table exactly once and this is its hottest build stage
    val eRdd: RDD[(Long, (Long, Double))] =
      (if (weighted)
        edges.selectExpr("CAST(src AS LONG)", "CAST(dst AS LONG)",
          "CAST(COALESCE(w, 1.0) AS DOUBLE)").queryExecution.toRdd
          .map(ir => (ir.getLong(0), (ir.getLong(1), ir.getDouble(2))))
      else
        edges.selectExpr("CAST(src AS LONG)", "CAST(dst AS LONG)").queryExecution.toRdd
          .map(ir => (ir.getLong(0), (ir.getLong(1), 1.0))))
        .partitionBy(hp)
        // SER: boxed edge tuples held deserialized would cost ~64 B/edge
        // (29 GB at 460M edges); the serialized form is ~4× smaller and
        // is read only three times (vertices, degrees, tile build)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)

    // distinct vertex universe, partitioned like the edges' sources
    val verts: RDD[(Long, Null)] = eRdd
      .mapPartitions(_.flatMap { case (s, (d, _)) => Iterator((s, null), (d, null)) },
        preservesPartitioning = false)
      .reduceByKey(hp, (a, _) => a)
    // out-degree (counts parallel edges, reference pr.cpp:38-49)
    val degs: RDD[(Long, Long)] = eRdd.mapValues(_ => 1L).reduceByKey(hp, _ + _)

    val compiled: RDD[(KernelPartition, Array[Array[Long]])] =
      verts.zipPartitions(degs, eRdd, preservesPartitioning = true) { (vIt, dIt, eIt) =>
        Iterator.single(compilePartition(parts, hp, vIt, dIt, eIt, weighted))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    compiled.count()
    eRdd.unpersist(false)

    // one-time exchange of each tile's (sorted) destination-id list to
    // its owner partition → per-(p,q) slot mappings
    val meta: RDD[(Int, (Int, Array[Long]))] = compiled
      .mapPartitionsWithIndex { (p, it) =>
        val (_, dstVids) = it.next()
        Iterator.range(0, parts).flatMap(q =>
          if (dstVids(q) == null) Iterator.empty
          else Iterator.single((q, (p, dstVids(q)))))
      }.partitionBy(idPart)

    val kernel: RDD[KernelPartition] = compiled.zipPartitions(meta,
      preservesPartitioning = false) { (cIt, mIt) =>
      val (kp, _) = cIt.next()
      val vidSlot = new LongIntMap(kp.vids.length)
      var vi = 0
      while (vi < kp.vids.length) { vidSlot.put(kp.vids(vi), vi); vi += 1 }
      val inSlots = new Array[Array[Int]](parts)
      mIt.foreach { case (_, (p, dstVids)) =>
        val arr = new Array[Int](dstVids.length)
        var i = 0
        while (i < dstVids.length) {
          arr(i) = vidSlot.get(dstVids(i))
          i += 1
        }
        inSlots(p) = arr
      }
      Iterator.single(kp.copy(inSlots = inSlots))
    }.persist(StorageLevel.MEMORY_AND_DISK)

    val (nV, nE) = kernel
      .map(kp => (kp.vids.length.toLong,
        kp.tiles.map(t => if (t == null) 0L else t.nEdges.toLong).sum))
      .fold((0L, 0L)) { case ((v1, e1), (v2, e2)) => (v1 + v2, e1 + e2) }
    compiled.unpersist(false)
    new CompiledGraph(kernel, spark, parts, nV, nE, weighted)
  }

  private def compilePartition(
      P: Int, hp: HashPartitioner,
      vIt: Iterator[(Long, Null)], dIt: Iterator[(Long, Long)],
      eIt: Iterator[(Long, (Long, Double))],
      weighted: Boolean): (KernelPartition, Array[Array[Long]]) = {
    val vids = vIt.map(_._1).toArray
    java.util.Arrays.sort(vids)
    val vidSlot = new LongIntMap(vids.length)
    var vi = 0
    while (vi < vids.length) { vidSlot.put(vids(vi), vi); vi += 1 }
    val invDeg = new Array[Double](vids.length)
    dIt.foreach { case (v, d) =>
      if (d > 0) invDeg(vidSlot.get(v)) = 1.0 / d
    }

    // bucket edges by destination partition
    val bufS = Array.fill(P)(new scala.collection.mutable.ArrayBuilder.ofLong)
    val bufD = Array.fill(P)(new scala.collection.mutable.ArrayBuilder.ofLong)
    val bufW = if (weighted) Array.fill(P)(new scala.collection.mutable.ArrayBuilder.ofDouble) else null
    eIt.foreach { case (s, (d, w)) =>
      val q = hp.getPartition(d)
      bufS(q) += s; bufD(q) += d
      if (bufW != null) bufW(q) += w
    }

    val tiles = new Array[Tile](P)
    val dstVids = new Array[Array[Long]](P)
    var q = 0
    while (q < P) {
      val ss = bufS(q).result(); val dd = bufD(q).result()
      val ww = if (bufW != null) bufW(q).result() else null
      if (ss.nonEmpty) {
        val n = ss.length
        // deterministic tile layout: edges in ascending SOURCE-SLOT
        // order (slot fits an Int, so (slot<<32 | idx) sorts as one
        // primitive long — no boxed comparator). Per-destination sums
        // are then added in ascending-source order every compile; dst
        // order within a source row is irrelevant to the sums.
        val order = new Array[Long](n)
        var oi = 0
        while (oi < n) { order(oi) = (vidSlot.get(ss(oi)).toLong << 32) | oi; oi += 1 }
        java.util.Arrays.sort(order)
        // sorted distinct destination list → tile-local ids
        val distinct = dd.clone()
        java.util.Arrays.sort(distinct)
        var u = 0; var i = 1
        while (i < distinct.length) {
          if (distinct(i) != distinct(u)) { u += 1; distinct(u) = distinct(i) }
          i += 1
        }
        val tileDsts = java.util.Arrays.copyOf(distinct, u + 1)
        val dstIdx = new LongIntMap(tileDsts.length)
        var di = 0
        while (di < tileDsts.length) { dstIdx.put(tileDsts(di), di); di += 1 }

        val srcSlotsB = new scala.collection.mutable.ArrayBuilder.ofInt
        val offsetsB = new scala.collection.mutable.ArrayBuilder.ofInt
        val dstLocal = new Array[Int](n)
        val wOut = if (ww != null) new Array[Double](n) else null
        var lastSlot = -1
        var k = 0
        while (k < n) {
          val slot = (order(k) >>> 32).toInt
          val e = order(k).toInt
          if (slot != lastSlot) {
            srcSlotsB += slot
            offsetsB += k
            lastSlot = slot
          }
          dstLocal(k) = dstIdx.get(dd(e))
          if (wOut != null) wOut(k) = ww(e)
          k += 1
        }
        offsetsB += n
        tiles(q) = Tile(srcSlotsB.result(), offsetsB.result(), dstLocal, wOut, tileDsts.length)
        dstVids(q) = tileDsts
      }
      q += 1
    }
    (KernelPartition(vids, invDeg, tiles, inSlots = null), dstVids)
  }
}
