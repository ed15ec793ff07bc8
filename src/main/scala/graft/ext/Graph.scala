package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph connectivity for dedup clustering.
  *
  * The near-dup generators ([[Dedup.minhashLshPairs]], simhash, Jaccard,
  * embedding near-dup) emit PAIRS; an actual dedup needs CLUSTERS — a
  * doc near-dup with B which is near-dup with C must collapse with C
  * even if (A, C) itself was never emitted. That transitive closure is
  * connected components over the pair graph.
  *
  * Algorithm: hash-to-min label propagation with pointer jumping
  * ("Connected Components in MapReduce and Beyond", Kiveris et al.,
  * SoCC'14 — the min-label family). Each round:
  *
  *   1. neighbor-min — every node offers its current component label to
  *      each neighbor; labels relax to the min (one shuffle on node id);
  *   2. pointer jumping — `comp := comp(comp)` (one self-join on the
  *      label relation), which halves the length of any remaining label
  *      chain, so convergence is O(log d) rounds for diameter d, not
  *      O(d) as plain propagation would be.
  *
  * Scale posture: state per round is one (id, comp) row per node — far
  * smaller than the input corpus — and the edge relation is checkpointed
  * once and re-read each round. No collect(): the only driver-side value
  * is the per-round convergence count. Labels only ever decrease, so the
  * fixpoint (every node labeled with its component's min id) is
  * deterministic regardless of partitioning.
  */
object Graph {

  /** Connected components of an undirected graph given as an edge list.
    * Returns one row per node that appears in any edge: (id, comp) where
    * comp is the smallest node id in the component. Self-loops are
    * ignored; edges are treated as undirected.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // localCheckpoint blocks are freed by the ContextCleaner only
    // after a DRIVER GC proves the RDD unreachable — on a big heap that
    // can be "never", so each superseded round's blocks are unpersisted
    // EXPLICITLY the moment the next round is materialized. The
    // checkpoint is LAZY (eager = false): persist registration happens
    // synchronously at the call — that's what the id diff captures,
    // inside a JVM-wide lock held only for plan construction, never for
    // a Spark job — while the blocks themselves materialize at the
    // round's count() action, outside the lock. CAVEAT (unfixable at
    // the public-API level — RDD ids carry no ownership): a NON-graft
    // thread calling localCheckpoint on the same SparkContext inside
    // the (tiny) lock window would have its id mis-captured, and
    // unpersisting a checkpointed RDD is unrecoverable (the blocks ARE
    // the data once lineage is truncated). Callers sharing a session
    // with alien checkpointing threads should serialize externally.
    def checkpointed(df: DataFrame): (DataFrame, Set[Int]) =
      Graph.checkpointLock.synchronized {
        val pre = sc.getPersistentRDDs.keySet
        val out = df.localCheckpoint(eager = false)
        (out, sc.getPersistentRDDs.keySet.diff(pre).toSet)
      }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))

    val e = edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
    // undirected: keep both orientations so one join propagates both ways
    val (bidir, bidirIds) = checkpointed(
      e.union(e.select(col("d").as("s"), col("s").as("d")))
        .filter(col("s") =!= col("d"))
        .distinct()) // eager: scanned once, re-read every round
    // Initial labels fold the first relax in: comp = min(id, neighbors).
    // The plain id-labeled start would spend a whole round reaching this.
    var (lbl, lblIds) = checkpointed(
      bidir.groupBy(col("s").as("id"))
        .agg(least(min(col("d")), col("s")).as("comp")))
    // every label-generation checkpoint id currently persisted — ids
    // leave this set ONLY via free(), so a mid-round failure (e.g. the
    // count() aborting after the new round's checkpoint registered)
    // still frees everything in the finally
    var liveIds = lblIds
    var iter = 0
    var changed = 1L
    var converged = false
    try {
      while (changed > 0 && iter < maxIter) {
        val offers = bidir
          .join(lbl.withColumnRenamed("id", "s"), "s")
          .select(col("d").as("id"), col("comp"), lit(null).cast("long").as("__old"))
        // __old rides the round through (exactly one lbl row per id, so
        // max-ignoring-nulls recovers it) — convergence is then a filter
        // on the checkpointed output, not a second join against lbl
        val relaxed = lbl.select(col("id"), col("comp"), col("comp").as("__old"))
          .union(offers)
          .groupBy("id").agg(min("comp").as("comp"), max("__old").as("__old"))
        // every comp value is itself a node id, so the jump join is total
        val (jumped, jumpedIds) = checkpointed( // truncate lineage: consumed twice
          relaxed
            .join(
              relaxed.select(col("id").as("comp"), col("comp").as("__cc")),
              Seq("comp"))
            .select(col("id"), col("__cc").as("comp"), col("__old")))
        liveIds ++= jumpedIds
        changed = jumped.filter(col("comp") =!= col("__old")).count()
        free(lblIds) // previous round fully consumed — drop its blocks now
        liveIds --= lblIds
        lbl = jumped.select("id", "comp")
        lblIds = jumpedIds
        iter += 1
      }
      require(changed == 0,
        s"connectedComponents: no fixpoint after $maxIter rounds (graph diameter > 2^$maxIter?)")
      converged = true
      lbl
    } finally {
      // explicit-free invariant holds on error paths too: the edge
      // relation is always done with; label-generation blocks are kept
      // only when they back the returned fixpoint
      free(bidirIds)
      if (!converged) free(liveIds)
    }
  }

  /** Serializes the persistent-RDD id diff in [[connectedComponents]]
    * across graft threads (see the CAVEAT there).
    */
  private val checkpointLock = new Object
}
