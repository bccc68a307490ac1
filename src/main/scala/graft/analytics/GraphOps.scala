package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge-list DataFrames.
  *
  * Both operators here follow the same scale rules as
  * [[graft.ext.DedupOps.resolveClusters]]: the graph lives as a
  * distributed (src, dst) edge list, every iteration is a bounded number
  * of key-partitioned joins/aggregations, and nothing is ever collected
  * to the driver. Unlike connected components (unbounded rounds →
  * checkpoint per round), these run a FIXED small number of rounds, so
  * the lineage stays shallow and one terminal action evaluates the whole
  * chain — no checkpoint churn.
  *
  * Determinism: all rank arithmetic is fixed-point integer (`Long` with
  * truncating `div`), so results are bit-identical across engines,
  * cluster sizes and partitionings — summation of longs is exactly
  * associative/commutative, unlike doubles. This is what makes the
  * DuckDB oracle able to hash-gate the full rank vector.
  */
object GraphOps {

  /** Edge-count threshold above which [[bfsLevels]] pre-partitions its
    * cached edge list on `src`. BFS is the one operator in this family
    * whose per-round join partner (the frontier) is usually BROADCAST
    * at small scale — a broadcast-hash join streams the edge side with
    * no exchange at all, so pre-partitioning buys nothing and its build
    * shuffle is pure cost (measured at sf0.1, 1.17M edges: 4.4 s
    * partitioned vs 1.9 s not). Above this threshold frontiers stop
    * being broadcast-sized, the join becomes a shuffle join, and the
    * one build-time edge shuffle replaces `maxDepth` per-round edge
    * exchanges — the regime [[BfsPlanSpec]] pins (zero edge-side
    * exchanges in the expansion join). pageRank/labelPropagation keep
    * the unconditional pre-partition: their join partner is the FULL
    * node-sized rank/label frame every round, and the partitioned form
    * measured faster even at sf0.1 (q89 0.24 → 0.15 s). */
  val PrePartitionMinEdges: Long = 8L * 1000 * 1000

  /** PageRank with damping `dampNum/dampDen` for a fixed `iters` rounds
    * over a directed edge list (`src`, `dst` — Long node ids).
    *
    * rank₀(v) = scale;
    * rankᵢ(v) = (scale·(dampDen−dampNum)) div dampDen
    *          + (dampNum · Σ_{(u,v)∈E} rankᵢ₋₁(u) div outdeg(u)) div dampDen
    *
    * Per round: one shuffle on `src` (rank+degree lookup) and one on
    * `dst` (contribution sum, map-side combined) — the textbook
    * distributed PageRank data flow. Edges, degrees, and the node set
    * are persisted once and reused every round; rank frames are plain
    * lineage (fixed shallow depth). Dangling nodes (no out-edges)
    * contribute nothing — their mass leaks, which is deterministic and
    * mirrored exactly by the oracle.
    *
    * Returns (id, pr) with pr in fixed-point `scale` units. */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = 1000000L,
               dampNum: Long = 85L, dampDen: Long = 100L,
               release: Boolean = false): DataFrame = {
    // Persisted PRE-PARTITIONED on src: every round equi-joins the edge
    // frame on src, and a cached InMemoryRelation exposes its child's
    // HashPartitioning — so the per-round joins exchange only the
    // node-sized rank frame, never the edge list. One edge shuffle at
    // build time replaces `iters` of them.
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val teleport = (scale * (dampDen - dampNum)) / dampDen
    var ranks = nodes.withColumn("pr", lit(scale))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(outdeg, "src")
        .join(ranks.select(col("id").as("src"), col("pr")), "src")
        .select(col("dst").as("id"), expr("pr div deg").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr(s"($dampNum * coalesce(s, 0L)) div $dampDen")).as("pr"))
    }
    // The cached edge/degree/node frames stay registered by default:
    // Spark's CacheManager keys cache entries by analyzed-plan equality,
    // so repeated calls over the same input REUSE one entry apiece
    // rather than accumulating (measured: an eager-checkpoint-then-
    // unpersist variant cost ~4s extra per call at sf0.1 and forfeited
    // all cross-call reuse). Long-lived services calling over CHANGING
    // inputs pass release=true to get a materialized result and the
    // per-call caches back (graft.CachePolicy.finish).
    graft.CachePolicy.finish(release, Seq(e, outdeg, nodes))(ranks)
  }

  /** Multi-source BFS: minimum hop distance from any node in `sources`
    * (a one-column `id` frame), explored to `maxDepth`. Classic frontier
    * expansion — each round joins ONLY the newly discovered frontier
    * against the edge list (never the full visited set), dedups the
    * next frontier, and anti-joins the visited set so every node is
    * labeled with its first-discovery (= minimum) level. Frontiers are
    * persisted because each is referenced twice (expansion + union).
    *
    * EVERY round's frontier is checkpointed (lazy localCheckpoint — on
    * a cluster, reliable checkpoint), truncating its Catalyst plan to a
    * leaf: the kCore discipline. The truncation is load-bearing, not
    * cosmetic: the frontier's anti-join child embeds the visited set,
    * whose union plan embeds every previous frontier — with plain
    * persists the logical plan MULTIPLIES ~4× every round (trees, not
    * DAGs; persist caches data, never plans). Round 9 ran q90's
    * maxDepth-4 plan un-truncated under an 8-round compaction window
    * and the round-4 plan was already 50k explain lines / 1857 cache
    * scans — per-ACTION driver overhead (plan canonicalization for
    * cache lookup, listener explain strings) made fully-warm counts
    * cost seconds, and past depth ~10 analysis itself OOMs long before
    * data size matters. With per-round truncation the visited set is a
    * union of `depth` one-line leaves, so plans stay linear in depth
    * and never need compacting. The trade: checkpoint leaves are fresh
    * RDDs per call, so CacheManager plan-keyed reuse across repeated
    * calls is gone — repeat-heavy callers memoize the RESULT instead
    * ([[graft.QueryHelpers.bfs4]], the kCore8 precedent), which is both
    * faster (one cached scan) and partitioning-independent.
    * Nodes beyond `maxDepth` are absent from the result.
    *
    * Returns (id, level). */
  def bfsLevels(edges: DataFrame, sources: DataFrame, maxDepth: Int,
                release: Boolean = false,
                prePartitionMinEdges: Long = PrePartitionMinEdges): DataFrame = {
    // CONDITIONALLY pre-partitioned on src (see [[PrePartitionMinEdges]]):
    // the count doubles as the cache materialization the first frontier
    // join would otherwise pay, so the decision is exact and costs one
    // cached-scan job. In the large regime the raw cache is released
    // once the partitioned copy is materialized — at most one transient
    // second copy, only ever at the scale where MEMORY_AND_DISK spills
    // absorb it.
    val cast = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val eRaw = cast.persist(StorageLevel.MEMORY_AND_DISK)
    val e =
      if (eRaw.count() < prePartitionMinEdges) eRaw
      else {
        val ep = cast.repartition(col("src"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        ep.count()
        eRaw.unpersist(blocking = false)
        ep
      }
    val caches = scala.collection.mutable.Buffer[DataFrame](e)
    val ckFrames = scala.collection.mutable.Buffer[DataFrame]()
    var levels = sources.select(col("id").cast("long").as("id"))
      .distinct()
      .withColumn("level", lit(0L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    caches += levels
    var frontier = levels
    var depth = 0
    var exhausted = false
    while (depth < maxDepth && !exhausted) {
      depth += 1
      // lazy checkpoint: the count below is the materializing action,
      // so truncation adds no extra job. The count doubles as the
      // drain probe — on a small-diameter graph the remaining rounds
      // would each still cost a join + anti-join over the full edge
      // list for zero new nodes.
      val next = expandFrontier(frontier, e, levels, depth)
        .localCheckpoint(eager = false)
      ckFrames += next
      exhausted = next.count() == 0
      levels = levels.union(next)
      frontier = next
    }
    // caches stay registered by default — see the note in pageRank.
    // On release, the checkpoint blocks (which CacheManager does not
    // track — localCheckpoint persists at the RDD layer) are freed via
    // their LogicalRDD handles once the result is materialized.
    if (!release) levels
    else {
      val out = graft.CachePolicy.finish(release = true, caches.toSeq)(levels)
      ckFrames.foreach(_.queryExecution.logical.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
        case _ => ()
      })
      out
    }
  }

  /** One BFS round: expand `frontier` over `e`, dedup, anti-join the
    * visited set, label with `depth`. Extracted so [[BfsPlanSpec]] can
    * pin the large-regime plan shape — when `e` is cached
    * hash-partitioned on `src` and the frontier is not broadcastable,
    * the expansion join must exchange ONLY the frontier side.
    *
    * The frontier key is renamed before joining: the frontier's lineage
    * includes the edge frame itself (sources are derived from it), so
    * an attribute-based condition would be an ambiguous self-join. */
  private[graft] def expandFrontier(frontier: DataFrame, e: DataFrame,
                                    levels: DataFrame, depth: Int): DataFrame =
    frontier.select(col("id").as("fid"))
      .join(e, col("fid") === col("src"))
      .select(col("dst").as("id"))
      .distinct()
      .join(levels, Seq("id"), "left_anti")
      .withColumn("level", lit(depth.toLong))

  /** Synchronous label propagation (Raghavan et al. 2007) with a
    * self-vote: every node starts labeled with its own id; each round,
    * every node adopts the most frequent label among its neighbors PLUS
    * its own current label (one vote), ties broken toward the SMALLEST
    * label — fully deterministic, no randomized update order. The
    * self-vote damps the 2-coloring oscillation synchronous LPA
    * exhibits on bipartite graphs. A fixed `iters` (not
    * run-to-convergence) keeps the cost profile flat and the semantics
    * oracle-expressible by unrolling.
    *
    * Plan shape per round: one equi-join of the (cached) self-looped
    * edge list against the model-sized label frame, one
    * (node, label)-keyed count (map-side combined), and one
    * struct-max argmax per node — `max(struct(c, -label))` — so a
    * round is exactly two shuffles and never a window over unbounded
    * partitions. Plans stay tree-shaped but each round's plan embeds
    * only the previous round's (linear growth, like pageRank — no
    * compaction needed at the fixed small iteration counts this is
    * meant for).
    *
    * Returns (id, community). */
  def labelPropagation(edges: DataFrame, iters: Int,
                       release: Boolean = false): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // self-loops make the self-vote just another edge: one join per
    // round instead of a union-merge of neighbor counts with own labels.
    // Persisted PRE-PARTITIONED on src (the pageRank discipline): each
    // round's label join then exchanges only the node-sized label
    // frame — one edge shuffle at build time instead of `iters`.
    val es = e.union(nodes.select(col("id").as("src"), col("id").as("dst")))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.withColumn("lbl", col("id"))
    for (_ <- 1 to iters) {
      labels = es
        .join(labels.select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy("id")
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("lbl"))
    }
    graft.CachePolicy.finish(release, Seq(e, nodes, es))(
      labels.select(col("id"), col("lbl").as("community")))
  }

  /** k-core peeling for a FIXED number of rounds over an undirected
    * edge list (both directions present, as [[graft.Queries]]'
    * purchase graph provides): each round drops every node whose
    * current degree is below `k`, along with its edges; surviving
    * nodes' degrees shrink and the next round re-peels. After enough
    * rounds this is exactly the k-core (the maximal subgraph of
    * min-degree ≥ k); with bounded `rounds` it is the standard
    * bounded-peel approximation from the outside in — callers pin
    * convergence by checking that the last round removed nothing
    * (round count needed equals the graph's "peel depth", ≤ diameter;
    * a path graph of length 2R is the worst case, spec-pinned).
    *
    * Per round: ONE map-side-combined degree aggregation (node-sized
    * partials — the only shuffle), then the survivor set is BROADCAST
    * into two semi-joins, so the edge list is restricted in a single
    * narrow pass and never re-shuffles. The node set is structurally
    * ≪ the edge set (that asymmetry is why k-core is worth running),
    * so the broadcast is model-sized relative to the data; a graph
    * whose NODE list alone exceeds executor broadcast limits should
    * drop the two broadcast() hints and take shuffle semi-joins (the
    * ×100 rehearsal measured the broadcast form ~10× faster — the
    * shuffle form moved the 48M-row edge frame twice per round).
    * Survivor and edge frames are persisted per round and released at
    * the end ([[graft.CachePolicy]]); rounds are fixed and small, so
    * lineage stays shallow (the bounded-round contract above).
    *
    * Returns surviving (id, degree) — degree measured IN the core. */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
            release: Boolean = false): DataFrame = {
    var e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val caches = scala.collection.mutable.ArrayBuffer[DataFrame](e)
    // Per-round materialization (the BFS discipline): counting each
    // survivor set is the convergence probe AND forces the round's
    // caches incrementally, so no downstream stage ever re-derives an
    // earlier round. Survivor sets are NESTED (edges only shrink, so
    // degrees only shrink), so an unchanged COUNT means an unchanged
    // SET — the fixpoint — and remaining rounds are provable no-ops:
    // early exit is result-identical to running them (the ×100
    // rehearsal reaches the fixpoint in 2 of the 4 budgeted rounds).
    var prevKept = -1L
    var r = 0
    var stop = false
    // Plan compaction (the bfsLevels discipline): each round's edge
    // frame references the previous round's plan TWICE (directly and
    // via each keep semi-join), so the raw logical plan doubles per
    // round — at rounds ≥ ~6 the explain string alone (built per
    // action for the SQL listener) is exponential and OOMs the driver.
    // A lazy localCheckpoint every round truncates lineage to the
    // persisted blocks; the round's keep.count() materializes it, so
    // compaction adds no extra job. Checkpoint blocks are freed on
    // release via their LogicalRDD handles (CacheManager doesn't track
    // them), exactly as bfsLevels does.
    val ckFrames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (r < rounds && !stop) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("kid"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      caches += keep
      val kn = keep.count()
      if (kn == prevKept) stop = true
      else {
        e = e.join(broadcast(keep.withColumnRenamed("kid", "src")),
            Seq("src"), "left_semi")
          .join(broadcast(keep.withColumnRenamed("kid", "dst")),
            Seq("dst"), "left_semi")
          .select("src", "dst")
          .localCheckpoint(eager = false)
        ckFrames += e
        prevKept = kn
      }
      r += 1
    }
    val result = graft.CachePolicy.finish(release, caches.toSeq)(
      e.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree")))
    if (release) ckFrames.foreach(_.queryExecution.logical.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    })
    result
  }

  /** Duration-weighted mean of a fixed-point value per key: each
    * observation is weighted by the seconds until the key's NEXT
    * observation (the last one carries no weight — its duration is
    * unknown). One `lead` window + one aggregation, both on the same
    * key → a single shuffle. Returns exact-long sufficient sums
    * `(key, wsum, dsum)` — the caller performs the single portable
    * double division wsum/dsum (q92 does; keeping the division out of
    * here lets callers round for hash-gating first). */
  def timeWeightedAvg(df: DataFrame, key: Column, ts: Column, tie: Column,
                      valueFp: Column): DataFrame = {
    df.select(key.as("key"), ts.as("ts"), tie.as("tie"), valueFp.as("v"))
      .withColumn("dur", lead(col("ts"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))) - col("ts"))
      .filter(col("dur").isNotNull)
      .groupBy(col("key"))
      .agg(sum(col("v") * col("dur")).as("wsum"),
        sum(col("dur")).as("dsum"))
  }
}
