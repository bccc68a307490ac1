package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructType}

import graft.analytics._
import graft.etl.ChangeCapture
import graft.ext._
import graft.QueryCaches.Pinned
import graft.QueryHelpers._

/** Graph analytics over the purchase graph: PageRank, BFS, LPA,
  * k-core, triangle counting.
  *
  * Split from the monolithic Queries.scala (round 8); shared plan
  * helpers and oracle CTE builders live in [[QueryHelpers]]. Output
  * conventions (column naming, rounding, tiebreaks) are documented on
  * [[Queries]].
  */
private[graft] object QueriesGraph {

  val qs: Seq[Q] = Seq(

    Q("q89_pagerank",
      (s, dir) => {
        // Purchase-influence PageRank over the bipartite customer↔
        // supplier graph: 3 fixed rounds of fixed-point integer PageRank
        // (two key-partitioned shuffles per round, map-side-combined
        // contribution sums). The FULL rank vector hash-gates because
        // every step is exact long arithmetic — no float summation
        // order anywhere.
        GraphOps.pageRank(purchaseGraph(s, dir), iters = 3)
          .select(col("id").as("node_id"), col("pr").as("rank_fp"))
          .orderBy("node_id")
      },
      Some(pageRankOracleSql(3))),

    Q("q90_bfs_levels",
      (s, dir) => {
        // Minimum-hop BFS from the smallest node id, frontier-expanded
        // to depth 4: each round joins only the NEW frontier against the
        // edge list and anti-joins the visited set, so a node's level is
        // its first-discovery round. The oracle walks the same graph
        // with a depth-guarded recursive CTE and collapses to
        // min(level) — a wholly different evaluation strategy arriving
        // at the identical labeling. The labeling itself is the
        // session-memoized family artifact (QueryHelpers.bfs4 — round
        // 10: bfsLevels checkpoints every frontier, so plan-keyed
        // CacheManager reuse across repeat runs is gone; the
        // shared-frame store carries it instead, the kCore8 precedent).
        bfs4(s, dir)
          .select(col("id").as("node_id"), col("level"))
          .orderBy("node_id")
      },
      Some(s"""WITH RECURSIVE $purchaseGraphCtes,
             |s0 AS (SELECT min(src) AS id FROM edges),
             |b AS (
             |  SELECT id, 0 AS lvl FROM s0
             |  UNION
             |  SELECT e.dst, b.lvl + 1 FROM b JOIN edges e ON e.src = b.id
             |  WHERE b.lvl < 4)
             |SELECT id AS node_id, CAST(min(lvl) AS BIGINT) AS level
             |FROM b GROUP BY id ORDER BY node_id""".stripMargin)),

    Q("q132_triangle_count",
      (s, dir) => {
        // Triangle counting over the part co-purchase graph (parts
        // co-bought in >= 2 orders — the market-basket support floor
        // that keeps the graph REAL structure: one-off co-occurrences
        // are noise that made every part a near-clique neighbor, 1.2M
        // edges -> 36M wedges at sf0.1), by DEGREE-ORDERED edge
        // orientation: every edge points from its (degree, id)-smaller
        // endpoint to the larger, so each triangle is counted at
        // exactly one node and — the scale property — out-degree is
        // bounded by O(sqrt(m)) even for hub nodes, which caps the
        // wedge join that a naive adjacency self-join would blow up
        // on. Wedges probe the oriented edge set in one equi-join on
        // the (b,c) pair.
        val pairs = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val edges = pairs.as("x").join(pairs.as("y"), Seq("ok"))
          .filter(col("x.pk") < col("y.pk"))
          .groupBy(col("x.pk").as("u"), col("y.pk").as("v"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select("u", "v")
        val deg = edges.select(col("u").as("node"))
          .union(edges.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        val oriented = edges
          .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
          .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
          .select(
            when(col("du") < col("dv") ||
              (col("du") === col("dv") && col("u") < col("v")),
              struct(col("u").as("a"), col("v").as("b")))
            .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
          .pin()
        val wedges = oriented.as("e1").join(oriented.as("e2"), Seq("a"))
          .filter(col("e1.b") < col("e2.b"))
          .select(col("e1.b").as("w1"), col("e2.b").as("w2"))
        val tri = wedges.join(oriented,
          col("w1") === col("a") && col("w2") === col("b"))
        tri.agg(count(lit(1)).as("n_triangles"))
          .crossJoin(broadcast(oriented.agg(count(lit(1)).as("n_edges"))))
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
             |edges AS (
             |  SELECT x.pk AS u, y.pk AS v
             |  FROM pairs x JOIN pairs y ON x.ok = y.ok AND x.pk < y.pk
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |deg AS (
             |  SELECT node, count(*) AS deg FROM (
             |    SELECT u AS node FROM edges
             |    UNION ALL SELECT v AS node FROM edges) GROUP BY 1),
             |oriented AS (
             |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
             |      THEN u ELSE v END AS a,
             |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
             |      THEN v ELSE u END AS b
             |  FROM edges
             |  JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
             |wedges AS (
             |  SELECT e1.b AS w1, e2.b AS w2
             |  FROM oriented e1 JOIN oriented e2 ON e1.a = e2.a
             |  WHERE e1.b < e2.b)
             |SELECT CAST((SELECT count(*) FROM wedges w
             |    JOIN oriented o ON o.a = w.w1 AND o.b = w.w2) AS BIGINT)
             |  AS n_triangles,
             |  CAST((SELECT count(*) FROM oriented) AS BIGINT) AS n_edges""".stripMargin)),

    Q("q153_label_propagation",
      (s, dir) => {
        // Community detection on the bipartite customer↔supplier
        // purchase graph (the q89/q90 graph) via deterministic
        // synchronous label propagation — the third member of the graph
        // family (PageRank = centrality, BFS = reachability, LPA =
        // community structure). 4 fixed rounds; the self-vote damps
        // bipartite oscillation; ties go to the smallest label, so the
        // full per-node community vector hash-gates against the
        // unrolled oracle. Output attaches each node's final community
        // size (community-count-sized rollup joined back).
        // pinned: the community frame feeds BOTH the size rollup and the
        // join-back — unpinned, the whole 4-round propagation chain
        // executed twice (measured at sf0.1: cold single-shot ~20 s →
        // ~11.6 s with the pin; warm repeats 9.2 s → 1.4 s)
        val lp = GraphOps.labelPropagation(purchaseGraph(s, dir), iters = 4).pin()
        val sizes = lp.groupBy("community").agg(count(lit(1)).as("n_members"))
        lp.join(sizes, "community")
          .select(col("id").as("node_id"), col("community"), col("n_members"))
          .orderBy("node_id")
      },
      Some(lpaOracleSql(4))),

    Q("q189_kcore",
      (s, dir) => {
        // 8-core of the purchase graph — the sixth member of the graph
        // family (PageRank centrality, BFS reachability, CC/LPA
        // community, triangles cohesion, k-core ENGAGEMENT TIER): peel
        // nodes of degree < 8 for 4 fixed rounds (cascade included —
        // removing a hub demotes its neighbors), keeping the maximal
        // subgraph where every customer/supplier has ≥ 8 surviving
        // relationships. k = 8 peels a real fringe at every test scale
        // while leaving a non-empty core even on the sf0.001 smoke
        // graph (degrees ~10 there); the fixpoint lands within the 4
        // rounds at all three scales — the convergence evidence the
        // bounded-round contract asks for (the spec pins the worst
        // case on a path graph, which peels exactly 2 nodes/round).
        // Output is each core member with its IN-CORE degree, so the
        // oracle hash-gates the full peeled subgraph, not just a count.
        // The peel itself is the session-memoized family artifact
        // (QueryHelpers.kCore8 — iterative rounds checkpoint into
        // fresh RDDs, so CacheManager plan-keying can't share repeat
        // runs the way the other graph queries do; the shared-frame
        // store can).
        kCore8(s, dir)
          .orderBy("id")
      },
      Some(kcoreOracleSql(8, 4))),

    Q("q212_link_graph_rank",
      (s, dir) => {
        // HTML ingress feeding the GRAPH family: every doc is wrapped
        // in a page carrying two deterministic main-content links
        // (/doc/<7·id+3 mod 500>, single-quoted /doc/<13·id+11 mod
        // 500>) plus a nav /home link and — the load-bearing decoy — a
        // footer link to /doc/0 that passes the /doc filter: if chrome
        // survived to the harvest, every node's out-degree and every
        // rank would shift and the hash would break. extractLinks runs
        // after the chrome drop, so both vanish before harvest. Harvested hrefs filter to the /doc/<n> shape, edges
        // dedup (the two link formulas collide for id ≡ 82 mod 250),
        // and the SAME fixed-point PageRank that gates q89 runs 3
        // rounds over them; the oracle replays extraction with the
        // shared chain CTEs and the rank rounds with the SAME
        // generator (pageRankRoundsSql). Output: per-node out/in
        // degree + rank — the full link-graph profile.
        val docs = tp(s, dir, "documents")
        val html = concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title></head><body><nav><a href=\"/home\">home</a></nav>" +
            "<div id=\"main\"><p>See <a href=\"/doc/"),
          pmod(col("doc_id") * 7 + 3, lit(500)).cast("string"),
          lit("\">first</a> and <a href='/doc/"),
          pmod(col("doc_id") * 13 + 11, lit(500)).cast("string"),
          lit("'>second</a>.</p></div>" +
            "<footer><a href=\"/doc/0\">archive</a></footer></body></html>"))
        val edges = docs
          .select(col("doc_id").as("src"),
            explode(HtmlOps.extractLinks(html)).as("href"))
          .filter(col("href").rlike("^/doc/[0-9]+$"))
          .select(col("src"),
            regexp_extract(col("href"), "^/doc/([0-9]+)$", 1)
              .cast(LongType).as("dst"))
          .distinct()
          .pin()
        val ranks = GraphOps.pageRank(edges, iters = 3)
        val outDeg = edges.groupBy("src").agg(count(lit(1)).as("out_deg"))
        val inDeg = edges.groupBy("dst").agg(count(lit(1)).as("in_deg"))
        ranks
          .join(outDeg, ranks("id") === outDeg("src"))
          .join(inDeg, ranks("id") === inDeg("dst"), "left")
          .select(ranks("id").as("node_id"), col("out_deg"),
            coalesce(col("in_deg"), lit(0L)).as("in_deg"),
            col("pr").as("rank_fp"))
          .orderBy("node_id")
      },
      Some(s"""WITH hh AS (
             |  SELECT doc_id,
             |    '<html><head><title>Doc ' || doc_id::VARCHAR ||
             |    '</title></head><body><nav><a href="/home">home</a></nav>' ||
             |    '<div id="main"><p>See <a href="/doc/' ||
             |    ((doc_id * 7 + 3) % 500)::VARCHAR ||
             |    '">first</a> and <a href=''/doc/' ||
             |    ((doc_id * 13 + 11) % 500)::VARCHAR ||
             |    '''>second</a>.</p></div>' ||
             |    '<footer><a href="/doc/0">archive</a></footer></body></html>'
             |      AS html
             |  FROM documents),
             |hs AS MATERIALIZED (
             |  SELECT doc_id, ${HtmlOps.dropChainSql("html", main = true)} AS bodyhtml
             |  FROM hh),
             |lx AS (
             |  SELECT doc_id AS src, unnest(${HtmlOps.hrefListSql("bodyhtml")}) AS href
             |  FROM hs),
             |edges AS MATERIALIZED (
             |  SELECT DISTINCT src,
             |    CAST(regexp_extract(href, '^/doc/([0-9]+)$$', 1) AS BIGINT) AS dst
             |  FROM lx WHERE regexp_matches(href, '^/doc/[0-9]+$$')),
             |${pageRankRoundsSql(3)},
             |ind AS (SELECT dst, CAST(count(*) AS BIGINT) AS in_deg FROM edges GROUP BY 1)
             |SELECT r.id AS node_id,
             |  CAST(d.deg AS BIGINT) AS out_deg,
             |  COALESCE(i.in_deg, 0) AS in_deg,
             |  r.pr AS rank_fp
             |FROM r3 r
             |JOIN outdeg d ON d.src = r.id
             |LEFT JOIN ind i ON i.dst = r.id
             |ORDER BY node_id""".stripMargin)),
  )
}
