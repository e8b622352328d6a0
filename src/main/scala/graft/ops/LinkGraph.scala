package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Host-level link-graph centrality — the web-curation signal family.
  * Production pipelines rank hosts by link centrality before text-level
  * quality ever runs (Common Crawl publishes harmonic-centrality host
  * ranks; RefinedWeb and marginalia-style curation gate on them), so the
  * engine needs the iterative link-graph dataflow as a first-class op
  * alongside the iterative CC (qd6) and Lloyd k-means (qc1) loops.
  *
  * The corpus carries no links, so the host graph is PLANTED
  * deterministically from doc_id (the qu/qt22 discipline — the oracle
  * replays the construction verbatim and the hash gate covers the real
  * operator logic downstream): each document contributes one directed
  * edge src = doc_id mod 32, dst = (src*5 + 1 + doc_id mod 3) mod 32,
  * then edges dedup. Every node that appears has out-degree >= 1 by
  * construction (no dangling-mass handling needed), self-loops are kept
  * (real hosts self-link).
  */
object LinkGraph {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Observed-host table (host = doc_id % mod), materialized ONCE per op.
    * The only corpus-sized work in every qg operator is exactly this
    * scan + distinct; its result is bounded by `mod` rows. Before round 6,
    * each op re-derived it inside every edge branch and semi-join guard —
    * the qg7 profile measured 3.5 s building a ~70-edge list because the
    * union's branches re-scanned the corpus 6x (guide §1.2 step 1 /
    * §2.4: one pass, reuse the result). The eager checkpoint is
    * scale-legitimate for the same reason the final-round checkpoints are:
    * the host dimension is data-bounded (mod here; ~10^8 rows of longs on a
    * real webgraph — a node table, not a corpus).
    */
  private def observedHosts(spark: SparkSession, dir: String, mod: Int,
      name: String = "h"): DataFrame =
    docs(spark, dir).select((col("doc_id") % mod).as(name)).distinct()
      .localCheckpoint(true)

  /** qg1: k rounds of PageRank over the planted host graph, computed in
    * EXACT int64 fixed-point (the qc1/qs5 discipline) so Spark's
    * order-free partial aggregation and DuckDB's sequential sum agree bit
    * for bit: ranks start at 10^12 per host and each round applies
    * r'(v) = 15e10 + floor(85 * sum_{u->v} floor(r(u)/outdeg(u)) / 100)
    * — the damping-0.85 update with every division an integer floor (all
    * values positive, so Spark's truncating DIV == DuckDB's //). Mass is
    * bounded by hosts*10^12, far inside int64 at any host count.
    *
    * Scale shape: the per-round contribution step is one join of the
    * rank table against the edge list ON src (both shuffle on the same
    * key — exchange reuse across rounds) followed by a hash aggregate on
    * dst with map-side partials (a host with 10^8 in-links combines
    * before the shuffle); the node table re-attaches with a left join so
    * in-link-free hosts keep the teleport mass. ITERATIVE DATAFLOW
    * MATERIALIZES PER ROUND (the qd6 invariant): each round's rank table
    * is localCheckpoint(true)-ed and its predecessor released, so lineage
    * stays O(1) and nothing re-derives the base 2^k times. The edge list
    * (reused every round) is eagerly checkpointed once.
    */
  def hostPagerank(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val base = lit(150000000000L) // floor(0.15 * 10^12) teleport mass
    val edges = docs(spark, dir)
      .select((col("doc_id") % 32).as("src"),
        ((col("doc_id") % 32) * 5 + 1 + col("doc_id") % 3) % 32 as "dst")
      .distinct()
      .localCheckpoint(true)
    locally {
      // state-sized shuffle parallelism for the eager rank rounds
      // (IterTuning — the qg12 rationale)
      val eCount = edges.count() // sizes the rounds (list is already materialized)
      IterTuning.withStateSized(spark, eCount) {
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
        .localCheckpoint(true) // host-sized; outlives the finally, so the
      // final lazy join reads it instead of re-scanning the corpus
      val nodes = deg.select(col("src").as("node")).localCheckpoint(true)
      // degree-annotated edge list materialized ONCE (r6): leaving it lazy
      // re-ran the deg aggregate + join from the persisted edges inside
      // every round's job
      val withDeg = edges.join(deg, "src").localCheckpoint(true)
      // one PageRank update as a lazy transform — the rank table is
      // referenced exactly ONCE per round, so two rounds may chain between
      // materializations without any re-derivation blowup (the qd6 invariant
      // guards MULTI-reference rounds; a single-reference chain only deepens
      // the plan linearly). Materializing every second round halves the
      // per-round job+checkpoint overhead that dominates at small host
      // counts while keeping lineage O(1).
      def step(r: DataFrame): DataFrame = {
        val contrib = withDeg
          .join(r.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst"))
          .agg(sum(expr("r DIV od")).as("m"))
        nodes
          .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (base + coalesce(expr("85 * m DIV 100"), lit(0L))).as("r"))
      }
      // the FINAL round's checkpoint stays pinned because the returned
      // (lazy) DataFrame reads from it — unpersisting a lineage-truncated
      // checkpoint before the caller materializes would make the result
      // unrecomputable, not just slow
      var ranks = nodes.select(col("node"), lit(1000000000000L).as("r"))
        .localCheckpoint(true)
      var done = 0
      while (done < k) {
        val take = math.min(2, k - done)
        val next = (1 to take).foldLeft(ranks)((r, _) => step(r))
          .localCheckpoint(true)
        ranks = next
        done += take
      }
      ranks.join(deg.withColumnRenamed("src", "node"), "node")
        .select(col("node").as("host_id"), col("od").as("out_deg"),
          col("r").as("rank_fp"))
      }
    }
  }

  /** qg2: connected components over a planted host graph — the
    * domain-clustering leg of crawl curation (mirror farms and site
    * networks are removed per COMPONENT, not per host; Common Crawl's own
    * host-level dedup works on the host webgraph's components). The CC
    * core is [[graft.ops.Dedup.connectedComponents]] — pointer-jumping
    * min-label propagation, O(log diameter) rounds, throws on
    * non-convergence — reused unchanged; what qg2 adds is a graph whose
    * DIAMETER actually exercises it: the planted graph is four chains of
    * 9/11/25/19 hosts (edge h -> h+1 except at the community boundaries
    * {8, 19, 44, 63}, which self-loop), so the widest component has
    * diameter 24 and pointer jumping must fold it in ~5 rounds — the
    * worst-case shape for label propagation, where qd6's organic near-dup
    * clusters are shallow. The oracle recomputes reachability with a
    * recursive CTE (min reachable label), fully independent of the
    * pointer-jumping implementation.
    *
    * Output: one row per host: (host_id, component_id = component's min
    * host, component_size, is_root).
    */
  /** qg3: HyperBall neighborhood-function estimation (Boldi & Vigna 2013)
    * over the qg2 chain graph — the algorithm behind the harmonic-centrality
    * host ranks Common Crawl publishes. ball(v, 0) = HLL sketch of {v};
    * each round merges every node's ball with its neighbors' previous
    * balls, and because HLL union is REGISTER-WISE MAX, the merge is one
    * hash aggregate per round over the native hll_merge
    * TypedImperativeAggregate — map-side partials combine a high-in-degree
    * host's neighbor sketches before the shuffle, shipping one m-byte
    * state per key, which is the whole reason HyperBall scales to
    * 10^11-edge webgraphs on one machine in the paper. Per-round
    * materialization and edge-list persistence follow the qg1/qd6
    * iterative-dataflow invariant.
    *
    * Registers are pure integer math on the portable 60-bit md5 lane, so
    * the DuckDB oracle replays the ENTIRE iteration (init + `rounds`
    * unrolled merge rounds) register-for-register; the spec additionally
    * pins ball(v, r) == hll_sketch(exact BFS ball members) — union of
    * single-item sketches is exactly the max of their registers, so the
    * iterated sketch must equal the sketch of the set it claims to cover.
    *
    * Output: the final-round registers, exploded (host_id, bucket,
    * register) with zero registers included (the qt27 shape).
    */
  def hostHyperball(spark: SparkSession, dir: String, rounds: Int = 4,
      m: Int = 64): DataFrame = {
    import graft.functions.GraftFunctions
    // e0 derives from the ONE materialized host scan (one row per host, so
    // no distinct before the union — the post-union distinct covers both
    // orientations in a single exchange)
    val e0 = observedHosts(spark, dir, 64, "ch")
      .select(col("ch").as("a"),
        when(col("ch").isin(8L, 19L, 44L, 63L), col("ch"))
          .otherwise(col("ch") + 1).as("b"))
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .union(e0.select(col("b").as("src"), col("a").as("dst")))
      .distinct().localCheckpoint(true)
    locally {
      // state-sized shuffle parallelism for the eager merge rounds
      // (IterTuning — the qg12 rationale)
      val eCount = edges.count() // sizes the rounds (list is already materialized)
      IterTuning.withStateSized(spark, eCount) {
      // ball(v, 0): the sketch of {v} itself — one single-row group per host
      var ball = edges.select(col("src").as("node")).distinct()
        .groupBy(col("node"))
        .agg(GraftFunctions.hllSketch(col("node").cast("string"), m).as("sk"))
        .localCheckpoint(true)
      for (_ <- 1 to rounds) {
        val contrib = ball.union(
          edges.join(ball.withColumnRenamed("node", "src"), "src")
            .select(col("dst").as("node"), col("sk")))
        val next = contrib.groupBy(col("node"))
          .agg(GraftFunctions.hllMerge(col("sk"), m).as("sk"))
          .localCheckpoint(true)
        ball.unpersist() // predecessor released once successor materialized
        ball = next
      }
      ball
        .select(col("node").as("host_id"),
          posexplode(col("sk")).as(Seq("bucket", "register")))
        .select(col("host_id"), col("bucket").cast("int").as("bucket"),
          col("register").cast("int").as("register"))
      }
    }
  }

  /** qg4: harmonic centrality from HyperBall (Boldi & Vigna 2013 §6 — the
    * centrality behind Common Crawl's published host ranks): per host,
    * H(v) = sum_{r>=1} (N(v,r) - N(v,r-1)) / r with N(v,r) the HLL estimate
    * of |ball(v,r)| — [[hostHyperball]]'s iteration with the standard
    * estimator applied to every round's registers. One pass of the same
    * register-wise-max dataflow computes ALL radii at once; the estimate is
    * a pure function of the (already oracle-replayed) integer registers:
    * the 2^-register sum is carried as the EXACT int64 sum of
    * 2^(55-register) (<= 64 * 2^55 < 2^63 — no float-order ambiguity), the
    * m=64 alpha constant and the <= 2.5m linear-counting rule (m*ln(m/V)
    * when zero registers V > 0) evaluate in a pinned f64 tree, per-round
    * estimates round to 9 digits, and the harmonic sum folds radii in
    * ascending order — so the DuckDB oracle hash-matches the whole
    * centrality, not an epsilon of it.
    */
  def hostHarmonic(spark: SparkSession, dir: String, rounds: Int = 4,
      m: Int = 64): DataFrame = {
    val joined = hyperballRoundEstimates(spark, dir, rounds, m)
    // ascending-radius left-associated fold, the order the oracle replays
    val harmonic = (1 to rounds)
      .map(r => (col(s"e$r") - col(s"e${r - 1}")) / lit(r.toDouble))
      .reduce(_ + _)
    joined.select(col("node").as("host_id"),
      round(col(s"e$rounds"), 6).as("reach_est"),
      round(harmonic, 6).as("harmonic"))
  }

  /** Shared qg4/qg10 chain: the qg3 register iteration with the pinned
    * per-round HLL estimate applied after every merge round — returns one
    * row per host with columns (node, e0..e`rounds`), each e_r the
    * 9-digit-rounded estimate of |ball(node, r)|.
    */
  private def hyperballRoundEstimates(spark: SparkSession, dir: String,
      rounds: Int, m: Int): DataFrame = {
    require(m == 64, "estimate constants are pinned for m = 64")
    import graft.functions.GraftFunctions
    val cNum = 0.709 * m * m * math.pow(2.0, 55) // alpha_64 * m^2 * 2^55
    def estOf(ball: DataFrame, r: Int): DataFrame =
      ball.select(col("node"),
        size(filter(col("sk"), x => x === 0)).cast("long").as("v"),
        expr("aggregate(sk, CAST(0 AS BIGINT), " +
          "(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), 55 - r))").as("s2"))
        .withColumn("raw", lit(cNum) / col("s2"))
        .select(col("node"),
          round(when(col("raw") <= lit(2.5 * m) && col("v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
            .otherwise(col("raw")), 9).as(s"e$r"))
        .localCheckpoint(true) // 64 rows; lets the source ball release
    // e0 from the ONE materialized host scan (see observedHosts); one row
    // per host, so the single post-union distinct suffices
    val e0 = observedHosts(spark, dir, 64, "ch")
      .select(col("ch").as("a"),
        when(col("ch").isin(8L, 19L, 44L, 63L), col("ch"))
          .otherwise(col("ch") + 1).as("b"))
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .union(e0.select(col("b").as("src"), col("a").as("dst")))
      .distinct().localCheckpoint(true)
    locally {
      val eCount = edges.count()
      IterTuning.withStateSized(spark, eCount) {
      var ball = edges.select(col("src").as("node")).distinct()
        .groupBy(col("node"))
        .agg(GraftFunctions.hllSketch(col("node").cast("string"), m).as("sk"))
        .localCheckpoint(true)
      var ests = Vector(estOf(ball, 0))
      for (r <- 1 to rounds) {
        val contrib = ball.union(
          edges.join(ball.withColumnRenamed("node", "src"), "src")
            .select(col("dst").as("node"), col("sk")))
        val next = contrib.groupBy(col("node"))
          .agg(GraftFunctions.hllMerge(col("sk"), m).as("sk"))
          .localCheckpoint(true)
        ests = ests :+ estOf(next, r)
        ball.unpersist()
        ball = next
      }
      ball.unpersist()
      ests.reduce(_.join(_, Seq("node")))
      }
    }
  }

  /** qg10: the graph-wide NEIGHBORHOOD FUNCTION and effective diameter —
    * HyperANF's headline output (Boldi, Rosa & Vigna 2011; Palmer et al.
    * 2002's ANF): NF(r) = sum_v |ball(v, r)| estimates the number of
    * reachable pairs within distance r, and the effective diameter at
    * q = 0.9 is the interpolated radius where the cumulative function
    * first covers q * NF(rmax) — the statistic that put "the web is a
    * small world" on one number, and the capacity-planning input for any
    * BFS-bounded crawl frontier. Reuses the fully-oracled qg3/qg4 register
    * chain; the global per-round sum folds the 64 9-digit host estimates
    * in SORTED order (the qt16 order-pinned f64 discipline, collect_list →
    * array_sort → left fold), the q-crossing is unique because the
    * chain-graph estimates sit on the always-linear-counting branch
    * (registers only grow ⇒ zero-count v only shrinks ⇒ e_r monotone),
    * and the interpolation is one pinned f64 division — so NF, the
    * per-radius fractions, AND the interpolated diameter all hash-match.
    *
    * Output: one row per radius 0..rounds: (radius, nf_est, frac of
    * NF(rmax), eff_diameter as a constant column). The heavy work is the
    * distributed register iteration; this summary is a 1-row reduction.
    */
  def hostNeighborhood(spark: SparkSession, dir: String, rounds: Int = 4,
      m: Int = 64, q: Double = 0.9): DataFrame = {
    val joined = hyperballRoundEstimates(spark, dir, rounds, m)
    val nfCols = (0 to rounds).map { r =>
      expr(s"aggregate(array_sort(collect_list(e$r)), CAST(0 AS DOUBLE), " +
        "(acc, x) -> acc + x)").as(s"nf$r")
    }
    val one = joined.agg(nfCols.head, nfCols.tail: _*)
    val target = col(s"nf$rounds") * lit(q)
    // smallest radius whose cumulative NF covers the target, linearly
    // interpolated inside the crossing step (the HyperANF convention);
    // rounds is a fixed parameter, so the when-chain depth is O(1)
    var eff: Column = lit(rounds.toDouble)
    for (r <- rounds to 1 by -1)
      eff = when(col(s"nf${r - 1}") < target && col(s"nf$r") >= target,
        lit((r - 1).toDouble) +
          (target - col(s"nf${r - 1}")) / (col(s"nf$r") - col(s"nf${r - 1}")))
        .otherwise(eff)
    eff = when(col("nf0") >= target, lit(0.0)).otherwise(eff)
    val rows = (0 to rounds).map(r =>
      struct(lit(r.toLong).as("radius"), col(s"nf$r").as("nf")))
    one.select(explode(array(rows: _*)).as("s"),
        col(s"nf$rounds").as("nfmax"), eff.as("eff"))
      .select(col("s.radius").as("radius"),
        round(col("s.nf"), 6).as("nf_est"),
        round(col("s.nf") / col("nfmax"), 6).as("frac"),
        round(col("eff"), 6).as("eff_diameter"))
  }

  /** qg5: per-host triangle counts + local clustering coefficient via
    * DEGREE-ORDERED edge orientation (Schank & Wagner 2005; the
    * Suri–Vassilvitskii MapReduce formulation) — the spam/community signal
    * webgraph curation uses alongside centrality (link farms show extreme
    * clustering). Each undirected edge is oriented from the lower to the
    * higher endpoint under the total order key deg*100 + id, wedges form
    * by self-joining oriented edges on their source, and a wedge (v, w)
    * closes iff the oriented edge v->w exists — so every triangle is
    * counted exactly once, at its lowest-order vertex.
    *
    * Scale shape: orientation caps every node's oriented out-degree at
    * O(sqrt(m)), so the wedge self-join generates O(m^{3/2}) candidates
    * total instead of sum(deg^2) — the reason this exact plan runs on
    * 10^11-edge webgraphs. Three hash joins on vertex keys, no windows,
    * no driver-side state; per-host counts aggregate map-side after a
    * 3-row explode per triangle.
    *
    * The planted graph (same qu/qg discipline — the oracle replays the
    * construction verbatim): each host h gets undirected edges to
    * (h+1) % 64 and (h+2) % 64, and every 8th host also to (h+4) % 64 —
    * 64 {h, h+1, h+2} triangles plus 8 {h, h+2, h+4} closures, so per-host
    * counts vary (3 or 4) and coefficients exercise both branches.
    */
  def hostTriangles(spark: SparkSession, dir: String): DataFrame = {
    val hosts = observedHosts(spark, dir, 64)
    val raw = hosts.select(col("h").as("a"), ((col("h") + 1) % 64).as("b"))
      .union(hosts.select(col("h").as("a"), ((col("h") + 2) % 64).as("b")))
      .union(hosts.filter(col("h") % 8 === 0)
        .select(col("h").as("a"), ((col("h") + 4) % 64).as("b")))
    val und = raw
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("n"))
      .union(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withK = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"),
        (col("da") * 100 + col("a")).as("ka"),
        (col("db") * 100 + col("b")).as("kb"))
    val ord = withK.select(
      when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("u"),
      when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("v"),
      greatest(col("ka"), col("kb")).as("kv"))
    val wedge = ord.select(col("u"), col("v").as("v1"), col("kv").as("kv1"))
      .join(ord.select(col("u"), col("v").as("v2"), col("kv").as("kv2")), "u")
      .filter(col("kv1") < col("kv2"))
    val tri = wedge
      .join(ord.select(col("u").as("v1"), col("v").as("v2")), Seq("v1", "v2"))
      .select(col("u").as("h0"), col("v1").as("h1"), col("v2").as("h2"))
    val cnt = tri
      .select(explode(array(col("h0"), col("h1"), col("h2"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("c"))
    deg.join(cnt, Seq("n"), "left")
      .select(col("n").as("host_id"),
        col("d").cast("long").as("degree"),
        coalesce(col("c"), lit(0L)).as("triangles"),
        round(when(col("d") >= 2,
          lit(2.0) * coalesce(col("c"), lit(0L)) / (col("d") * (col("d") - 1)))
          .otherwise(lit(0.0)), 6).as("clustering_coeff"))
  }

  def hostComponents(spark: SparkSession, dir: String,
      maxRounds: Int = 16): DataFrame = {
    // one row per observed host (doc_a = ch is unique), so no distinct needed
    val edges = observedHosts(spark, dir, 64, "ch")
      .select(col("ch").as("doc_a"),
        when(col("ch").isin(8L, 19L, 44L, 63L), col("ch"))
          .otherwise(col("ch") + 1).as("doc_b"))
    val labels = Dedup.connectedComponents(edges, maxRounds)
    val sizes = labels.groupBy(col("label").as("component_id"))
      .agg(count(lit(1)).as("component_size"))
    labels.select(col("doc_id").as("host_id"), col("label").as("component_id"))
      .join(sizes, Seq("component_id"))
      .select(col("host_id"), col("component_id"), col("component_size"),
        (col("host_id") === col("component_id")).as("is_root"))
  }

  /** qg6: community detection via deterministic synchronous LABEL
    * PROPAGATION (Raghavan et al. 2007) over a planted host graph with real
    * community structure — the mirror-farm / site-network grouping signal
    * crawl curation removes per COMMUNITY (denser than the per-component
    * grouping qg2 gives when bridges exist). Unlike classic LPA's random
    * tie-breaks, every step here is pinned so the DuckDB oracle can replay
    * it: each round every node adopts the most frequent label among its
    * IN-neighbors (self-loop included, so isolated nodes and local minima
    * keep their label), ties broken toward the SMALLEST label — both facts
    * encoded in one order-preserving int64 vote key
    * `count * 2^20 + (2^20 - 1 - label)` whose MAX is taken in a plain hash
    * aggregate (the qu3 keeper-key discipline; no Window, no struct
    * aggregate).
    *
    * The planted graph: 4 blocks of 16 hosts (host = doc_id % 64), each
    * block a directed ring (both directions) plus a +5 chord — dense enough
    * that the block minimum floods in O(log block) rounds — and one
    * DOWNWARD bridge per boundary (block b's head votes on block b-1's
    * tail). Bridges carry only higher labels into lower blocks, where they
    * lose both the frequency and the tie-break vote, so after `k` rounds
    * every block converges to its own minimum — communities, not the single
    * global component qg2's min-label flood would produce (the spec pins
    * exactly that distinction).
    *
    * Scale shape (the qg1 iterative-dataflow invariant): the per-round vote
    * is one join of the label table against the edge list ON src (exchange
    * reuse across rounds) + two hash aggregates with map-side partials — a
    * 10^8-in-degree host combines its votes before the shuffle; per-round
    * localCheckpoint(true) with predecessor release keeps lineage O(1).
    *
    * Output: (host_id, community_id = converged label, community_size).
    */
  def hostCommunities(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    // materialized once: six branches below (plus the semi-join guard) read
    // it, and before round 6 each re-scanned the corpus (see observedHosts)
    val hosts = observedHosts(spark, dir, 64)
    def intra(off: Int) = hosts.select(col("h").as("src"),
      (col("h") - col("h") % 16 + (col("h") % 16 + off) % 16).as("dst"))
    val edges = intra(1)
      .union(intra(15))
      .union(intra(5))
      .union(hosts.select(col("h").as("src"), col("h").as("dst"))) // self-loop
      .union(hosts.filter(col("h") % 16 === 0 && col("h") > 0)
        .select(col("h").as("src"), (col("h") - 1).as("dst")))
      .distinct()
      // the graph is over OBSERVED hosts: drop edges into hosts the corpus
      // never produced (the qg1 non-source-contribution discipline), so a
      // partial corpus can't mint phantom vote targets
      .join(hosts.withColumnRenamed("h", "dst"), Seq("dst"), "left_semi")
      .localCheckpoint(true)
    locally {
      // state-sized shuffle parallelism for the eager vote rounds
      // (IterTuning — the qg12 rationale)
      val eCount = edges.count() // sizes the rounds (list is already materialized)
      IterTuning.withStateSized(spark, eCount) {
      // one synchronous vote round as a lazy transform; the label table is
      // referenced exactly ONCE per round, so two rounds chain per
      // materialization with zero re-derivation (the qg1 r6 rationale —
      // halve the checkpoint-job overhead, lineage stays O(1))
      def vote(l: DataFrame): DataFrame = edges
        .join(l.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(col("c") * lit(1048576L) + (lit(1048575L) - col("label")))
          .as("vk"))
        .select(col("dst").as("node"),
          (lit(1048575L) - (col("vk") % lit(1048576L))).as("label"))
      var labels = hosts.select(col("h").as("node"), col("h").cast("long").as("label"))
        .localCheckpoint(true)
      var done = 0
      while (done < k) {
        val take = math.min(2, k - done)
        labels = (1 to take).foldLeft(labels)((l, _) => vote(l))
          .localCheckpoint(true)
        done += take
      }
      val sizes = labels.groupBy(col("label"))
        .agg(count(lit(1)).as("community_size"))
      labels.join(sizes, Seq("label"))
        .select(col("node").as("host_id"), col("label").as("community_id"),
          col("community_size"))
      }
    }
  }

  /** qg7: k-CORE decomposition by synchronous degree peeling (Seidman 1983;
    * the Batagelj-Zaveršnik cores) — the webgraph density signal spam/link-farm
    * filters gate on: a host survives the k-core iff it keeps ≥ k neighbors
    * among SURVIVORS, so chains, pendants and sparsely-attached spam halos
    * peel away while genuinely dense cores (mutual-link communities) remain.
    * Each round drops every alive host with alive-degree < k and repeats to
    * the fixpoint — the standard distributed formulation (one Pregel
    * superstep per peel wave).
    *
    * The planted graph (host = doc_id % 32, restricted to observed hosts,
    * undirected): a 6-clique {0..5}, a 15-edge path 5-6-…-20 hanging off the
    * clique, a 9-cycle {21..29}, and a pendant pair 30-31. At k=2 the path
    * peels ONE NODE PER ROUND from the free end (interior degree stays 2
    * until a neighbor goes) — the genuine peel cascade, ~15 waves — while
    * the cycle (every 2-core contains its cycles) and the clique survive;
    * the pendant pair vanishes in wave 1.
    *
    * Scale shape (the qd6/qg1 iterative-dataflow invariant): per round two
    * left-semi joins of the persisted both-direction edge list against the
    * shrinking alive set + one hash aggregate with map-side partials;
    * per-round localCheckpoint(true) with predecessor release; alive only
    * shrinks, so count equality IS set equality and the loop THROWS past
    * `maxRounds` (non-convergence is impossible for peeling — the bound
    * guards a mis-planted graph). Rounds = peel depth, the same bound the
    * distributed coreness literature accepts.
    *
    * Output: one row per k-core member — (host_id, core_deg = its degree
    * within the core). The DuckDB oracle unrolls the waves as a CTE chain
    * (idempotent past the fixpoint, so a fixed unroll length replays the
    * convergence-based loop exactly).
    */
  def hostKcore(spark: SparkSession, dir: String, k: Int = 2,
      maxRounds: Int = 24): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    // materialized once: four edge branches + two semi-join guards read it
    // (before round 6 each branch re-scanned the corpus — measured 3.5 s to
    // build this ~70-edge list; see observedHosts)
    val hosts = observedHosts(spark, dir, 32)
    val clique = hosts.filter(col("h") <= 4)
      .select(col("h").as("src"),
        explode(sequence(col("h") + 1, lit(5L))).as("dst"))
    val path = hosts.filter(col("h").between(5, 19))
      .select(col("h").as("src"), (col("h") + 1).as("dst"))
    val cycle = hosts.filter(col("h").between(21, 29))
      .select(col("h").as("src"),
        when(col("h") === 29, lit(21L)).otherwise(col("h") + 1).as("dst"))
    val pair = hosts.filter(col("h") === 30)
      .select(col("h").as("src"), lit(31L).as("dst"))
    // graph over OBSERVED hosts only (the qg6 discipline): both endpoints
    // must exist in the corpus, so a partial corpus can't mint phantom nodes.
    // ONE distinct after the both-orientation union (no self-loops and no
    // reversed duplicates in the raw branches, so this equals the old
    // distinct-then-mirror set) — a single exchange whose AQE-coalesced
    // output keeps every per-round peel stage at a handful of tasks instead
    // of the 64 union partitions the old shape carried into all 16 waves
    val raw = clique.union(path).union(cycle).union(pair)
      .join(hosts.withColumnRenamed("h", "src"), Seq("src"), "left_semi")
      .join(hosts.withColumnRenamed("h", "dst"), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    val eb = raw
      .union(raw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    locally {
      // state-sized shuffle parallelism for the eager peel waves
      // (IterTuning — the qg12 rationale)
      val ebCount = eb.count() // sizes the rounds (list is already materialized)
      IterTuning.withStateSized(spark, ebCount) {
      // one synchronous peel wave per materialization. (r6 note: chaining
      // two waves per checkpoint was tried and MEASURED SLOWER — the wave
      // references its input twice, so the batched plan pays a bounded 2x
      // re-derivation plus larger per-job AQE planning, which outweighed
      // the saved checkpoint+count jobs: 2.9 s -> 3.8 s. Kept single-step.)
      def wave(a: DataFrame): DataFrame = eb
        .join(a.withColumnRenamed("v", "src"), Seq("src"), "left_semi")
        .join(a.withColumnRenamed("v", "dst"), Seq("dst"), "left_semi")
        .groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("v")
      var alive = hosts.select(col("h").as("v")).localCheckpoint(true)
      var n = alive.count()
      var converged = false
      var round = 0
      while (!converged) {
        round += 1
        require(round <= maxRounds,
          s"k-core peeling did not converge in $maxRounds rounds")
        val next = wave(alive).localCheckpoint(true)
        val m = next.count()
        alive.unpersist()
        alive = next
        converged = m == n
        n = m
      }
      // final core degrees; the last checkpoint stays pinned because the
      // returned lazy DataFrame reads from it (the qg1 discipline)
      eb.join(alive.withColumnRenamed("v", "src"), Seq("src"), "left_semi")
        .join(alive.withColumnRenamed("v", "dst"), Seq("dst"), "left_semi")
        .groupBy(col("src").as("host_id")).agg(count(lit(1)).as("core_deg"))
      }
    }
  }

  /** qg8: HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) over the
    * qg1 planted host graph — the two-score decomposition link-spam and
    * seed-list curation use beside PageRank's single score: a good HUB
    * links to many good authorities, a good AUTHORITY is linked from many
    * good hubs. Per round the mutual updates
    *   a_t(v) = sum over u->v of h_{t-1}(u)   (join on src, hash agg on dst)
    *   h_t(v) = sum over v->w of a_t(w)       (join on dst, hash agg on src)
    * are each ONE shuffle with map-side partials — a 10^8-in-link host
    * combines before the exchange, exactly qg1's contribution shape.
    *
    * HITS' float L2 normalization is replaced by INTEGER MAX-RESCALING:
    * after each half-update every score floor-divides by
    * s = max(1, max(score) DIV 10^6), so scores stay in a ~[10^6, 2^6*10^6)
    * band regardless of host count or degree — bounded int64 at ANY corpus
    * scale — while the ORDER (the only thing HITS consumers use; the
    * eigenvector is defined up to scale) is preserved: floor by a common
    * positive divisor is monotone (it can merge near-ties, the documented
    * trade for bit-reproducibility). All math is integer floor division on
    * positives (Spark DIV == DuckDB //), so the unrolled DuckDB oracle
    * replays every round bit for bit. The rescale scalar attaches by
    * crossJoin against a broadcast 1-row aggregate (the N/V/max_id
    * discipline) — no driver collect in the loop.
    *
    * Iterative-dataflow invariant (qd6/qg1): per-round
    * localCheckpoint(true) with predecessor release; the reused edge list
    * and node table checkpoint once (the final a/h checkpoints stay
    * pinned — the returned lazy DataFrame reads them).
    *
    * Output: (host_id, auth_fp, hub_fp) after k rounds.
    */
  def hostHits(spark: SparkSession, dir: String, k: Int = 4): DataFrame = {
    // the ONE corpus scan, materialized: nodes and the semi-join guard below
    // both read it (bounded by the planted pattern — an edge table, not a
    // corpus; the observedHosts rationale)
    val edges0 = docs(spark, dir)
      .select((col("doc_id") % 32).as("src"),
        ((col("doc_id") % 32) * 5 + 1 + col("doc_id") % 3) % 32 as "dst")
      .distinct()
      .localCheckpoint(true)
    val nodes = edges0.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    // graph over OBSERVED hosts (the qg6 discipline): a partial corpus
    // cannot mint authority targets it never crawled as hosts
    val edges = edges0
      .join(nodes.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .select(col("src"), col("dst")).localCheckpoint(true)
    locally {
      // state-sized shuffle parallelism for the eager half-update rounds
      // (IterTuning — the qg12 rationale)
      val eCount = edges.count() // sizes the rounds (tables are already materialized)
      IterTuning.withStateSized(spark, eCount) {
      // one half-update: sum `prevCol` of `prev` over edges joined on
      // `joinKey`, grouped to `groupKey`, re-attached to the full node
      // table (in-link-free hosts keep 0), then max-rescaled
      def halfUpdate(prev: DataFrame, prevCol: String, joinKey: String,
          groupKey: String, outCol: String): DataFrame = {
        // checkpoint the UNSCALED sums: the rescale scalar and the rescaled
        // output below both read `raw`, and leaving it lazy made every
        // half-update evaluate the join+aggregate twice (once under the
        // broadcast build, once under the crossJoin — guide §2.4). The
        // rescale itself stays lazy: it is a map-only projection over the
        // checkpoint, referenced once per round, so lineage stays O(1).
        val raw = nodes.join(
          edges.join(prev.withColumnRenamed("node", joinKey), joinKey)
            .groupBy(col(groupKey).as("node")).agg(sum(col(prevCol)).as("raw")),
          Seq("node"), "left")
          .select(col("node"), coalesce(col("raw"), lit(0L)).as("raw"))
          .localCheckpoint(true)
        val s = raw.agg(greatest(expr("max(raw) DIV 1000000"), lit(1L)).as("s"))
        raw.crossJoin(broadcast(s))
          .select(col("node"), expr("raw DIV s").as(outCol))
      }
      var hub = nodes.select(col("node"), lit(1000000L).as("h"))
        .localCheckpoint(true)
      var auth: DataFrame = null
      for (_ <- 1 to k) {
        val nextAuth = halfUpdate(hub, "h", "src", "dst", "a")
        if (auth != null) auth.unpersist()
        auth = nextAuth
        val nextHub = halfUpdate(auth, "a", "dst", "src", "h")
        hub.unpersist()
        hub = nextHub
      }
      auth.join(hub, "node")
        .select(col("node").as("host_id"), col("a").as("auth_fp"),
          col("h").as("hub_fp"))
      }
    }
  }

  /** qg11: PERSONALIZED PageRank from a seed host set (Haveliwala 2002;
    * the push-style topic-sensitive variant webtext curation runs to
    * expand a curated seed list — "rank every host by its link proximity
    * to the seeds", the signal behind seed-based quality corpora like
    * OH-LTR/marginalia whitelist expansion). Same planted directed host
    * graph and EXACT int64 fixed-point as qg1, but the teleport mass
    * lands ONLY on the seeds: seeds S = {1, 9, 17} ∩ observed hosts,
    *   r_0(v)  = [v ∈ S] * 10^12
    *   r_t(v)  = [v ∈ S] * 15e10
    *           + floor(85 * sum_{u->v} floor(r_{t-1}(u) / outdeg(u)) / 100)
    * — every division an integer floor on positives (Spark DIV == DuckDB
    * //), so the unrolled oracle replays each round bit for bit. After k
    * rounds, hosts unreachable from the seeds hold rank 0 (the measurable
    * "outside the seed neighborhood" class).
    *
    * Scale shape is qg1's verbatim: one rank-against-edges join ON src
    * per round (exchange reuse), hash aggregate on dst with map-side
    * partials, node table re-attach so contribution-free hosts keep
    * their teleport term; per-round localCheckpoint(true) with
    * predecessor release, reused edge list checkpointed once (the qd6
    * iterative-dataflow invariant).
    *
    * Output: (host_id, is_seed, rank_fp).
    */
  def hostSeedPagerank(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val edges = docs(spark, dir)
      .select((col("doc_id") % 32).as("src"),
        ((col("doc_id") % 32) * 5 + 1 + col("doc_id") % 3) % 32 as "dst")
      .distinct()
      .localCheckpoint(true)
    locally {
      // state-sized shuffle parallelism for the eager rank rounds
      // (IterTuning — the qg12 rationale)
      val eCount = edges.count() // sizes the rounds (list is already materialized)
      IterTuning.withStateSized(spark, eCount) {
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
      // host-sized checkpoint: outlives the finally, so the final lazy join
      // reads it instead of re-scanning the corpus (the qg1 r6 rationale)
      val nodes = deg.select(col("src").as("node"),
        col("src").isin(1L, 9L, 17L).as("is_seed")).localCheckpoint(true)
      // degree-annotated edge list materialized ONCE (r6, the qg1 rationale)
      val withDeg = edges.join(deg, "src").localCheckpoint(true)
      val teleport = when(col("is_seed"), lit(150000000000L)).otherwise(lit(0L))
      // one update as a lazy transform; the rank table is referenced ONCE
      // per round, so two rounds chain per materialization (the qg1 r6
      // rationale: halve the checkpoint-job overhead, lineage stays O(1))
      def step(r: DataFrame): DataFrame = {
        val contrib = withDeg
          .join(r.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst"))
          .agg(sum(expr("r DIV od")).as("m"))
        nodes
          .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (teleport + coalesce(expr("85 * m DIV 100"), lit(0L))).as("r"))
      }
      var ranks = nodes.select(col("node"),
        when(col("is_seed"), lit(1000000000000L)).otherwise(lit(0L)).as("r"))
        .localCheckpoint(true)
      var done = 0
      while (done < k) {
        val take = math.min(2, k - done)
        ranks = (1 to take).foldLeft(ranks)((r, _) => step(r))
          .localCheckpoint(true)
        done += take
      }
      ranks.join(nodes, "node")
        .select(col("node").as("host_id"), col("is_seed"), col("r").as("rank_fp"))
      }
    }
  }

  /** qg9: host-graph MIXING metrics — edge reciprocity and degree
    * assortativity (Newman 2002, PRL 89.208701), the two structural-health
    * numbers crawl curation reads before trusting a link graph: organic
    * webgraphs are weakly reciprocal and DISassortative (high-degree hubs
    * link to low-degree leaves, r < 0), while link farms and mirror
    * networks read near-perfect reciprocity and assortative cores. Over
    * the qg1 planted directed host graph (observed hosts only):
    *   - reciprocity  = reciprocated non-self directed edges / non-self
    *                    directed edges (self-loops counted separately —
    *                    they are trivially reciprocal)
    *   - assortativity = Pearson correlation of undirected endpoint
    *                    degrees over the symmetrized edge list (each
    *                    undirected edge contributes both orientations, so
    *                    Newman's formula reduces to
    *                    (m·Σxy − Sx²) / (m·Σx² − Sx²)); NULL for a
    *                    degree-regular graph (zero variance)
    *
    * Float parity: every sum is an exact int64 aggregate (CAST out of
    * HUGEINT on the oracle side); each metric is ONE IEEE division of
    * exactly-converted int64s, round 6 (at web scale the Pearson sums
    * outgrow int64 — the documented upgrade is the qc4 DECIMAL(38,0)
    * route; the formula is unchanged).
    *
    * Scale shape: one distinct + two hash aggregates and a semi-join on
    * (src, dst) — every shuffle is edge-keyed with map-side partials; the
    * output is ONE row (the fixed-size crossJoin discipline).
    *
    * Output: (n_hosts, n_edges, n_self_loops, n_reciprocal, reciprocity,
    * assortativity).
    */
  def hostMixing(spark: SparkSession, dir: String): DataFrame = {
    // the ONE corpus scan, materialized: nodes, the semi guard, counts and
    // the reciprocity legs all read it (the observedHosts rationale)
    val e0 = docs(spark, dir)
      .select((col("doc_id") % 32).as("src"),
        ((col("doc_id") % 32) * 5 + 1 + col("doc_id") % 3) % 32 as "dst")
      .distinct()
      .localCheckpoint(true)
    val nodes = e0.select(col("src").as("node")).distinct()
    val e = e0
      .join(nodes.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    val nonSelf = e.filter(col("src") =!= col("dst"))
    val rev = nonSelf.select(col("dst").as("src"), col("src").as("dst"))
    val eb = nonSelf.union(rev).distinct()
    val deg = eb.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    val withDeg = eb
      .join(deg.select(col("v").as("src"), col("d").as("dx")), "src")
      .join(deg.select(col("v").as("dst"), col("d").as("dy")), "dst")
    val pearson = withDeg.agg(
      count(lit(1)).as("m"), sum(col("dx")).as("sx"),
      sum(col("dx") * col("dy")).as("sxy"),
      sum(col("dx") * col("dx")).as("sxx"))
    val counts = e.agg(count(lit(1)).as("n_edges"),
      sum(when(col("src") === col("dst"), 1L).otherwise(0L)).as("n_self_loops"))
    val nHosts = nodes.agg(count(lit(1)).as("n_hosts"))
    val nRecip = nonSelf.join(rev.withColumnRenamed("src", "s2")
        .withColumnRenamed("dst", "d2"),
      col("src") === col("s2") && col("dst") === col("d2"), "left_semi")
      .agg(count(lit(1)).as("n_reciprocal"))
    val num = col("m") * col("sxy") - col("sx") * col("sx")
    val den = col("m") * col("sxx") - col("sx") * col("sx")
    nHosts.crossJoin(broadcast(counts)).crossJoin(broadcast(nRecip))
      .crossJoin(broadcast(pearson))
      .select(col("n_hosts"), col("n_edges"), col("n_self_loops"),
        col("n_reciprocal"),
        when(col("n_edges") - col("n_self_loops") =!= 0L,
          round(col("n_reciprocal").cast("double") /
            (col("n_edges") - col("n_self_loops")).cast("double"), 6))
          .as("reciprocity"),
        when(den =!= 0L,
          round(num.cast("double") / den.cast("double"), 6))
          .as("assortativity"))
  }

  /** qg12: STRONGLY-connected components + the Broder bow-tie roles — the
    * canonical directed-webgraph decomposition (Broder et al. 2000, "Graph
    * structure in the Web": CORE / IN / OUT / the rest). qg2's undirected
    * components merge mirror networks; the DIRECTED structure is what
    * crawl scheduling and spam analysis read (link farms live in dense
    * OUT-side SCCs; seed quality is an IN-side property).
    *
    * Algorithm: iterative FW–BW coloring (Orzan 2004; the standard
    * distributed SCC shape): per peel iteration, (1) forward max-label
    * propagation to fixpoint — c(v) = max id that reaches v — each round
    * ONE join of the color table against the live edge list + a dst-keyed
    * max aggregate with map-side partials; (2) pivots are nodes with
    * c(v)=v, and each pivot's SCC is the backward-reachable set within
    * its color class (same-color edge list precomputed once per
    * iteration, then one join + distinct per round); (3) settled SCCs
    * peel off and the remainder re-colors. Rounds are O(diameter) and
    * iterations O(SCC chain depth) — both bounded and THROWN on (the
    * qd6 non-convergence guard); real webgraphs sit at diameter ≈ tens
    * (the qg10 HyperANF evidence) with trim+coloring converging in a few
    * iterations. ITERATIVE DATAFLOW MATERIALIZES PER ROUND (the qd6
    * invariant): every color/mark table localCheckpoint(true)s and its
    * predecessor releases; change detection is a 1-row count, never a
    * collect of node state.
    *
    * The planted graph (doc_id mod 32 indexes a fixed 32-edge pattern —
    * O(1) element_at lookups, the skewRepartition discipline) is a
    * deliberate bow-tie: an 8-cycle CORE SCC fed by an 8-deep IN chain,
    * a 4-cycle SCC and a chain on the OUT side, a disconnected 2-SCC, a
    * self-loop singleton, and two DESCENDING-id chains that force the
    * peel loop into genuine second and third iterations (max-coloring
    * settles ascending ids in one pass; descending ids peel one per
    * iteration — the adversarial case for this algorithm family).
    *
    * The DuckDB oracle is fully INDEPENDENT of the algorithm (the qg2
    * discipline): it computes ground-truth mutual reachability with a
    * recursive CTE and derives scc_id = min mutual-reach partner, sizes,
    * and roles from the closure — so the hash gate checks the
    * DECOMPOSITION, not a replay of the coloring.
    */
  def hostScc(spark: SparkSession, dir: String, maxIters: Int = 5,
      maxRounds: Int = 64): DataFrame = {
    val srcs = Seq[Long](0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
      15, 20, 21, 22, 23, 23, 24, 25, 26, 15, 28, 29, 30, 33, 35, 34)
    val dsts = Seq[Long](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 8,
      20, 21, 22, 23, 20, 24, 25, 26, 27, 24, 29, 28, 30, 32, 34, 31)
    val idx = (col("doc_id") % 32).cast("int") + 1
    val edges = docs(spark, dir).select(
      element_at(typedlit(srcs), idx).as("src"),
      element_at(typedlit(dsts), idx).as("dst"))
      .distinct().localCheckpoint(true)
    locally {
      // the whole peel loop is eager (checkpoint-per-round), so it runs
      // under state-sized shuffle parallelism (IterTuning: derived from the
      // measured edge count, not the session constant — guide §2.2); the
      // final lazy role projection plans under the session conf. Measured:
      // 325 jobs -> 137 for the planted bow-tie (the AQE per-stage jobs and
      // 32-way label shuffles were pure scheduling latency at this state
      // size).
      val eCount = edges.count()
      IterTuning.withStateSized(spark, eCount) {
      val allNodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
      var remaining = allNodes.localCheckpoint(true)
      // starts empty (schema-typed) so an empty corpus yields an empty
      // result instead of an uninitialized accumulator
      var assigned: DataFrame = allNodes.limit(0)
        .select(col("node").as("host_id"), col("node").as("scc_id"))
      var iters = 0
      while (remaining.count() > 0) {
        iters += 1
        require(iters <= maxIters,
          s"SCC peeling did not converge in $maxIters iterations")
        val live = edges
          .join(remaining.withColumnRenamed("node", "src"), "src")
          .join(remaining.withColumnRenamed("node", "dst"), "dst")
          .select(col("src"), col("dst")).localCheckpoint(true)
        // (1) forward max-label fixpoint, one propagation step per
        // materialization. (r6 note: two-step batching was tried and
        // measured slower here — see the qg7 wave note.)
        var c = remaining.select(col("node"), col("node").as("c"))
          .localCheckpoint(true)
        var rounds = 0
        var changed = 1L
        while (changed > 0) {
          rounds += 1
          require(rounds <= maxRounds,
            s"SCC coloring did not converge in $maxRounds rounds")
          val inMax = live
            .join(c.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst")).agg(max(col("c")).as("cin"))
          // `prev` rides along (the ccWithRounds discipline) so the change
          // count is a filter on the checkpointed result, not an extra
          // per-round join job against the old colors
          val next = c
            .join(inMax.withColumnRenamed("dst", "node"), Seq("node"), "left")
            .select(col("node"), col("c").as("prev"),
              greatest(col("c"), coalesce(col("cin"), col("c"))).as("c2"))
            .localCheckpoint(true)
          changed = next.filter(col("c2") =!= col("prev")).count()
          c.unpersist()
          c = next.select(col("node"), col("c2").as("c"))
        }
        // (2) backward mark within color classes, from the pivots
        val sameColor = live
          .join(c.select(col("node").as("src"), col("c").as("cs")), "src")
          .join(c.select(col("node").as("dst"), col("c").as("cd")), "dst")
          .filter(col("cs") === col("cd"))
          .select(col("src"), col("dst")).localCheckpoint(true)
        var marked = c.filter(col("node") === col("c")).select(col("node"))
          .localCheckpoint(true)
        var mCount = marked.count()
        rounds = 0
        changed = 1L
        while (changed > 0) {
          rounds += 1
          require(rounds <= maxRounds,
            s"SCC backward mark did not converge in $maxRounds rounds")
          val reached = sameColor
            .join(marked.withColumnRenamed("node", "dst"), "dst")
            .select(col("src").as("node"))
          val next = marked.union(reached).distinct().localCheckpoint(true)
          val n = next.count()
          changed = n - mCount
          mCount = n
          marked.unpersist()
          marked = next
        }
        // (3) peel: settled nodes get scc_id = min member of their class
        val members = c.join(marked, Seq("node"))
        val ids = members.groupBy(col("c")).agg(min(col("node")).as("scc_id"))
        val assignedThis = members.join(ids, "c")
          .select(col("node").as("host_id"), col("scc_id"))
        val grown = assigned.union(assignedThis).localCheckpoint(true)
        assigned.unpersist()
        assigned = grown
        val rest = remaining.join(marked, Seq("node"), "left_anti")
          .localCheckpoint(true)
        remaining.unpersist()
        remaining = rest
        live.unpersist(); sameColor.unpersist(); c.unpersist()
        marked.unpersist()
      }
      val sizes = assigned.groupBy(col("scc_id"))
        .agg(count(lit(1)).as("scc_size"))
      val big = sizes.orderBy(col("scc_size").desc, col("scc_id").asc)
        .limit(1).select(col("scc_id").as("core_scc"))
      val coreNodes = assigned.crossJoin(broadcast(big))
        .filter(col("scc_id") === col("core_scc"))
        .select(col("host_id")).localCheckpoint(true)
      // role reachability: two boolean fixpoints over the FULL edge list
      def reachFix(seed: DataFrame, backward: Boolean): DataFrame = {
        val (key, out) = if (backward) ("dst", "src") else ("src", "dst")
        var m = seed.localCheckpoint(true)
        var n0 = m.count()
        var rounds = 0
        var changed = 1L
        while (changed > 0) {
          rounds += 1
          require(rounds <= maxRounds,
            s"role reachability did not converge in $maxRounds rounds")
          val reached = edges
            .join(m.withColumnRenamed("host_id", key), key)
            .select(col(out).as("host_id"))
          val next = m.union(reached).distinct().localCheckpoint(true)
          val n = next.count()
          changed = n - n0
          n0 = n
          m.unpersist()
          m = next
        }
        m
      }
      val toCore = reachFix(coreNodes, backward = true)
        .withColumn("to_core", lit(true))
      val fromCore = reachFix(coreNodes, backward = false)
        .withColumn("from_core", lit(true))
      assigned.join(sizes, "scc_id")
        .crossJoin(broadcast(big))
        .join(toCore, Seq("host_id"), "left")
        .join(fromCore, Seq("host_id"), "left")
        .select(col("host_id"), col("scc_id"), col("scc_size"),
          when(col("scc_id") === col("core_scc"), "core")
            .when(coalesce(col("to_core"), lit(false)), "in")
            .when(coalesce(col("from_core"), lit(false)), "out")
            .otherwise("other").as("role"))
      }
    }
  }
}
