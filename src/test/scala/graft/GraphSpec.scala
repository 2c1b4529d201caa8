package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hand-computed single iteration with a dangling node") {
    // a -> b only; b dangles. N=2, r0 = (0.5, 0.5), dangling mass 0.5:
    // r(a) = 0.15/2 + 0.85*(0 + 0.25)   = 0.2875
    // r(b) = 0.15/2 + 0.85*(0.5 + 0.25) = 0.7125
    val e = Seq(("a", "b")).toDF("src", "dst")
    val out = Graph.pageRank(e, iters = 1).orderBy("node").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - 0.2875) < 1e-6)
    assert(math.abs(out("b") - 0.7125) < 1e-6)
  }

  test("pageRank: symmetric cycle stays uniform; mass conserved over 3 iters") {
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val out = Graph.pageRank(cycle, iters = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // every node has in-deg = out-deg = 1 -> uniform is the fixed point
    assert(out.values.forall(v => math.abs(v - 1.0 / 3) < 1e-6))
    assert(math.abs(out.values.sum - 1.0) < 1e-5)
  }

  test("pageRank: a sink hub accumulates rank from its pointers") {
    // star: three spokes all point at hub (hub dangles)
    val star = Seq(("s1", "hub"), ("s2", "hub"), ("s3", "hub")).toDF("src", "dst")
    val out = Graph.pageRank(star, iters = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("hub") > out("s1") * 2) // clearly dominant, not just above
    assert(out("s1") == out("s2") && out("s2") == out("s3")) // symmetry exact
  }

  test("pageRank: tol early-stop exits a converged cycle with identical output") {
    // Symmetric cycle: uniform ranks ARE the fixed point, so the first
    // iteration's L1 delta is 0 and the probe must stop the loop there.
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val (early, itersRun) =
      Graph.pageRankRun(cycle, iters = 25, damping = 0.85, "src", "dst", tol = 1e-9)
    assert(itersRun < 25, s"expected early exit, ran all $itersRun iterations")
    val full = Graph.pageRank(cycle, iters = 25).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = early.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == full) // identical to the full run, 6-dp exact
  }

  test("pageRank: tol=0 keeps the exact fixed-iteration contract") {
    val star = Seq(("s1", "hub"), ("s2", "hub")).toDF("src", "dst")
    val (_, itersRun) =
      Graph.pageRankRun(star, iters = 4, damping = 0.85, "src", "dst", tol = 0.0)
    assert(itersRun == 4)
  }

  test("triangleCounts: shared-edge triangles, squares excluded, dirty edges canonicalized") {
    val e = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L), // triangles 123, 234
      (5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L),           // 4-cycle: no triangle
      (2L, 1L),                                         // reversed duplicate
      (4L, 4L))                                         // self-loop dropped
      .toDF("src", "dst")
    val out = Graph.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("clusteringCoefficients: clique-ness per node; degree-1 NULL; triangle-free 0") {
    val e = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L), // triangles 123, 234
      (5L, 6L),                                         // isolated edge: d=1 pair
      (4L, 7L))                                         // 7 hangs off the triangle
      .toDF("src", "dst")
    val out = Graph.clusteringCoefficients(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // node 2: degree 3, 2 triangles -> 2*2/(3*2) = 2/3
    assert(out(2L) == ((3L, 2L, Some(0.666667))))
    assert(out(1L) == ((2L, 1L, Some(1.0))))   // its whole neighborhood is a clique
    assert(out(4L) == ((3L, 1L, Some(0.333333))))
    assert(out(5L) == ((1L, 0L, None)))        // degree 1: undefined
    assert(out(7L) == ((1L, 0L, None)))
    assert(out(6L) == ((1L, 0L, None)))
  }

  test("pageRankPersonalized: teleport mass stays on the seed set") {
    // a -> b -> c, seed {a}: after 1 iteration r = (0.15, 0.85, 0) —
    // all teleportation returns to a, b holds a's full pushed mass,
    // c has received nothing yet.
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val out = Graph.pageRankPersonalized(e, seeds, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 0.15, "b" -> 0.85, "c" -> 0.0))
    // seeds absent from the graph are ignored (|S| counts matches only)
    val out2 = Graph.pageRankPersonalized(e, Seq("a", "zzz").toDF("node"),
      iters = 1).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out2 == out)
  }

  test("degreeHistogram: log2 buckets, undirected dedup, self-loops dropped") {
    // hub h touches a,b,c,d (degree 4 -> bucket 2); a-b edge gives a,b
    // degree 2 (bucket 1); c,d degree 1 (bucket 0). Duplicate and
    // reversed edges collapse; the self-loop vanishes.
    val e = Seq(("h", "a"), ("a", "h"), ("h", "b"), ("h", "c"), ("h", "d"),
      ("a", "b"), ("b", "a"), ("c", "c")).toDF("src", "dst")
    val out = Graph.degreeHistogram(e).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 1L, 1L, 2L, 1L),   // c, d
      (1L, 2L, 3L, 2L, 2L),   // a, b
      (2L, 4L, 7L, 1L, 4L)))  // h
  }

  test("bfsHops: exact truncated distances on a path graph") {
    // path 1-2-3-4-5-6, seed {1}: dist(k) = k-1, truncated at 3 hops
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val out = Graph.bfsHops(edges, seeds, 3).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
    // undirected: seeding the middle reaches both sides
    val mid = Graph.bfsHops(edges, Seq(Tuple1(3L)).toDF("node"), 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mid.toSeq == Seq((2L, 1L), (3L, 0L), (4L, 1L)))
  }

  test("bfsHops: min distance wins when paths of different length meet") {
    // triangle 1-2, 2-3, 1-3 plus tail 3-4: dist(3) = 1 (direct, not via 2)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.bfsHops(edges, Seq(Tuple1(1L)).toDF("node"), 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L)))
  }

  test("labelPropagate: majority wins, ties break to smallest label") {
    // star: center 10 with neighbors 1,2,3 labeled 0,0,1 -> center gets 0
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L)).toDF("src", "dst")
    val init = Seq((10L, 9L), (1L, 0L), (2L, 0L), (3L, 1L))
      .toDF("node", "label")
    val r1 = Graph.labelPropagate(edges, init, 1).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // leaves see only the center (label 9); center sees {0,0,1} -> 0
    assert(r1.toSeq == Seq((1L, 9L), (2L, 9L), (3L, 9L), (10L, 0L)))
    // tie case: neighbors labeled {0,1} -> smallest label 0
    val tieEdges = Seq((10L, 1L), (10L, 3L)).toDF("src", "dst")
    val tie = Graph.labelPropagate(tieEdges, init, 1)
      .filter($"node" === 10L).collect().head.getLong(1)
    assert(tie == 0L)
  }

  test("labelPropagate: isolated nodes keep their label across rounds") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val init = Seq((1L, 5L), (2L, 5L), (99L, 7L)).toDF("node", "label")
    val out = Graph.labelPropagate(edges, init, 2).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 5L), (2L, 5L), (99L, 7L)))
  }

  test("kCore: 3-core survives, tail prunes in rounds") {
    // K4 on {1,2,3,4} plus a tail 4-5-6: 3-core = the K4, degree 3 each
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val out = Graph.kCore(edges, 3, 3).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // k=2 on a pure path graph: nothing survives (ends keep peeling)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.kCore(path, 2, 3).count() == 0)
  }

  test("nodeJaccard: hand-computed shared-neighbor similarity") {
    // star: 1-3, 2-3 plus 1-4, 2-4 => pair (1,2): common {3,4}, deg 2/2
    // -> jaccard = 2/(2+2-2) = 1.0; pair (3,4): common {1,2} -> 1.0
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)).toDF("src", "dst")
    val out = Graph.nodeJaccard(edges).orderBy("x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 1.0), (3L, 4L, 2L, 1.0)))
    // asymmetric: edges 1-3, 2-3, 2-4: pair (1,2) common {3},
    // deg(1)=1, deg(2)=2 -> 1/(1+2-1) = 0.5
    val asym = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val a = Graph.nodeJaccard(asym).filter($"x" === 1L && $"y" === 2L)
      .collect().head
    assert((a.getLong(2), a.getDouble(3)) == (1L, 0.5))
  }


  test("assortativity: star is maximally disassortative, clique undefined") {
    // star: hub degree 3, leaves degree 1 -> r = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = Graph.assortativity(star).collect().head
    assert(r.getLong(0) == 6L && r.getDouble(1) == -1.0)
    // regular graph (4-cycle): zero degree variance -> 0/0 -> NaN/NULL-ish
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val c = Graph.assortativity(cyc).collect().head
    assert(c.isNullAt(1) || c.getDouble(1).isNaN)
  }

  test("adamicAdar: path pair scores 1/ln(deg), adjacent pairs excluded") {
    // path a-b-c: (a,c) share b (deg 2) -> score 1/ln 2; (a,b),(b,c) adjacent
    val path = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val out = Graph.adamicAdar(path).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(out.toMap == Map(("a", "c") -> (1L,
      math.rint(1.0 / math.log(2.0) * 1e6) / 1e6)))
    // triangle: every pair adjacent -> empty
    val tri = Seq(("x", "y"), ("y", "z"), ("x", "z")).toDF("src", "dst")
    assert(Graph.adamicAdar(tri).isEmpty)
    // two common neighbors sum their weights: square 1-2-3-4 (no diagonal):
    // (1,3) share 2 and 4 (both deg 2) -> 2/ln 2; minScore prunes it
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val s = Graph.adamicAdar(sq).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(math.abs(s((1L, 3L)) - 2.0 / math.log(2.0)) < 1e-5)
    assert(math.abs(s((2L, 4L)) - 2.0 / math.log(2.0)) < 1e-5)
    assert(Graph.adamicAdar(sq, minScore = 3.0).isEmpty)
  }

  test("powerlawTail: hand-computed star MLE; degenerate tail yields NULL alpha") {
    // star: hub degree 4, four spokes degree 1; xmin=1 keeps all 5 nodes
    val star = (1L to 4L).map(i => (0L, i)).toDF("src", "dst")
    val r = Graph.powerlawTail(star, xmin = 1L).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (5L, 5L, 1L))
    assert(r.getDouble(3) == 1.0)
    val alpha = 1.0 + 5.0 / (math.rint(math.log(4.0) * 1e9) / 1e9)
    assert(math.abs(r.getDouble(4) - alpha) < 1e-6)
    // xmin above every degree: empty tail, NULL alpha (not an error)
    val r2 = Graph.powerlawTail(star, xmin = 10L).collect().head
    assert(r2.getLong(1) == 0L && r2.getDouble(3) == 0.0 && r2.isNullAt(4))
    // all degrees exactly xmin: slog = 0 -> NULL alpha via try_divide
    val pair = Seq((1L, 2L)).toDF("src", "dst")
    val r3 = Graph.powerlawTail(pair, xmin = 1L).collect().head
    assert(r3.getLong(1) == 2L && r3.isNullAt(4))
  }

  test("richClub: a hub clique scores phi=1; an empty club reports NULL") {
    // K4 on 1..4 plus pendant spokes 5-1, 6-2: deg(1)=deg(2)=4,
    // deg(3)=deg(4)=3, spokes deg 1 -> the >2 club is exactly the K4
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L), (6L, 2L)).toDF("src", "dst")
    val out = Graph.richClub(e, Seq(2L, 8L)).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 4L, 6L), (8L, 0L, 0L)))
    val phi = Graph.richClub(e, Seq(2L, 8L)).orderBy("k").collect()
    assert(phi(0).getDouble(3) == 1.0)   // K4 is fully connected
    assert(phi(1).isNullAt(3))           // empty club: 0/0 -> NULL
  }

  test("modularity: perfect two-community split scores 0.5, trivial labeling 0") {
    // two disjoint triangles; m2 = 12 directed edges
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
                (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val perfect = Seq((1L, 0L), (2L, 0L), (3L, 0L),
                      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("node", "label")
    val out = Graph.modularity(e, perfect).orderBy("label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // each community: intra 6/12, degree mass 6/12 -> 0.5 - 0.25 = 0.25
    assert(out.toSeq == Seq((0L, 3L, 6L, 6L, 0.25), (1L, 3L, 6L, 6L, 0.25)))
    // everyone in one community: Q = 1 - 1 = 0 exactly
    val one = Seq((1L, 0L), (2L, 0L), (3L, 0L),
                  (4L, 0L), (5L, 0L), (6L, 0L)).toDF("node", "label")
    val q1 = Graph.modularity(e, one).collect().head
    assert(q1.getDouble(4) == 0.0)
    // splitting a clique in half is WORSE than random: negative contribs
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L),
                     (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val half = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("node", "label")
    val qs = Graph.modularity(clique, half).collect().map(_.getDouble(4))
    assert(qs.forall(_ < 0.0), s"expected negative contribs, got ${qs.toSeq}")
  }

  test("reciprocity: mutual pair counts once per direction; self-loops drop") {
    val e = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"))
      .toDF("src", "dst")
    val r = Graph.reciprocity(e).collect().head
    // edges after self-loop drop: a->b, b->a, a->c; the mutual pair
    // contributes BOTH directions to n_reciprocal
    assert((r.getLong(0), r.getLong(1)) == (3L, 2L))
    assert(math.abs(r.getDouble(2) - 0.666667) < 1e-6)
  }

  test("closenessCard: path-graph distances, harmonic sum, isolated seed row") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L, 2L, 99L).toDF("node")
    val out = Graph.closenessCard(e, seeds, hops = 3).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getDouble(4)))
    assert(out.toSeq == Seq(
      // seed 1: d(2)=1, d(3)=2, d(4)=3 -> closeness 3/6, harmonic 11/6
      (1L, 3L, 6L, Some(0.5), 1.833333),
      // seed 2: d(1)=1, d(3)=1, d(4)=2 -> closeness 3/4, harmonic 2.5
      (2L, 3L, 4L, Some(0.75), 2.5),
      // isolated seed still reports
      (99L, 0L, 0L, None, 0.0)))
  }

  test("hits: hand-computed two iterations on the classic a->{b,c}, d->c") {
    // iter1: auth raw b=.25 c=.5, tot=.75 -> b=1/3 c=2/3; hub raw a=1,
    // d=2/3, tot=5/3 -> a=.6 d=.4. iter2: auth raw b=.6 c=1, tot=1.6 ->
    // b=.375 c=.625; hub raw a=1, d=.625, tot=1.625 -> a=8/13 d=5/13.
    val e = Seq(("a", "b"), ("a", "c"), ("d", "c")).toDF("src", "dst")
    val out = Graph.hits(e, iters = 2).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(out("a")._1 - 8.0 / 13) < 1e-6)
    assert(math.abs(out("d")._1 - 5.0 / 13) < 1e-6)
    assert(out("b")._1 == 0.0 && out("c")._1 == 0.0) // sinks: hub 0
    assert(math.abs(out("b")._2 - 0.375) < 1e-6)
    assert(math.abs(out("c")._2 - 0.625) < 1e-6)
    assert(out("a")._2 == 0.0 && out("d")._2 == 0.0) // sources: auth 0
    // L1 normalization: each score family sums to 1
    assert(math.abs(out.values.map(_._1).sum - 1.0) < 1e-5)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("hits: single edge converges to the pure hub / pure authority") {
    val e = Seq(("a", "b")).toDF("src", "dst")
    val out = Graph.hits(e, iters = 1).orderBy("node").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("a", 1.0, 0.0), ("b", 0.0, 1.0)))
  }

  test("conductance: 4-cycle split in half, plus an isolated community") {
    // square 1-2-3-4-1; communities {1,2} / {3,4}: each side has
    // volume 4 (two nodes of degree 2), cut 2 (the two crossing edges)
    // -> phi = 2/min(4, 8-4) = 0.5; node 5 is edgeless -> NULL phi
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val lab = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 2L))
      .toDF("node", "label")
    val out = Graph.conductance(e, lab).orderBy("label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(out.toSeq == Seq(
      (0L, 2L, 4L, 2L, Some(0.5)),
      (1L, 2L, 4L, 2L, Some(0.5)),
      (2L, 1L, 0L, 0L, None)))
  }

  test("avgNeighborDegree: star and path k_nn(k) hand-computed") {
    // star 1-{2,3,4}: hub (deg 3) sees leaves (deg 1) and vice versa
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val s = Graph.avgNeighborDegree(star).orderBy("deg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(s.toSeq == Seq((1L, 3L, 3.0), (3L, 1L, 1.0)))
    // path 1-2-3: ends (deg 1) see the middle (deg 2); middle sees 1s
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val p = Graph.avgNeighborDegree(path).orderBy("deg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(p.toSeq == Seq((1L, 2L, 2.0), (2L, 1L, 1.0)))
  }

  test("localBridges: 4-cycle all bridges; chord closes them; pendant is one") {
    // plain 4-cycle: no edge has a common neighbor
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val c = Graph.localBridges(cyc).orderBy("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(c.toSeq == Seq((1L, 2L), (1L, 4L), (2L, 3L), (3L, 4L)))
    // chord (1,3) puts every cycle edge in a triangle; pendant (4,5)
    // stays a bridge
    val g = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (4L, 5L))).toDF("src", "dst")
    val b = Graph.localBridges(g).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(b.toSeq == Seq((4L, 5L)))
  }

  test("fiedlerBisection: barbell graph splits at the bridge") {
    // two triangles {1,2,3} and {4,5,6} joined by (3,4): the spectral
    // split is the triangles, cutting exactly the bridge
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.fiedlerBisection(e).collect().head
    assert(r.getLong(0) == 6L)
    assert(Set(r.getLong(1), r.getLong(2)) == Set(3L))
    assert(r.getLong(1) + r.getLong(2) == 6L)
    assert(r.getLong(3) == 1L, s"cut ${r.getLong(3)}")
    val l2 = r.getDouble(4)
    assert(l2 > 0.0 && l2 < 2.0, s"lambda2 $l2")
  }

  test("deterministicWalks: hand-hashed hops on the 1-2-3 path graph") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.deterministicWalks(e).collect()
      .groupBy(r => (r.getLong(0), r.getLong(1))).view
      .mapValues(rs => rs.sortBy(_.getLong(2)).map(_.getLong(3)).toSeq)
      .toMap
    assert(out.size == 6) // 3 nodes x 2 walks, each 4 positions
    assert(out((1L, 0L)) == Seq(1L, 2L, 1L, 2L))
    assert(out((1L, 1L)) == Seq(1L, 2L, 3L, 2L))
    assert(out((2L, 0L)) == Seq(2L, 3L, 2L, 3L))
    assert(out((2L, 1L)) == Seq(2L, 1L, 2L, 1L))
    assert(out((3L, 0L)) == Seq(3L, 2L, 1L, 2L))
    assert(out((3L, 1L)) == Seq(3L, 2L, 3L, 2L))
  }

  test("katzCentrality: hand-computed two rounds on a directed path; no deg split") {
    // a -> b -> c, alpha 0.5, beta 1:
    // x0 = (1,1,1); x1 = (1, 1.5, 1.5); x2 = (1, 1.5, 1.75)
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val out = Graph.katzCentrality(e, iters = 2, alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 1.0, "b" -> 1.5, "c" -> 1.75))
  }

  test("katzCentrality: a hub fed by k spokes scores beta + k*alpha*beta") {
    val star = Seq(("s1", "hub"), ("s2", "hub"), ("s3", "hub")).toDF("src", "dst")
    val out = Graph.katzCentrality(star, iters = 1, alpha = 0.1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // full mass per edge — NOT divided by out-degree like PageRank
    assert(out("hub") == 1.3 && out("s1") == 1.0)
  }

  test("katz: tol early-stop converges a directed cycle to beta/(1-alpha)") {
    // On a directed cycle every node obeys x = beta + alpha*x, fixed
    // point beta/(1-alpha) = 2.0 at alpha=0.5. The iteration's L1 delta
    // is 3*0.5^t, so tol=1e-9 stops near t=32 — far short of 60 — and
    // the 6-dp result equals the closed form.
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val (out, itersRun) =
      Graph.katzRun(cycle, iters = 60, alpha = 0.5, beta = 1.0,
        "src", "dst", tol = 1e-9)
    assert(itersRun < 60, s"expected early exit, ran all $itersRun iterations")
    val got = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 2.0, "b" -> 2.0, "c" -> 2.0))
  }

  test("katz: tol=0 keeps the exact fixed-iteration contract") {
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val (_, itersRun) =
      Graph.katzRun(e, iters = 4, alpha = 0.5, beta = 1.0, "src", "dst", tol = 0.0)
    assert(itersRun == 4)
  }

  test("linkPredictionScores: path and square hand-computed; adjacent excluded") {
    // path a-b-c-d: candidates (a,c) via b and (b,d) via c, one common
    // neighbor each, RA 1/2, PA deg(x)*deg(y)
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val p = Graph.linkPredictionScores(path, minCommon = 1L)
      .orderBy("x", "y").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(p.toSeq == Seq(("a", "c", 1L, 0.5, 2L), ("b", "d", 1L, 0.5, 2L)))
    // 4-cycle a-b-c-d-a: diagonals share TWO neighbors, RA 1, PA 4;
    // adjacent pairs never appear
    val square = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val q = Graph.linkPredictionScores(square, minCommon = 2L)
      .orderBy("x", "y").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(q.toSeq == Seq(("a", "c", 2L, 1.0, 4L), ("b", "d", 2L, 1.0, 4L)))
  }

  test("connectedComponentsStars: cliques, a bridge, and a separate pair") {
    // component {1,2,3,4} (triangle 1-2-3 bridged to 4) and pair {7,9}
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (9L, 7L))
      .toDF("src", "dst")
    val out = Graph.connectedComponentsStars(e).orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L))
  }

  test("connectedComponentsStars: 64-node path converges in O(log n) rounds") {
    // label-prop min propagation needs 63 rounds on this graph; the
    // alternating-star contraction's round count must be logarithmic —
    // the whole reason the operator exists.
    val path = (1L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Graph.connectedComponentsStarsRun(path, maxRounds = 16)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 64 && got.forall(_._2 == 1L))
    assert(rounds <= 8, s"expected logarithmic convergence, took $rounds rounds")
  }

  test("connectedComponentsStars: self-loops and duplicate edges are ignored") {
    val e = Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L)).toDF("src", "dst")
    val out = Graph.connectedComponentsStars(e).orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toSeq == Seq(5L -> 5L, 6L -> 5L))
  }

  test("connectedComponentsStars: strict mode throws when rounds are exhausted") {
    val path = (1L until 32L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalStateException] {
      Graph.connectedComponentsStarsRun(path, maxRounds = 1, "src", "dst",
        strict = true)
    }
  }

}
