package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK ranks by exact cosine, deterministic tie-break") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),   // query
      (2L, Seq(0.9f, 0.1f)),   // closest
      (3L, Seq(0.5f, 0.5f)),
      (4L, Seq(0.0f, 1.0f)),   // orthogonal
      (5L, Seq(0.0f, 0.0f))    // zero vector: must never rank
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(corpus, corpus.filter($"vec_id" === 1), 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L, 4L))
    assert(!out.map(_.getAs[Long]("neighbor_id")).contains(5L))
    assert(out(0).getAs[Double]("cosine") > out(1).getAs[Double]("cosine"))
  }

  test("srpBucket plans and runs at dim=512 (no expression blowup)") {
    val rng = new scala.util.Random(3)
    val vecs = (0L until 20L).map(i => (i, Seq.fill(512)(rng.nextFloat())))
      .toDF("vec_id", "embedding")
    val out = Similarity.lshAnnTopK(vecs, vecs.filter($"vec_id" < 2), 5,
      dim = 512, nPlanes = 8, nTables = 2)
    assert(out.count() > 0) // found neighbors through the bucket join
  }

  test("quantizeInt8: native codes match floor(x*127/max|v|+0.5); degenerate rows NULL") {
    val vecs = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)), // scale 1.0 → codes 64, -127, 32
      (2L, Seq(0.0f, 0.0f)),         // zero vector → NULL scale and codes
      (3L, Seq.empty[Float])         // empty → NULL
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(vecs).orderBy("vec_id").collect()
    assert(out(0).getAs[Double]("scale") == 1.0)
    assert(out(0).getSeq[Int](2).toList == List(64, -127, 32))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
    // every code bounded: |q_i| <= 127 by construction (scale = max |v_i|)
    val rng = new scala.util.Random(7)
    val rand = (0L until 50L).map(i => (i, Seq.fill(64)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val codes = Similarity.quantizeInt8(rand)
      .select(explode(col("q")).as("c")).agg(max(abs(col("c")))).head.getInt(0)
    assert(codes <= 127)
  }

  test("refineTopK with full-width coarse pass == bruteForceTopK ranking") {
    val rng = new scala.util.Random(23)
    val corpus = (0L until 60L).map(i => (i, Seq.fill(32)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3)
    val refined = Similarity.refineTopK(corpus, queries, 5, coarseK = 60)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(1 + 1))).toSet
    val brute = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(refined == brute)
    // a tight coarse cut still returns k rows per query
    val tight = Similarity.refineTopK(corpus, queries, 5, coarseK = 8)
    assert(tight.groupBy("query_id").count().collect().forall(_.getLong(1) == 5L))
  }

  test("normalizeL2: unit norm out; zero/empty vectors NULL") {
    val vecs = Seq(
      (1L, Seq(3.0f, 4.0f)),
      (2L, Seq(0.0f, 0.0f)),
      (3L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val out = Similarity.normalizeL2(vecs).orderBy("vec_id").collect()
    assert(out(0).getSeq[Double](1).toList == List(0.6, 0.8))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
    // norm of every non-degenerate output is 1 (to double precision)
    val rng = new scala.util.Random(13)
    val rand = (0L until 30L).map(i => (i, Seq.fill(64)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val norms = Similarity.normalizeL2(rand)
      .select(call_function("graft_dot", col("unit"), col("unit")).as("n2"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-12))
  }

  test("srpBucket: wrong-length vectors get NULL bucket and drop out") {
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f, 4.1f)),
      (3L, Seq(1.0f, 2.0f))  // truncated vector
    ).toDF("vec_id", "embedding")
    val bucketed = vecs.withColumn("b",
      Similarity.srpBucket(col("embedding"), dim = 4, nPlanes = 4))
    val rows = bucketed.orderBy("vec_id").collect()
    assert(!rows(0).isNullAt(2) && !rows(1).isNullAt(2))
    assert(rows(2).isNullAt(2))
    val ann = Similarity.lshAnnTopK(vecs, vecs.filter($"vec_id" === 1), 5, dim = 4,
      nPlanes = 2, nTables = 2)
    assert(!ann.select("neighbor_id").collect().map(_.getLong(0)).contains(3L))
  }

  test("IVF ANN: candidates only from probed lists, cosines exact, k-capped") {
    val rng = new scala.util.Random(21)
    // 4 well-separated clusters in 8-dim space + noise
    val centers = Seq.tabulate(4)(c => Array.tabulate(8)(d => if (d == c * 2) 10.0 else 0.0))
    val vecs = (0L until 80L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(v => (v + rng.nextGaussian() * 0.1).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 2)
    val out = Similarity.ivfTopK(vecs, q, 5, nClusters = 8, nProbe = 3).collect()
    assert(out.nonEmpty)
    val brute = Similarity.bruteForceTopK(vecs, q, 80).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    out.foreach { r =>
      assert(math.abs(brute((r.getLong(0), r.getLong(2))) - r.getDouble(3)) < 1e-12)
    }
    assert(out.groupBy(_.getLong(0)).forall(_._2.length <= 5))
    // with generous probing of separated clusters, the true top-1 is found
    val top1 = out.filter(_.getAs[Int]("rank") == 1).map(r => (r.getLong(0), r.getLong(2))).toSet
    val bruteTop1 = Similarity.bruteForceTopK(vecs, q, 1).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(top1 == bruteTop1)
  }

  test("LSH ANN results are a subset of brute-force with identical cosines") {
    val rng = new scala.util.Random(11)
    val vecs = (0L until 50L).map(i => (i, Seq.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(vecs, q, 50).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ann = Similarity.lshAnnTopK(vecs, q, 10, dim = 16, nPlanes = 4, nTables = 2)
      .collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(math.abs(brute(key) - r.getDouble(3)) < 1e-12)
    }
  }

  test("ivfCentroids: exactly nClusters rows, stable across runs and partitionings") {
    val rng = new scala.util.Random(31)
    val vecs = (0L until 100L).map(i => (i, Seq.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val a = Similarity.ivfCentroids(vecs, 10).collect()
      .map(_.getLong(0)).toSeq
    val b = Similarity.ivfCentroids(vecs.repartition(7), 10).collect()
      .map(_.getLong(0)).toSeq
    assert(a.length == 10)
    assert(a.sorted == b.sorted) // hash-ranked selection: partitioning-independent
  }

  test("signedProjection: exact integer dots against a reference computation") {
    val dim = 8
    val rng = new scala.util.Random(17)
    val rows = (0L until 50L).map(i => (i, Seq.fill(dim)(rng.nextGaussian().toFloat)))
    val out = Similarity.signedProjection(rows.toDF("vec_id", "embedding"),
        dim = dim, outDims = 4)
      .orderBy("vec_id").collect()
    val signs = Similarity.projectionSigns(dim, 4)
    rows.zip(out).foreach { case ((id, vec), row) =>
      val v = vec.map(_.toDouble)
      val scale = v.map(math.abs).max
      val q = v.map(x => math.floor(x * 127.0 / scale + 0.5).toLong)
      assert(row.getLong(0) == id)
      (0 until 4).foreach { j =>
        val expect = q.zip(signs(j)).map { case (c, s) => c * s }.sum
        assert(row.getLong(1 + j) == expect, s"vec $id proj_$j")
      }
    }
    // sign matrix is balanced-ish (high-bit extraction, not parity stripes)
    val flat = Similarity.projectionSigns(64, 8).flatten
    val plus = flat.count(_ > 0)
    assert(plus > 200 && plus < 312, s"signs unbalanced: $plus/512 positive")
  }

  test("recallAtK: identical=1, disjoint=0, partial overlap is exact") {
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val same = Similarity.recallAtK(truth, truth).head()
    assert(same.getAs[Long]("n_queries") == 2L)
    assert(same.getAs[Double]("mean_recall") == 1.0)
    val disjoint = Seq((1L, 90L), (2L, 91L)).toDF("query_id", "neighbor_id")
    assert(Similarity.recallAtK(disjoint, truth).head()
      .getAs[Double]("mean_recall") == 0.0)
    // q1 found 1 of 2, q2 found 2 of 2 -> mean (0.5 + 1.0)/2 = 0.75
    val partial = Seq((1L, 10L), (2L, 20L), (2L, 21L)).toDF("query_id", "neighbor_id")
    assert(Similarity.recallAtK(partial, truth).head()
      .getAs[Double]("mean_recall") == 0.75)
  }

  test("standardize: hand-computed per-dim z; constant dim yields NULL") {
    val e = Seq(
      (1L, Array(0.0f, 7.0f)),
      (2L, Array(2.0f, 7.0f)),
      (3L, Array(4.0f, 7.0f))).toDF("vec_id", "embedding")
    val out = Similarity.standardize(e).orderBy("vec_id", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.get(2)).toMap
    // dim 1: mean 2, sd = sqrt((4+0+4)/2) = 2 -> z = -1, 0, 1
    assert(out((1L, 1L)).asInstanceOf[Double] == -1.0)
    assert(out((2L, 1L)).asInstanceOf[Double] == 0.0)
    assert(out((3L, 1L)).asInstanceOf[Double] == 1.0)
    // dim 2 constant -> sd 0 -> NULL (try_divide), not an ANSI error
    assert(out((1L, 2L)) == null && out((3L, 2L)) == null)
  }

  test("kmeansIterate: one Lloyd step on two obvious 2-D clusters") {
    val e = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(10.0f, 10.0f)), // seeds (first 2 ids)
      (3L, Array(1.0f, 1.0f)), (4L, Array(9.0f, 9.0f)),
      (5L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.kmeansIterate(e, 2).orderBy("cluster_id", "dim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // cluster 1 members: vecs 1,3,5 -> dim means (1/3, 2/3); cluster 2: 2,4 -> (9.5, 9.5)
    assert(out.toSeq == Seq(
      (1L, 1L, 0.333333, 3L), (1L, 2L, 0.666667, 3L),
      (2L, 1L, 9.5, 2L), (2L, 2L, 9.5, 2L)))
  }

  test("linearCka: identity and permutation score 1; zero-covariance pairing scores 0") {
    // Y = X under a dimension permutation (orthogonal) -> CKA 1
    val perm = Seq(
      (Array(1.0, 2.0), Array(2.0, 1.0)),
      (Array(2.0, 4.0), Array(4.0, 2.0)),
      (Array(3.0, 5.0), Array(5.0, 3.0))).toDF("x", "y")
    val p = Similarity.linearCka(perm).collect().head
    assert(p.getLong(0) == 3L)
    assert(p.getDouble(1) == p.getDouble(2)) // permuted norms identical
    assert(math.abs(p.getDouble(3) - 1.0) < 1e-6)
    // centered x = (-1.5,-.5,.5,1.5), y = (1,-1,-1,1): cross-cov 0
    val ortho = Seq(
      (Array(1.0), Array(1.0)), (Array(2.0), Array(-1.0)),
      (Array(3.0), Array(-1.0)), (Array(4.0), Array(1.0))).toDF("x", "y")
    val o = Similarity.linearCka(ortho).collect().head
    assert(o.getDouble(3) == 0.0)
    // a constant side has zero norm -> NULL, not a divide error
    val const = Seq((Array(1.0), Array(5.0)), (Array(2.0), Array(5.0)))
      .toDF("x", "y")
    assert(Similarity.linearCka(const).collect().head.isNullAt(3))
  }

  test("clusterPurity: majority labels per nearest-seed cluster; NULL labels count as members only") {
    val e = Seq(
      (1L, Array(0.0f, 0.0f), "A"), (2L, Array(10.0f, 10.0f), "B"),
      (3L, Array(0.5f, 0.0f), "A"), (4L, Array(0.1f, 0.0f), "B"),
      (5L, Array(9.0f, 10.0f), "B"),
      (6L, Array(0.0f, 1.0f), null))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.clusterPurity(e, 2).orderBy("cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      // cluster 1: members {1,3,4,6}; votes A,B,A -> majority A, 2/4
      (1L, 4L, "A", 2L, 0.5),
      (2L, 2L, "B", 2L, 1.0)))
  }

  test("inertiaCurve: hand-computed totals, non-increasing in k") {
    val e = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(10.0f, 10.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(10.0f, 11.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.inertiaCurve(e, Seq(1, 2)).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // k=1 (seed [0,0]): 0 + 200 + 1 + 221 = 422; k=2 (seeds 1,2): 0+0+1+1
    assert(out.toSeq == Seq((1L, 4L, 422.0, 105.5), (2L, 4L, 2.0, 0.5)))
    assert(out(1)._3 <= out(0)._3) // more clusters never raises inertia
  }

  test("kmeansIterate: equidistant vector goes to the lower centroid id") {
    val e = Seq(
      (1L, Array(0.0f)), (2L, Array(2.0f)), // seeds at 0 and 2
      (3L, Array(1.0f))).toDF("vec_id", "embedding") // exactly between
    val out = Similarity.kmeansIterate(e, 2).orderBy("cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L))) // vec 3 joined cluster 1
  }

  test("embeddingNearDupPairsLsh: measured recall ≥ 0.92 at bench scale, boundary-planted pairs") {
    // MEASURED recall at the benched corpus size (sf0.1 embeddings: 2000
    // vectors, dim 64), not the analytic argument alone: 200 planted
    // near-dup twins at cosines JUST above the 0.95 threshold (0.951 …
    // 0.960 — the worst case LSH has to catch), recall computed against
    // the exact all-pairs twin. At cos 0.951 a pair shares a bucket per
    // table w.p. (1−θ/π)^8 ≈ 0.43, so the default 6 tables miss w.p.
    // ≈ 0.034 → expected recall ≈ 0.966 with σ ≈ 0.013 over 200 plants;
    // the 0.92 floor is > 3σ below that.
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    assert(base.length >= 1000, "fixture expects the sf0.1 embeddings table")
    // Rotate v toward a deterministic orthogonal direction by exactly
    // φ = arccos(target): cosine(v, planted) = target up to float rounding.
    def plant(v: Array[Float], target: Double, k: Int): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      val vn = v.map(_ / n)
      val u0 = Array.tabulate(v.length)(i => ((i * 31 + k * 17) % 7 - 3).toDouble)
      val d = u0.indices.map(i => u0(i) * vn(i)).sum
      val orth = u0.indices.map(i => u0(i) - d * vn(i)).toArray
      val on = math.sqrt(orth.map(x => x * x).sum)
      val ou = orth.map(_ / on)
      val phi = math.acos(target)
      vn.indices.map(i => (vn(i) * math.cos(phi) + ou(i) * math.sin(phi)).toFloat).toArray
    }
    val planted = base.take(200).zipWithIndex.map { case ((id, v), k) =>
      (id + 1000000L, plant(v, 0.951 + 0.009 * (k % 10) / 9.0, k))
    }
    val fixture = (base ++ planted).toSeq
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .repartition(8).cache()
    val exact = operators.Dedup.embeddingNearDupPairs(fixture, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = operators.Dedup.embeddingNearDupPairsLsh(fixture, 0.95, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    fixture.unpersist()
    // every planted twin must qualify under the exact join (fixture sanity)
    val plantedPairs = base.take(200).map(p => (p._1, p._1 + 1000000L)).toSet
    assert((plantedPairs -- exact).isEmpty, "planted pairs missing from the exact join")
    // LSH verifies with the exact cosine, so it can only ever be a subset
    assert((lsh -- exact).isEmpty, "LSH emitted a pair the exact join rejects")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.92, f"LSH recall $recall%.4f < 0.92 (${lsh.size}/${exact.size})")
  }

  test("covarianceMatrix: hand 2x2 case, symmetric, d^2 rows") {
    val emb = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 6.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.covarianceMatrix(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // means (2, 4): cov00 = (1+9)/2 - 4 = 1; cov01 = (2+18)/2 - 8 = 2;
    // cov11 = (4+36)/2 - 16 = 4
    assert(out.size == 4)
    assert(out((0L, 0L)) == 1.0 && out((1L, 1L)) == 4.0)
    assert(out((0L, 1L)) == 2.0 && out((1L, 0L)) == 2.0) // symmetry
  }

  test("pcaPowerIteration: hand 2-dim case converges to the exact eigenvector") {
    // cov of {(1,2),(3,6)} is [[1,2],[2,4]]: eigenvector (1,2)/sqrt(5),
    // eigenvalue 5 — power iteration lands on it by round 2.
    val emb = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 6.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.pcaPowerIteration(emb, 3).orderBy("i").collect()
    assert(out.length == 2)
    assert(math.abs(out(0).getDouble(1) - 1.0 / math.sqrt(5)) < 1e-5)
    assert(math.abs(out(1).getDouble(1) - 2.0 / math.sqrt(5)) < 1e-5)
    assert(math.abs(out(0).getDouble(2) - 5.0) < 1e-5) // eigenvalue estimate
    assert(out(1).getDouble(1) > 0) // sign convention: dominant coord positive
  }

  test("hardNegatives: only cross-cluster neighbors, ranked by cosine") {
    // seeds 1 (x-axis) and 2 (y-axis); 3 and 5 join cluster 1, 4 joins 2.
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.9f, 0.1f)),
      (4L, Seq(0.1f, 0.9f)),
      (5L, Seq(0.8f, 0.6f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(emb, emb.filter(col("vec_id") === 1), 5, 2)
      .orderBy("rank").collect()
    // query 1 is in cluster 1 with 3 and 5: those NEVER appear; among the
    // cluster-2 vectors, 4 (cos ~0.110) outranks 2 (cos 0).
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(4L, 2L))
    assert(out.forall(_.getAs[Long]("neighbor_cluster") == 2L))
    assert(out(0).getAs[Double]("cosine") > out(1).getAs[Double]("cosine"))
  }

  test("silhouette: tight two-cluster layout scores near 1; a/b are centroid distances") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.9f, 0.1f)), (4L, Seq(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.silhouette(emb, 2).orderBy("vec_id").collect()
    // clusters {1,3} and {2,4}; centroids (0.95, 0.05) / (0.05, 0.95)
    assert(out.map(_.getAs[Long]("cluster_id")).toSeq == Seq(1L, 2L, 1L, 2L))
    val a1 = out(0).getAs[Double]("a_dist")
    val b1 = out(0).getAs[Double]("b_dist")
    assert(math.abs(a1 - math.sqrt(2 * 0.05 * 0.05)) < 1e-5)
    assert(math.abs(b1 - math.sqrt(2 * 0.95 * 0.95)) < 1e-5)
    val s1 = out(0).getAs[Double]("silhouette")
    assert(math.abs(s1 - (b1 - a1) / b1) < 1e-5 && s1 > 0.9)
    // mirror symmetry: corner vectors (1, 2) share one score, inner
    // vectors (3, 4) another — the corner is farther from the OTHER
    // centroid, so exactly two distinct values appear
    val ss = out.map(_.getAs[Double]("silhouette"))
    assert(ss(0) == ss(1) && ss(2) == ss(3) && ss(0) > ss(2))
  }

  test("kmeansCosineIterate: magnitude-blind assignment, unit-norm centroids") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),   // seed / cluster 1
      (2L, Seq(0.0f, 1.0f)),   // seed / cluster 2
      (3L, Seq(2.0f, 0.2f)),   // large magnitude, direction ~x -> cluster 1
      (4L, Seq(0.01f, 0.5f))   // small magnitude, direction ~y -> cluster 2
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansCosineIterate(emb, 2)
      .orderBy("cluster_id", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._1).distinct.toSeq == Seq(1L, 2L))
    assert(out.forall(_._4 == 2L)) // two members each
    // cluster 1 mean = (1.5, 0.1); normalized = (0.997785, 0.066519)
    assert(math.abs(out(0)._3 - 0.997785) < 1e-6)
    assert(math.abs(out(1)._3 - 0.066519) < 1e-6)
    // every centroid is unit-norm after normalization
    val byCluster = out.groupBy(_._1).values
    byCluster.foreach { dims =>
      val norm = math.sqrt(dims.map(d => d._3 * d._3).sum)
      assert(math.abs(norm - 1.0) < 1e-4)
    }
  }

  test("productQuantize: subspaces assign independently to different codes") {
    // 4-dim vectors, subDim=2 -> 2 subspaces; seeds = vectors 0 and 1.
    // v0 = (0,0 | 9,9), v1 = (9,9 | 0,0). v2 = (1,1 | 8,8): its FIRST
    // subspace is near v0's, its SECOND near v0's too; v3 = (8,8 | 1,1)
    // mirrors to v1. A whole-vector assignment could never produce the
    // crossed case v4 = (0,0 | 0,0): sub 0 -> code 0, sub 1 -> code 1.
    val emb = Seq(
      (0L, Seq(0f, 0f, 9f, 9f)), (1L, Seq(9f, 9f, 0f, 0f)),
      (2L, Seq(1f, 1f, 8f, 8f)), (3L, Seq(8f, 8f, 1f, 1f)),
      (4L, Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.productQuantize(emb, subDim = 2, k = 2)
      .orderBy("vec_id", "subspace").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 10)
    val codes = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(codes((2L, 0L)) == 0L && codes((2L, 1L)) == 0L)
    assert(codes((3L, 0L)) == 1L && codes((3L, 1L)) == 1L)
    assert(codes((4L, 0L)) == 0L && codes((4L, 1L)) == 1L) // crossed
    // distortion is the exact squared subspace distance: v2 sub0 vs (0,0) = 2
    assert(out.find(t => t._1 == 2L && t._2 == 0L).get._4 == 2.0)
    // seeds quantize to themselves at zero distortion
    assert(out.filter(t => t._1 <= 1L).forall(t => t._4 == 0.0 && t._3 == t._1))
  }

  test("annAdcTopK: ranks by summed per-subspace code distances, never reads vectors") {
    // Same layout as the PQ test; query = v0. Codes: v2 -> (0,0),
    // v4 -> (0,1), v1 -> (1,1). Query-to-centroid table for v0:
    // sub0 {code0: 0, code1: 162}, sub1 {code0: 0, code1: 162}.
    // ADC: v2 = 0 (quantization collapses its true distance 4 onto the
    // seed), v4 = 162, v1 = 324 — rank order v2, v4, v1.
    val emb = Seq(
      (0L, Seq(0f, 0f, 9f, 9f)), (1L, Seq(9f, 9f, 0f, 0f)),
      (2L, Seq(1f, 1f, 8f, 8f)), (4L, Seq(0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.annAdcTopK(emb, emb.filter(col("vec_id") === 0L),
        k = 3, subDim = 2, nCodes = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0L, 1L, 2L, 0.0), (0L, 2L, 4L, 162.0), (0L, 3L, 1L, 324.0)))
  }

  test("embeddingOutliers: far tail flagged within its own cluster only") {
    // cluster around seed 0 at origin: members at distance 0,1,1,1,10 —
    // p90 threshold sits below 10, so ONLY the far point flags. A second
    // tight cluster at (100,100) must stay unflagged even though its
    // absolute distances to origin are huge (per-cluster gate).
    val emb = (Seq(
      (0L, Seq(0f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(0f, 1f)),
      (4L, Seq(-1f, 0f)), (5L, Seq(10f, 0f)),
      (1L, Seq(100f, 100f)), (6L, Seq(101f, 100f)), (7L, Seq(100f, 101f))))
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingOutliers(emb, k = 2, p = 0.9)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    val flagged = out.filter(_._3).map(_._1).toSet
    assert(flagged == Set(5L), s"flagged $flagged")
    // cluster memberships: near-origin points with seed 0, far with seed 1
    assert(out.filter(t => Set(2L, 3L, 4L, 5L).contains(t._1)).forall(_._2 == 0L))
    assert(out.filter(t => Set(6L, 7L).contains(t._1)).forall(_._2 == 1L))
  }

  test("rangeSearch: variable-cardinality neighbors; zero-norm never matches") {
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(0.6f, 0.8f)), (4L, Seq(0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.rangeSearch(emb, emb.filter($"vec_id" < 2), 0.5)
      .orderBy("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (0L, 1L, 1.0), (0L, 3L, 0.6),
      (1L, 0L, 1.0), (1L, 3L, 0.6)))
  }

  test("pqDistortion: per-subspace codebook card from a code table") {
    val pq = Seq(
      (1L, 0L, 10L, 1.5), (2L, 0L, 10L, 2.5), (3L, 0L, 20L, 3.0),
      (1L, 1L, 10L, 0.0), (2L, 1L, 10L, 0.0), (3L, 1L, 10L, 0.0))
      .toDF("vec_id", "subspace", "code", "distortion")
    val out = Similarity.pqDistortion(pq).orderBy("subspace").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0L, 3L, 2L, 2.333333, 3.0),   // mean round((1.5+2.5+3)/3, 6)
      (1L, 3L, 1L, 0.0, 0.0)))       // one dominant code -> codes_used 1
  }


  test("mipsTopK: magnitude ranks where cosine would tie") {
    val corpus = Seq(
      (1L, Seq(0.9f, 0.0f)), (2L, Seq(10.0f, 0.0f)), (3L, Seq(-5.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq((99L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.mipsTopK(corpus, q, 3).orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // dot: 10 > 0.9 > -5 — cosine would tie vectors 1 and 2 at 1.0
    assert(out.toSeq == Seq((1L, 2L, 10.0), (2L, 1L, 0.9), (3L, 3L, -5.0)))
  }


  test("normHistogram: exact norms into equal-width bins") {
    // norms 1, 5 over 2-dim vectors; range [1,5], 2 bins of width 2
    val e = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),   // norm 1 -> bin 0
      (3L, Seq(3.0f, 4.0f)))                          // norm 5 -> bin 1
      .toDF("vec_id", "embedding")
    val out = Similarity.normHistogram(e, 2).orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0, 2L, 1.0, 1.0), (1, 1L, 5.0, 5.0)))
  }

  test("mutualKnnGraph: only mutual pairs survive, emitted once with a < b") {
    // directed 2-NN list: (1,2) mutual, (1,3) one-way, (2,3) mutual
    val nn = Seq(
      (1L, 1L, 2L, 0.9), (1L, 2L, 3L, 0.5),
      (2L, 1L, 1L, 0.9), (2L, 2L, 3L, 0.8),
      (3L, 1L, 2L, 0.8), (3L, 2L, 4L, 0.1),
      (4L, 1L, 2L, 0.2)) // 4->2 one-way (2 doesn't list 4)
      .toDF("query_id", "rank", "neighbor_id", "cosine")
    val out = Similarity.mutualKnnGraph(nn).orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 0.9), (2L, 3L, 0.8)))
    // end-to-end with brute k-NN: two tight clusters -> edges stay inside
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.99f, 0.01f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.01f, 0.99f)))
      .toDF("vec_id", "embedding")
    val g = Similarity.mutualKnnGraph(Similarity.bruteForceTopK(emb, emb, 1))
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(g.toSeq == Seq((1L, 2L), (3L, 4L)))
  }

  test("labelMargin: separated classes score perfectly; a planted stray drags its class") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.2f, 0.2f), 0),
      (3L, Seq(10.0f, 10.0f), 1), (4L, Seq(10.2f, 9.8f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelMargin(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out(0L)._1 == 2L && out(1L)._1 == 2L)
    assert(out(0L)._2 > 0 && out(1L)._2 > 0)          // positive margins
    assert(out(0L)._3 == 1.0 && out(1L)._3 == 1.0)    // all nearest-own
    // plant a label-0 vector inside class 1's region: class 0's accuracy
    // drops and its mean margin goes negative-ward
    val dirty = emb.unionByName(
      Seq((5L, Seq(10.1f, 10.1f), 0)).toDF("vec_id", "embedding", "label"))
    val d = Similarity.labelMargin(dirty).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(d(0L)._1 == 3L && d(0L)._3 < 1.0)
    assert(d(0L)._2 < out(0L)._2)
  }

  test("effectiveRank: one active dimension -> 1, isotropic 2-D -> 2") {
    // all variance on dim 0: rank collapses to 1
    val flat = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)),
      (3L, Seq(3.0f, 0.0f))).toDF("vec_id", "embedding")
    val r1 = Similarity.effectiveRank(flat).collect().head
    assert(r1.getLong(0) == 4L) // 2x2 entries
    assert(math.abs(r1.getDouble(3) - 1.0) < 1e-3)
    // 4 unit vectors on both axes: cov = diag(.5, .5) -> rank exactly 2
    val iso = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.effectiveRank(iso).collect().head
    assert(math.abs(r2.getDouble(1) - 1.0) < 1e-5)  // trace = .5 + .5
    assert(math.abs(r2.getDouble(3) - 2.0) < 1e-3)
  }

  test("effectiveRank: |cov| > 3e3 no longer overflows the k-squared cut") {
    // ADVICE r16: k = round(cov·1e6) made k·k exceed 2^63 past
    // |cov| ≈ 3×10³ and throw under ANSI; the square now rides
    // DECIMAL(38,0), overflow-free for every bigint k. Hand numbers:
    // diag(5000, 5000) -> trace 10⁴, ‖C‖²_F = 5×10⁷, rank 10⁸/5×10⁷ = 2.
    val cov = Seq((0, 0, 5000.0), (0, 1, 0.0), (1, 0, 0.0), (1, 1, 5000.0))
      .toDF("i", "j", "cov")
    val r = Similarity.effectiveRank(spark.emptyDataFrame,
      precomputedCov = Some(cov)).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 10000.0)
    assert(math.abs(r.getDouble(2) - math.sqrt(5.0e7)) < 1e-4)
    assert(r.getDouble(3) == 2.0)
  }

  test("isotropy: orthogonal pair scores 0, collapsed pair scores 1, zero vector drops") {
    // orthogonal unit vectors: sum vector (1,1), ||.||^2 = 2 = self term
    val ortho = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val o = Similarity.isotropy(ortho).collect().head
    assert((o.getLong(0), o.getLong(1)) == (2L, 2L))
    assert(o.getDouble(2) == 2.0 && o.getDouble(3) == 2.0 &&
      o.getDouble(4) == 0.0)
    // identical vectors (norms 2, units (1,0)): ||sum||^2 = 4, self 2
    // -> mean pairwise cos (4-2)/(2*1) = 1; the zero vector is excluded
    // from both the sums and n_vectors
    val coll = Seq((1L, Seq(2.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val c = Similarity.isotropy(coll).collect().head
    assert(c.getLong(0) == 2L)
    assert(c.getDouble(2) == 4.0 && c.getDouble(3) == 2.0 &&
      c.getDouble(4) == 1.0)
    // single vector: pairwise mean undefined -> NULL, not 0/0
    val one = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.isotropy(one).collect().head.isNullAt(4))
  }

  test("allButTheTop: collinear corpus collapses to zero; PC-orthogonal") {
    // All variance along dim 1: x - mu is collinear with the top PC, so
    // the correction removes everything (up to the 6-dp routing).
    val line = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)),
      (3L, Seq(3.0f, 0.0f)), (4L, Seq(4.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val z = Similarity.allButTheTop(line).collect()
    assert(z.length == 8)
    assert(z.forall(r => math.abs(r.getDouble(2)) <= 1e-6))
    // 2-dim spread: every corrected vector is orthogonal to the top PC
    val emb = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 5.0f)),
      (3L, Seq(2.0f, 1.0f)), (4L, Seq(4.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val pc = Similarity.pcaPowerIteration(emb).orderBy("i").collect()
      .map(_.getDouble(1))
    val byVec = Similarity.allButTheTop(emb).collect()
      .groupBy(_.getLong(0)).view.mapValues(rs =>
        rs.sortBy(_.getLong(1)).map(_.getDouble(2))).toMap
    assert(byVec.size == 4)
    byVec.values.foreach { v =>
      val dot = v.zip(pc).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) < 1e-4, s"residual projection $dot")
    }
  }

  test("eigenGap: axis-aligned spectrum 2/0.5; rank-1 second eigenvalue ~0") {
    // cov of {(±2,0),(0,±1)} = diag(2, 0.5): λ1/λ2 = 4
    val emb = Seq((1L, Seq(2.0f, 0.0f)), (2L, Seq(-2.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.eigenGap(emb).collect().head
    assert(math.abs(r.getDouble(0) - 2.0) < 0.02, s"lambda1 ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 0.5) < 0.02, s"lambda2 ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 4.0) < 0.3, s"ratio ${r.getDouble(2)}")
    // rank-1 corpus: deflation leaves only 6-dp rounding dust
    val r1 = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 6.0f)))
      .toDF("vec_id", "embedding")
    val o = Similarity.eigenGap(r1).collect().head
    assert(math.abs(o.getDouble(0) - 5.0) < 1e-3)
    assert(o.getDouble(1) < 0.01, s"lambda2 ${o.getDouble(1)}")
    assert(o.isNullAt(2) || o.getDouble(2) > 100.0)
  }

  test("binaryCodes: exact bit placement across the two halves") {
    // 40-dim vector: positives at dims 0, 31, 32, 39 -> lo bits {0,31},
    // hi bits {0, 7}; zeros and negatives never set a bit
    val v = Array.fill(40)(-1.0f)
    v(0) = 0.5f; v(31) = 2.0f; v(32) = 0.1f; v(39) = 3.0f
    v(5) = 0.0f // zero is NOT positive
    val emb = Seq((1L, v.toSeq), (2L, Seq.fill(40)(-1.0f).toSeq))
      .toDF("vec_id", "embedding")
    val out = Similarity.binaryCodes(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((1L | (1L << 31), 1L | (1L << 7))))
    assert(out(2L) == ((0L, 0L)))
  }

  test("matryoshka truncation: prefix retrieval loses the tail signal") {
    // query 0's full-dim nearest is 2 (tail dims dominate); the 2-dim
    // prefix ranks 1 first (exact prefix match, tie -> lower id)
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 10.0f)),
      (1L, Seq(1.0f, 0.0f, 0.0f, -10.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f, 10.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0L)
    val exact = Similarity.bruteForceTopK(emb, q, 1)
    def trunc(df: org.apache.spark.sql.DataFrame, p: Int) =
      df.select($"vec_id",
        org.apache.spark.sql.functions.slice($"embedding", 1, p)
          .as("embedding"))
    assert(exact.collect().head.getLong(2) == 2L)
    val full = Similarity.recallAtK(
      Similarity.bruteForceTopK(trunc(emb, 4), trunc(q, 4), 1), exact)
      .collect().head
    assert(full.getDouble(1) == 1.0)
    val pre2 = Similarity.recallAtK(
      Similarity.bruteForceTopK(trunc(emb, 2), trunc(q, 2), 1), exact)
      .collect().head
    assert(pre2.getDouble(1) == 0.0)
  }

  test("intrinsicDimension: hand-computed 1-D line MLE; exact duplicates dropped") {
    // points 0, 1, 3 on a line (2-D ambient): μ² ratios 9, 4, 9/4 →
    // Σ ln μ = ln 9, d̂ = 3/ln 9 ≈ 1.3654 — a 1-D manifold, not the
    // ambient 2
    val line = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0)), (3L, Seq(3.0, 0.0)))
      .toDF("vec_id", "embedding")
    val r = Similarity.intrinsicDimension(line).collect().head
    assert(r.getLong(0) == 3L)
    assert(math.abs(r.getDouble(1) - math.log(9.0)) < 1e-6)
    assert(math.abs(r.getDouble(2) - 3.0 / math.log(9.0)) < 1e-5)

    // an exact duplicate pair has r₁ = 0: both copies drop; point 1 now
    // sees the two copies at equal distance (μ = 1 contributes 0), point
    // 3 keeps ln 1.5
    val withDup = line.unionByName(
      Seq((99L, Seq(0.0, 0.0))).toDF("vec_id", "embedding"))
    val d = Similarity.intrinsicDimension(withDup).collect().head
    assert(d.getLong(0) == 2L)
    assert(math.abs(d.getDouble(1) - math.log(1.5)) < 1e-6)
  }

  test("srpAutoPlanes: occupancy-constant plane count, clamped") {
    // 500 vectors at target 32 → 4 planes (the committed oracle scale);
    // 10x data adds ~3 planes, not 0 — the log-growth contract
    assert(Similarity.srpAutoPlanes(500) == 4)
    assert(Similarity.srpAutoPlanes(5000) == 8)
    assert(Similarity.srpAutoPlanes(2000) == 6)
    assert(Similarity.srpAutoPlanes(1) == 2)      // min clamp
    assert(Similarity.srpAutoPlanes(Long.MaxValue) == 24) // max clamp
  }

  test("lshSelfCandidates: symmetric directed pairs, deduped across tables, no self-pairs") {
    val rng = new scala.util.Random(11)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(16)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val cand = Similarity.lshSelfCandidates(vecs, dim = 16, nPlanes = 3, nTables = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.nonEmpty)
    assert(cand.distinct.length == cand.length)      // deduped
    assert(cand.forall { case (a, b) => a != b })    // no self-pairs
    // bucket collision is symmetric, so the directed pair set must be too
    val set = cand.toSet
    assert(set.forall { case (a, b) => set.contains((b, a)) })
  }

  test("lshSelfTopK at full recall (0-plane-equivalent: 1 plane, many tables) == bruteForceTopK self-kNN") {
    val rng = new scala.util.Random(5)
    val vecs = (0L until 30L).map(i => (i, Seq.fill(8)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    // nPlanes=1 → 2 buckets/table; 8 seeds make a full candidate set
    // overwhelmingly likely — but assert only on the pairs BOTH produce,
    // plus identical ranking where candidates are complete
    val self = Similarity.lshSelfTopK(vecs, 3, dim = 8, nPlanes = 1, nTables = 8)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(vecs, vecs, 3)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // every LSH-ranked triple whose query saw a full candidate set must
    // appear in brute; with 8 single-plane tables the overlap is large
    assert((self intersect brute).size >= (brute.size * 2) / 3)
    // contract shape: rank is dense 1..k per query
    val byQ = self.groupBy(_._1)
    assert(byQ.values.forall(s => s.map(_._2).toSeq.sorted == (1 to s.size).toSeq))
  }

  test("intrinsicDimensionFromCandidates == intrinsicDimension when candidates are all pairs") {
    val rng = new scala.util.Random(17)
    val vecs = (0L until 25L).map(i => (i, Seq.fill(6)(rng.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val e = vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val allPairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        col("a.v").as("qv"), col("b.v").as("cv"))
    val fromCand = Similarity.intrinsicDimensionFromCandidates(allPairs).collect().head
    val exact = Similarity.intrinsicDimension(vecs).collect().head
    assert(fromCand.getLong(0) == exact.getLong(0))
    assert(fromCand.getDouble(2) == exact.getDouble(2)) // identical MLE tail
  }

  test("intrinsicDimensionFromCandidates: a point with < 2 candidates drops out") {
    // 0-1-3 line again, but candidates only give point 0 ONE neighbor:
    // 0 contributes nothing; 1 and 3 keep their full-pair μ
    val v: Map[Long, Seq[Double]] =
      Map(0L -> Seq(0.0, 0.0), 1L -> Seq(1.0, 0.0), 3L -> Seq(3.0, 0.0))
    val cand = Seq(
      (0L, 1L), (1L, 0L), (1L, 3L), (3L, 0L), (3L, 1L))
      .map { case (a, b) => (a, b, v(a), v(b)) }
      .toDF("query_id", "neighbor_id", "qv", "cv")
    val r = Similarity.intrinsicDimensionFromCandidates(cand).collect().head
    // points 1 and 3 survive: μ²(1) = 4/1, μ²(3) = 9/4
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getDouble(1) -
      (0.5 * math.log(4.0) + 0.5 * math.log(9.0 / 4.0))) < 1e-6)
  }

  test("jlDistortion: axis-aligned pairs reproduce the sign-table algebra exactly") {
    // quantization is identity on these (max |v| = 127), so
    // Δq between consecutive axis vectors is (±127, ∓127, 0, 0)-shaped:
    // ratio_pair(i) = Σ_j (s_j,i − s_j,i+1)² / (outDims · 2)
    val vecs = Seq(
      (0L, Seq(127.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 127.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 127.0, 0.0)))
      .toDF("vec_id", "embedding")
    val signs = Similarity.projectionSigns(4, 2)
    def expect(i: Int) =
      (0 until 2).map(j => math.pow(signs(j)(i) - signs(j)(i + 1), 2)).sum /
        (2.0 * 2.0)
    val r = Similarity.jlDistortion(vecs, dim = 4, outDims = 2)
      .collect().head
    assert(r.getLong(0) == 2L)
    val exp = Seq(expect(0), expect(1))
    assert(math.abs(r.getDouble(1) - (exp.sum / 2.0)) < 1e-6)
    assert(r.getDouble(2) == exp.min && r.getDouble(3) == exp.max)
  }

  test("kCenterSeeds: farthest-point rounds on a 1-D layout, ties to lowest id") {
    // positions 0, 1, 10, 11: seed 0 -> farthest 11 (d²=121) ->
    // remaining max-min-d² is 1, tied between ids 1 and 2 -> id 1, then 2
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(10.0, 0.0)), (3L, Seq(11.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kCenterSeeds(vecs, 4).orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.get(2))))
    assert(out.toSeq == Seq(
      (0, 0L, None), (1, 3L, Some(121.0)),
      (2, 1L, Some(1.0)), (3, 2L, Some(1.0))))
  }

}
