package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level building blocks. Everything here composes built-in
  * `org.apache.spark.sql.functions` (whole-stage-codegen'd) — no Scala/JVM
  * UDFs anywhere, so every expression stays inside WholeStageCodegen spans
  * and survives a 100 TB plan unchanged.
  */
object Fns {

  /** Tie-free 6-dp round of a COMPUTED double: `round(x, 6)` rounds
    * Spark's SHORTEST decimal repr while DuckDB rounds the exact binary
    * value, so a sqrt/quotient/percentile result whose shortest repr
    * terminates exactly on a 0.5×10⁻⁶ boundary rounds apart (tie class
    * 4, SCALE.md round-17 section). x·10⁶ is ONE IEEE multiply —
    * identical on both engines — and the scale-0 round of the same
    * double is engine-identical, so round(x·10⁶)/10⁶ never splits.
    * DuckDB mirror: `round(x * 1000000) / 1000000`. Domain:
    * |x|·10⁶ ≲ 2⁵².
    */
  def q6(c: Column): Column = round(c * lit(1e6)) / lit(1e6)

  /** [[q6]] at 9 dp — for the power-iteration chain, whose per-round
    * 9-dp quantizations round PRODUCTS/QUOTIENTS OF GRID VALUES (6-dp
    * cov cells × 9-dp vector components): unlike raw-float products
    * (17-significant-digit shortest reprs, never on a short half), a
    * grid×grid product's shortest repr has ≤ 15 fractional digits and
    * CAN terminate exactly on a 0.5×10⁻⁹ boundary — seed-3 of the r18
    * multi-seed sweep fired exactly this in emb_eigengap's λ₂. DuckDB
    * mirror: `round(x * 1e9) / 1e9`. Domain: |x|·10⁹ ≲ 2⁵².
    */
  def q9(c: Column): Column = round(c * lit(1e9)) / lit(1e9)

  /** [[q6]] at 12 dp — for the graph fixed-point chains (pagerank /
    * katz / HITS / Fiedler / Markov), whose per-cell 12-dp quantizations
    * round QUOTIENTS AND PRODUCTS OF GRID VALUES (a 12-dp rank over an
    * integer out-degree, α × a 12-dp score): rank/deg with deg = 2ᵃ5ᵇ
    * terminates at 13 fractional digits ending in 5 (deg = 2: m·5·10⁻¹³
    * for odd m), the exact shortest-repr-vs-binary divergence class the
    * r19 static census targets — and an iterated chain amplifies one
    * divergent cell into whole-vector drift. DuckDB mirror:
    * `round(x * 1e12) / 1e12`. Exactness domain: |x|·10¹² ≲ 2⁵²
    * (|x| ≲ 4.5e3 — all chain values here are ≤ O(1) scores); beyond it
    * the form stays ENGINE-DETERMINISTIC (both engines run the same two
    * IEEE ops on the same double) but no longer implements a true 12-dp
    * round.
    */
  def q12(c: Column): Column = round(c * lit(1e12)) / lit(1e12)

  /** Raise a frame's parallelism to the session default BEFORE
    * compute-heavy per-row work (r19 optimization round, guide §2.5
    * "input skew / unsplittable file: repartition immediately after the
    * read"): the harness fixtures are single-row-group parquet files, so
    * every scan is ONE task and everything upstream of the first
    * exchange — N² broadcast-join probes, posexplode'd covariance
    * products, wide DECIMAL aggregates — ran serially on 1 of 32 cores
    * (measured: brute-force kNN 5.24 s → 0.69 s, covariance-input
    * spread similar, corr 2.49 s → 0.89 s at sf0.1).
    *
    * Scale-adaptive by construction: a round-robin repartition UP to
    * `defaultParallelism`, applied only when the frame has FEWER
    * partitions than that — a 100 TB scan already has thousands of
    * splits and passes through untouched, so no cluster-scale plan
    * pays a shuffle for this. Use ONLY where downstream results are
    * order-independent (fully-ordered windows, DECIMAL/integer sums,
    * per-row IEEE arithmetic — the repo-wide determinism discipline).
    *
    * Hash-partitioned on xxhash64 of every (hashable) column rather
    * than round-robin: a keyless `repartition(n)` first pays Spark's
    * sort-before-repartition local sort of the full rows (measured
    * +0.5 s on the 600k-row lineitem frame), while an expression
    * repartition is one codegen'd hash per row, retry-deterministic
    * because the key is a pure function of the row.
    */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else {
      // MapType is unhashable in Spark; rows here always carry id/value
      // columns, so the hashable subset is never empty in practice —
      // fall back to round-robin if it ever is.
      def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
        case _: org.apache.spark.sql.types.MapType => true
        case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
        case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
        case _ => false
      }
      val hashable = df.schema.fields.filterNot(f => hasMap(f.dataType))
      if (hashable.isEmpty) df.repartition(p)
      else df.repartition(p, xxhash64(hashable.map(f => col(f.name)).toSeq: _*))
    }
  }

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Sliding word n-gram shingles (duplicates preserved; wrap in
    * array_distinct for set semantics). Empty array when < n tokens.
    * Indices are guarded so `element_at` never goes out of range (Spark 4
    * runs ANSI mode by default, where that is a runtime error).
    *
    * CONTRACT: `toks` must be a materialized column ATTRIBUTE (project
    * the token array in its own select first), never a nested
    * expression like `tokens(col)` — the lambda's `element_at` calls
    * re-evaluate their child per element, so a nested split re-runs
    * O(tokens·n) times per row (measured 6.2 → 0.9 s at sf0.1 on the
    * shingle cards when the array was hoisted).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array())

  /** `call_function` for graft's native expressions, with best-effort
    * lazy registration against the thread's active (or JVM default)
    * session first — so a library caller who builds columns with
    * [[dotProduct]]/[[cosine]] etc. WITHOUT going through a harness
    * entry point (which all call `GraftFunctions.register` explicitly)
    * still resolves `graft_*` at analysis. The ensure is one registry
    * lookup when already registered; a no-op without a live session.
    */
  def callGraft(name: String, args: Column*): Column = {
    graft.expressions.GraftFunctions.ensureRegistered()
    call_function(name, args: _*)
  }

  /** [[callGraft]] for functions with an interpreted twin: when NO
    * session is visible at Column-construction time (so lazy
    * registration has nowhere to land), return the semantically
    * identical interpreted formulation instead of a column that will
    * fail analysis — the library-caller safety net the native fast
    * path sits behind.
    */
  private def callGraftOr(name: String, fallback: => Column,
                          args: Column*): Column =
    if (graft.expressions.GraftFunctions.ensureRegistered())
      call_function(name, args: _*)
    else fallback

  /** Dot product of two double arrays — the native codegen'd expression
    * [[graft.expressions.ArrayDot]] (one fused loop, left-to-right IEEE
    * accumulation: bit-identical to [[dotProductInterpreted]], ~20×
    * faster — this sits inside every O(pairs) distance join, where the
    * interpreted fold was the measured bench bottleneck). NULL on NULL
    * input, length mismatch, or NULL element — the zip_with null algebra.
    * Registration is lazy via [[callGraft]]; no explicit
    * `GraftFunctions.register` call is required of the caller.
    */
  def dotProduct(a: Column, b: Column): Column =
    callGraftOr("graft_dot", dotProductInterpreted(a, b), a, b)

  /** Reference formulation of [[dotProduct]] via built-in higher-order
    * functions — interpreted, kept as the semantic oracle for tests.
    */
  def dotProductInterpreted(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(dotProduct(a, a))

  /** Cosine similarity — the native codegen'd expression
    * [[graft.expressions.CosineSimilarity]] (one fused loop; ~25× faster
    * than the three interpreted HOF folds of [[cosineInterpreted]], with
    * bit-identical results). NULL (not NaN) when either vector has zero
    * norm — NaN sorts above every value in Spark, so an unguarded zero
    * vector would pass `>= threshold` filters and take rank 1 in top-k;
    * NULL drops out of both. Registration is lazy via [[callGraft]].
    */
  def cosine(a: Column, b: Column): Column =
    callGraftOr("graft_cosine", cosineInterpreted(a, b), a, b)

  /** Reference formulation of [[cosine]] via built-in higher-order
    * functions — interpreted, kept as the semantic oracle for tests.
    */
  def cosineInterpreted(a: Column, b: Column): Column = {
    // stays on the interpreted fold on purpose: an oracle that composed
    // the native expression would no longer be independent evidence
    val na = sqrt(dotProductInterpreted(a, a))
    val nb = sqrt(dotProductInterpreted(b, b))
    when(na > 0 && nb > 0, dotProductInterpreted(a, b) / (na * nb))
  }

  val FpMod = 1000000007L

  /** Cheap deterministic per-token hash that is also expressible in ANSI-ish
    * SQL (length/first/last code points) — used by the rolling document
    * fingerprint so the DuckDB oracle can reproduce it exactly.
    */
  def tokenHash(tok: Column): Column =
    // length cast to long BEFORE the multiply: int arithmetic would be an
    // ANSI overflow error for pathological multi-megabyte tokens.
    (length(tok).cast("long") * 131 + ascii(substring(tok, 1, 1)) * 7 +
      ascii(substring(tok, -1, 1))) % FpMod

  /** Polynomial rolling hash over a token array (Rabin–Karp style):
    * h = fold(tokens, 0, (acc, t) -> (acc*31 + tokenHash(t)) mod p).
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => (acc * 31L + tokenHash(t)) % FpMod)

  /** k-th MinHash permutation of a 64-bit base hash: (a_k*h + b_k) mod p
    * with p = 2^31 - 1 and per-permutation constants derived from k. All
    * operands stay below 2^31, so the product fits a long without overflow
    * (Spark 4 ANSI mode makes long overflow a runtime error). Base hash is
    * xxhash64 (built-in, codegen'd), folded into [0, p).
    */
  val MinHashPrime = 2147483647L // 2^31 - 1

  def minhashPerm(baseHash: Column, k: Int): Column = {
    // Deterministic multiplier/offset per permutation index, both in [1, p).
    val a = (0x9E3779B97F4A7C15L * (2 * k + 1) & 0x7FFFFFFFL) | 1L
    val b = 0xC2B2AE3D27D4EB4FL * (k + 1) & 0x7FFFFFFFL
    pmod(pmod(baseHash, lit(MinHashPrime)) * lit(a) + lit(b), lit(MinHashPrime))
  }

  /** Non-negative modulo. */
  def pmod(x: Column, m: Column): Column = ((x % m) + m) % m
}
