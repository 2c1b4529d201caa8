package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingles of a document, as 64-bit hashes — one
  * native pass (tokenize on spaces, roll the n-gram window, hash, dedupe).
  *
  * Replaces the interpreted HOF pipeline
  * `array_distinct(transform(sequence(...), i -> concat_ws(...)))`, which
  * dominated the dedup operators' runtime (~5 s per evaluation over 5k
  * docs at sf0.1 — and self-joins evaluate their subtree twice). Emitting
  * hashes instead of strings also shrinks the posting-list shuffle to
  * 8-byte keys. 64-bit collisions are negligible at corpus scale
  * (~N²/2⁶⁵), so set sizes and intersection counts match the string-set
  * formulation — the DuckDB oracle stays string-based and hash-parity is
  * verified by the driver.
  *
  * `right` is the n-gram size (foldable int). Fewer than n tokens yields
  * an empty array, matching [[graft.functions.Fns.shingles]].
  */
case class ShingleHashes(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles(text, n) requires (string, foldable int), got $l and $r")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_shingles"

  @transient private lazy val n: Int =
    right.eval().asInstanceOf[Int]

  override def nullSafeEval(t: Any, nVal: Any): Any =
    ShingleUtil.shingleHashes(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The runtime lives in a Scala object; hand the generated Java a
    // reference to it instead of spelling out the $-mangled class name.
    val util = ctx.addReferenceObj("shingleUtil", ShingleUtil,
      ShingleUtil.getClass.getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $util.shingleHashes($t, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

/** POSITIONED duplicate-preserving 31-bit shingle hashes — the
  * winnowing fingerprint stream ([[ShingleUtil.shingleHashes31]]); the
  * codegen'd replacement for the interpreted
  * `transform(sequence(…), i -> concat_ws(…))` + `graft_strhash`
  * pipeline, which cost ~4–6 s per evaluation over the sf0.1 corpus
  * (measured round 12) against ~0.3 s for this single native pass.
  */
case class Shingle31Hashes(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles31(text, n) requires (string, foldable int), got $l and $r")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_shingles31"

  @transient private lazy val n: Int =
    right.eval().asInstanceOf[Int]

  override def nullSafeEval(t: Any, nVal: Any): Any =
    ShingleUtil.shingleHashes31(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = ctx.addReferenceObj("shingleUtil", ShingleUtil,
      ShingleUtil.getClass.getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $util.shingleHashes31($t, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Shingle31Hashes =
    copy(left = newLeft, right = newRight)
}

/** Runtime for [[ShingleHashes]] — called from generated code; ships to
  * executors inside the codegen references array, hence Serializable.
  */
object ShingleUtil extends Serializable {

  /** MurmurHash3 fmix64 finalizer: full avalanche over the polynomial
    * rolling combination so LSH banding sees well-mixed bits.
    */
  private def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** FNV-1a 64 over a byte slice. */
  private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** SimHash modulus: 2^31 − 1, shared with the MinHash permutations. */
  val SimHashPrime: Long = 2147483647L

  /** Per-bit multiplier/offset for the 64 SimHash vote permutations —
    * same derivation as [[graft.functions.Fns.minhashPerm]]'s constants.
    * Public so the oracle-SQL generator embeds the exact values.
    */
  val simhashA: Array[Long] =
    Array.tabulate(64)(k => (0x9E3779B97F4A7C15L * (2 * k + 1) & 0x7FFFFFFFL) | 1L)
  val simhashB: Array[Long] =
    Array.tabulate(64)(k => 0xC2B2AE3D27D4EB4FL * (k + 1) & 0x7FFFFFFFL)

  /** ANSI-expressible 31-bit token hash: polynomial roll of the token's
    * Unicode code points, h = fold(cp, 0, (acc, c) → (acc·131 + c) mod p)
    * with p = 2^31 − 1 — exactly DuckDB's
    * `list_reduce(list_prepend(0, list_transform(string_split(t, ''),
    * c -> ord(c))), (acc, x) -> (acc * 131 + x) % 2147483647)`, so the
    * oracle reproduces fingerprints bit-for-bit (DuckDB splits to code
    * points and `ord` yields the code point; this loop iterates the same).
    */
  def tokenHash31(bytes: Array[Byte], from: Int, until: Int): Long = {
    val s = UTF8String.fromBytes(bytes, from, until - from).toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131 + cp) % SimHashPrime
      i += Character.charCount(cp)
    }
    h
  }

  /** [[tokenHash31]] over a whole UTF8String (the [[StringHash31]]
    * kernel). */
  def codePointHash31(text: UTF8String): Long = {
    val b = text.getBytes
    tokenHash31(b, 0, b.length)
  }

  /** One-pass 64-bit SimHash: whitespace tokens hashed with the
    * ANSI-expressible [[tokenHash31]], then bit k's ±1 vote is the high
    * half of an affine remix (h·a_k + b_k) mod p — h < p and a_k < 2^31,
    * so the product stays under 2^62 (no overflow) — majority vote on the
    * stack, sign → bit. Every piece is plain integer arithmetic, so the
    * DuckDB oracle computes identical fingerprints (xxhash64, which this
    * replaced, has no DuckDB analog and forced a rows-only check).
    * Empty-token documents hash to 0 — callers filter them out to
    * preserve "no tokens, no row".
    */
  def simhash64(text: UTF8String): Long = {
    val bytes = text.getBytes
    val votes = new Array[Int](64)
    val half = (SimHashPrime + 1) / 2 // 1073741824: perm ≥ half ⇒ +1 vote
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) {
          val h = tokenHash31(bytes, start, i)
          var b = 0
          while (b < 64) {
            val perm = (h * simhashA(b) + simhashB(b)) % SimHashPrime
            if (perm >= half) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  /** MinHash signature in the same single pass: for each distinct shingle
    * hash s, base = pmod(xxhash64(s), p) with Spark's XXH64(seed 42) on
    * the long — exactly `xxhash64(shingle)` over the hashed-shingle
    * column — then perm_k = (base·a_k + b_k) mod p with the constants of
    * [[graft.functions.Fns.minhashPerm]]; the signature is the
    * elementwise min. Returns NULL when the document has fewer than n
    * tokens (no shingles ⇒ no signature row, matching the groupBy
    * formulation it replaces).
    */
  def minhashSignature(text: UTF8String, n: Int, numPerms: Int): ArrayData = {
    val shingles = shingleHashArray(text, n)
    if (shingles.isEmpty) return null
    val p = graft.functions.Fns.MinHashPrime
    val sig = Array.fill(numPerms)(Long.MaxValue)
    val as = new Array[Long](numPerms)
    val bs = new Array[Long](numPerms)
    var k = 0
    while (k < numPerms) {
      as(k) = (0x9E3779B97F4A7C15L * (2 * k + 1) & 0x7FFFFFFFL) | 1L
      bs(k) = 0xC2B2AE3D27D4EB4FL * (k + 1) & 0x7FFFFFFFL
      k += 1
    }
    var i = 0
    while (i < shingles.length) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(shingles(i), 42L)
      val base = ((h % p) + p) % p
      k = 0
      while (k < numPerms) {
        val v = (((base * as(k) + bs(k)) % p) + p) % p
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def shingleHashes(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(shingleHashArray(text, n))

  /** POSITIONED 31-bit shingle hashes, duplicates preserved: element i
    * is the [[tokenHash31]] polynomial over the JOINED shingle string
    * `tok(i) ⧺ ' ' ⧺ … ⧺ tok(i+n−1)` — bit-identical to hashing the
    * `concat_ws(" ", …)` string, computed without materializing it (the
    * space contributes its code point 32 to the roll between tokens).
    * Winnowing's per-position fingerprint stream: unlike
    * [[shingleHashes]] this neither dedupes nor avalanches — position
    * order and the ANSI-expressible value are the contract, so the
    * DuckDB oracle rebuilds every element with the same
    * `list_reduce … (acc*131+x) % 2147483647` fold over the shingle
    * string.
    */
  def shingleHashes31(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val bounds = new java.util.ArrayList[Array[Int]](16)
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) bounds.add(Array(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = bounds.size
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    var w = 0
    while (w + n <= m) {
      var h = 0L
      var k = 0
      while (k < n) {
        val b = bounds.get(w + k)
        var j = b(0)
        while (j < b(1)) {
          val cp = s.codePointAt(j)
          h = (h * 131 + cp) % SimHashPrime
          j += Character.charCount(cp)
        }
        if (k < n - 1) h = (h * 131 + 32) % SimHashPrime
        k += 1
      }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  private def shingleHashArray(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    // Token hashes: split on single spaces, skip empty tokens (consecutive
    // spaces) — same semantics as Fns.tokens.
    var tokCount = 0
    var tokHashes = new Array[Long](math.max(8, bytes.length / 4))
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) {
          if (tokCount == tokHashes.length)
            tokHashes = java.util.Arrays.copyOf(tokHashes, tokCount * 2)
          tokHashes(tokCount) = fnv1a(bytes, start, i)
          tokCount += 1
        }
        start = i + 1
      }
      i += 1
    }
    if (tokCount < n) return Array.emptyLongArray
    val seen = new java.util.HashSet[java.lang.Long](tokCount * 2)
    val out = new Array[Long](tokCount - n + 1)
    var outLen = 0
    var w = 0
    while (w + n <= tokCount) {
      var h = 0L
      var k = 0
      while (k < n) { h = h * 0x9E3779B97F4A7C15L + tokHashes(w + k); k += 1 }
      h = fmix64(h)
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      w += 1
    }
    java.util.Arrays.copyOf(out, outLen)
  }
}
