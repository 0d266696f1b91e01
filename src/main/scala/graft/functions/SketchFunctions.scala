package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row set-sketch arithmetic shared by interpreted eval and generated
  * Java. Design point: a document's whole sketch (all MinHash permutations
  * / all SimHash bits) is computed in ONE narrow pass over the document —
  * no shingle-row explosion, no wide aggregate, no shuffle. Two layers:
  *
  *   - `shingleHashes(text, k)`: distinct word-k-shingle hashes straight
  *     from the text bytes. Because tokens are a single-space split and
  *     shingles are space-joined, every shingle IS an exact byte range of
  *     the trimmed text — so each is hashed in place (FNV-1a over the
  *     range) with zero substring materialization. Distinctness is by
  *     64-bit hash (collision odds ~2^-64; candidates are exact-verified
  *     downstream anyway). At 100 TB this sketches text at memory
  *     bandwidth: one byte pass + O(shingles) hash-set ops per document.
  *   - sketch folds over those hashes: MinHash minima via
  *     Kirsch-Mitzenmacher double hashing (g_p = h1 + p*h2 — one byte
  *     pass per shingle, numPerms derived hashes), banded into LSH bucket
  *     hashes; or SimHash bit votes.
  *
  * (An earlier formulation exploded shingles and ran 192 min() aggregate
  * columns through a shuffle; these expressions replace it entirely.)
  */
object SetSketch {

  /** 64-bit avalanche finalizer (splitmix64-style). */
  private def fmix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^ (x >>> 33)
  }

  private def fnv1aRange(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) { h ^= (b(i) & 0xFF).toLong; h *= 0x100000001B3L; i += 1 }
    h
  }

  /** Distinct k-shingle hashes of `text` (single-space tokenization,
    * matching `split(trim(text), " ")` — consecutive spaces yield empty
    * tokens, exactly like the string-shingle path). Returns the distinct
    * hashes in first-seen order; empty when the text has < k tokens.
    */
  def shingleHashes(text: UTF8String, k: Int): Array[Long] = {
    val bytes = text.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    // token start offsets within [lo, hi)
    var nTok = 1
    var i = lo
    while (i < hi) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (hi == lo) nTok = 1 // "" -> one empty token
    if (nTok < k) return Array.emptyLongArray
    val starts = new Array[Int](nTok)
    starts(0) = lo
    var t = 1
    i = lo
    while (i < hi) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    val nSh = nTok - k + 1
    // open-addressing dedup set (power-of-two, load <= 0.5)
    var cap = 4
    while (cap < nSh * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](nSh)
    var nOut = 0
    var s = 0
    while (s < nSh) {
      val from = starts(s)
      val until = if (s + k < nTok) starts(s + k) - 1 else hi
      val h = fnv1aRange(bytes, from, until)
      var slot = (fmix(h) & (cap - 1)).toInt
      var fresh = true
      while (used(slot) && { if (table(slot) == h) { fresh = false; false } else true })
        slot = (slot + 1) & (cap - 1)
      if (fresh) {
        used(slot) = true; table(slot) = h
        out(nOut) = h; nOut += 1
      }
      s += 1
    }
    if (nOut == nSh) out else java.util.Arrays.copyOf(out, nOut)
  }

  /** One LSH bucket hash per band from the MinHash minima of the given
    * shingle hashes (AND within a band, OR across bands). Null-marker:
    * callers map an empty shingle set to SQL NULL so empty documents
    * never co-bucket.
    */
  def bandHashesOf(hashes: Array[Long], numPerms: Int, bands: Int): ArrayData = {
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val base = hashes(i)
      var hp = fmix(base)
      val step = fmix(base ^ 0x9E3779B97F4A7C15L) | 1L
      var p = 0
      while (p < numPerms) {
        if (hp < mins(p)) mins(p) = hp
        hp += step
        p += 1
      }
      i += 1
    }
    val rows = numPerms / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L + b
      var r = b * rows
      while (r < (b + 1) * rows) { acc = fmix(acc ^ mins(r)); r += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of the given shingle hashes (+-1 bit votes). */
  def simhashOf(hashes: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < hashes.length) {
      val h = fmix(hashes(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Distinct k-shingle STRINGS of `text`, one byte pass. Every shingle of
    * a single-space tokenization is an exact byte range of the trimmed
    * text, so the output strings are built straight from ranges; dedup is
    * by 64-bit hash with a byte-compare on hash equality (exact — no
    * collision caveat). First-seen order, matching `array_distinct` over
    * the position-ordered shingle list. Empty array when < k tokens.
    */
  def shingleStrings(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    var nTok = 1
    var i = lo
    while (i < hi) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (hi == lo) nTok = 1
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    starts(0) = lo
    var t = 1
    i = lo
    while (i < hi) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    val nSh = nTok - k + 1
    var cap = 4
    while (cap < nSh * 2) cap <<= 1
    val slotHash = new Array[Long](cap)
    val slotFrom = new Array[Int](cap)
    val slotUntil = new Array[Int](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Any](nSh)
    var nOut = 0
    var s = 0
    while (s < nSh) {
      val from = starts(s)
      val until = if (s + k < nTok) starts(s + k) - 1 else hi
      val h = fnv1aRange(bytes, from, until)
      var slot = (fmix(h) & (cap - 1)).toInt
      var fresh = true
      while (used(slot) && {
        if (slotHash(slot) == h &&
          java.util.Arrays.equals(bytes, slotFrom(slot), slotUntil(slot),
            bytes, from, until)) { fresh = false; false }
        else true
      }) slot = (slot + 1) & (cap - 1)
      if (fresh) {
        used(slot) = true; slotHash(slot) = h
        slotFrom(slot) = from; slotUntil(slot) = until
        out(nOut) = UTF8String.fromBytes(bytes, from, until - from)
        nOut += 1
      }
      s += 1
    }
    new GenericArrayData(
      if (nOut == nSh) out else out.take(nOut))
  }

  /** Winnowing fingerprints of `text` (Schleimer/Wilkerson/Aiken):
    * k-token gram ROLLING hashes (the RollingHash code-point fold — the
    * oracle replays it, so FNV is not an option here), sliding-window
    * minima of w consecutive gram hashes via a monotonic deque (O(n),
    * not O(n*w)), deduped in first-seen order. One fingerprint (the
    * global min) when 0 < grams < w; empty when under k tokens. Single
    * fused pass — the split/transform/slice HOF formulation is
    * duplicated into inferred filters by Catalyst and goes quadratic
    * per row (see Dedup.winnowPairs).
    */
  def winnowHashes(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    var nTok = 1
    var i = lo
    while (i < hi) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (hi == lo) nTok = 1
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    starts(0) = lo
    var t = 1
    i = lo
    while (i < hi) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    val nGram = nTok - k + 1
    // gram rolling hashes (each gram is an exact byte range; k >= 2
    // guarantees a non-empty range, so the fold always has a seed)
    val gh = new Array[Long](nGram)
    var s = 0
    while (s < nGram) {
      val from = starts(s)
      val until = if (s + k < nTok) starts(s + k) - 1 else hi
      val g = UTF8String.fromBytes(bytes, from, until - from).toString
      var acc = 0L
      var first = true
      var ci = 0
      while (ci < g.length) {
        val cp = g.codePointAt(ci)
        ci += Character.charCount(cp)
        if (first) { acc = cp.toLong; first = false }
        else acc = (acc * 31L + cp) % 1000000007L
      }
      gh(s) = acc
      s += 1
    }
    val nWin = if (nGram >= w) nGram - w + 1 else 1
    val mins = new Array[Long](nWin)
    if (nGram < w) {
      var m = Long.MaxValue
      var j = 0
      while (j < nGram) { if (gh(j) < m) m = gh(j); j += 1 }
      mins(0) = m
    } else {
      // ascending-minima deque of indices
      val dq = new Array[Int](nGram)
      var head = 0
      var tail = 0 // exclusive
      var j = 0
      while (j < nGram) {
        while (tail > head && gh(dq(tail - 1)) >= gh(j)) tail -= 1
        dq(tail) = j; tail += 1
        if (dq(head) <= j - w) head += 1
        if (j >= w - 1) mins(j - w + 1) = gh(dq(head))
        j += 1
      }
    }
    // first-seen dedup (open addressing, power-of-two, load <= 0.5)
    var cap = 4
    while (cap < nWin * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Any](nWin)
    var nOut = 0
    var v = 0
    while (v < nWin) {
      val h = mins(v)
      var slot = (fmix(h) & (cap - 1)).toInt
      var fresh = true
      while (used(slot) && { if (table(slot) == h) { fresh = false; false } else true })
        slot = (slot + 1) & (cap - 1)
      if (fresh) {
        used(slot) = true; table(slot) = h
        out(nOut) = h; nOut += 1
      }
      v += 1
    }
    new GenericArrayData(if (nOut == nWin) out else out.take(nOut))
  }

  // Entry points used by generated code (static forwarders).
  def minhashBandsText(text: UTF8String, k: Int, numPerms: Int, bands: Int): ArrayData = {
    val hs = shingleHashes(text, k)
    if (hs.isEmpty) null else bandHashesOf(hs, numPerms, bands)
  }

  def simhashText(text: UTF8String, k: Int): Any = {
    val hs = shingleHashes(text, k)
    if (hs.isEmpty) null else java.lang.Long.valueOf(simhashOf(hs))
  }
}

/** `string -> array<long>`: per-band MinHash-LSH bucket hashes of the
  * text's distinct word-k-shingles, fused into one narrow codegen'd
  * expression. NULL when the text has fewer than k tokens (so empty
  * shingle sets never co-bucket).
  */
case class MinHashBandHashesFromText(child: Expression, k: Int,
    numPerms: Int, bands: Int) extends UnaryExpression {
  require(numPerms % bands == 0, "bands must divide numPerms")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SetSketch.minhashBandsText(input.asInstanceOf[UTF8String], k, numPerms, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.SetSketch.minhashBandsText($c, $k, $numPerms, $bands);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> long`: 64-bit SimHash of the text's distinct
  * word-k-shingles, one narrow codegen'd pass. NULL when < k tokens.
  */
case class SimHash64FromText(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SetSketch.simhashText(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sh")
      s"""
         |Object $tmp = graft.functions.SetSketch.simhashText($c, $k);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $tmp).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> array<string>`: distinct word-k-shingles in one codegen'd
  * byte pass — replaces a split/transform/slice/concat_ws/array_distinct
  * tree that Catalyst's constraint inference would otherwise duplicate
  * into filters and evaluate several times per row.
  */
case class ShinglesFromText(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SetSketch.shingleStrings(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SetSketch.shingleStrings($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> array<long>`: winnowing fingerprints (min-of-window over
  * k-token-gram rolling hashes) in one fused codegen'd pass — replaces a
  * two-level split/transform/slice/array_min HOF stack whose inferred
  * size/isnotnull filters Catalyst duplicates into a per-row quadratic
  * evaluation (measured 87 s vs 0.8 s at sf0.1; see Dedup.winnowPairs).
  * Empty array under k tokens; NULL text -> NULL (explode drops both).
  */
case class WinnowFromText(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2, "winnowing needs k >= 2 (a gram must span a separator)")
  require(w >= 1, "winnowing needs w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SetSketch.winnowHashes(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SetSketch.winnowHashes($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchFunctions {
  /** Column API: distinct word-k-shingles of a text column. */
  def shinglesFromText(text: Column, k: Int): Column =
    GraftBridge.column(ShinglesFromText(GraftBridge.expression(text), k))

  /** Column API: winnowing fingerprints of a text column — per-row,
    * codegen'd, streaming-safe.
    */
  def winnowFromText(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFromText(GraftBridge.expression(text), k, w))

  /** Column API: per-band MinHash-LSH bucket hashes of a text column's
    * word-k-shingles (NULL if fewer than k tokens).
    */
  def minhashBandsFromText(text: Column, k: Int, numPerms: Int,
      bands: Int): Column =
    GraftBridge.column(MinHashBandHashesFromText(
      GraftBridge.expression(text), k, numPerms, bands))

  /** Column API: 64-bit SimHash of a text column's word-k-shingles
    * (NULL if fewer than k tokens).
    */
  def simhash64FromText(text: Column, k: Int): Column =
    GraftBridge.column(SimHash64FromText(GraftBridge.expression(text), k))
}
