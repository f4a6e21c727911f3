package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the text-dedup gram/hash pipeline (round-16
  * optimization; guide "expressions and codegen").
  *
  * Why these exist: the declarative forms in [[TextFunctions]] build word
  * n-grams with higher-order array lambdas
  * (`transform(sequence(...), i => md5(array_join(slice(ws, i, k), " ")))`).
  * Two structural costs made them the engine's dominant CPU:
  *
  *  1. Higher-order functions never enter whole-stage codegen — every
  *     lambda application walks the interpreted-eval path.
  *  2. A Column reference is a copied expression TREE, not a shared
  *     value: `ws` (the tokenization `split(lower(trim(text)))`) is
  *     re-evaluated for EVERY gram index inside the lambda — ~90
  *     re-tokenizations per document — and the whole chain is evaluated
  *     a second time scan-side when `InferFiltersFromGenerate` pushes a
  *     `size(...) > 0` filter below the reader spread (measured round 16:
  *     a 3.7 s single-task stage under t_winnow_pairs at sf0.1).
  *
  * The kernels take the ALREADY-TOKENIZED array (Spark's own codegen'd
  * `split`/`lower`/`trim` run once per row), so tokenization semantics
  * are Spark's by construction; the gram join, md5, sliding-window min
  * and distinct run in one fused Java pass per row. Each expression
  * documents (and its spec proves) bit-equality with the declarative
  * form it replaces, including null/empty edge cases.
  */
object GramKernels {

  private val Hex = "0123456789abcdef".getBytes("US-ASCII")

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val emptyStrings = new GenericArrayData(Array.empty[Any])
  private val singleNull = new GenericArrayData(Array[Any](null))

  /** `array<string>` of zero elements (null-input form of the winnow set:
    * size 0, array_min/max null, explode emits nothing — exactly the
    * downstream effect of the declarative chain's `[null]` row, whose
    * null fingerprint never equi-joins and never counts).
    */
  def emptyStringArray(): ArrayData = emptyStrings

  /** `[null]` — the declarative `shingles(null)` value (slice/array_join/
    * md5 of a null tokens array inside a 1-element transform).
    */
  def singleNullArray(): ArrayData = singleNull

  /** Lowercase-hex UTF8String of one md5 digest — byte-for-byte the
    * Spark `md5()` output.
    */
  private def hexUtf8(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      out(2 * i) = Hex(b >>> 4)
      out(2 * i + 1) = Hex(b & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** md5 of tokens[from, until) joined with a single ' ' — the digest of
    * `array_join(slice(ws, from+1, until-from), " ")`'s UTF-8 bytes
    * (concatenating valid UTF-8 token bytes with 0x20 IS the joined
    * string's encoding).
    */
  private def gramMd5(toks: Array[Array[Byte]], from: Int, until: Int,
                      md: MessageDigest): Array[Byte] = {
    md.reset()
    var i = from
    while (i < until) {
      if (i > from) md.update(' '.toByte)
      md.update(toks(i))
      i += 1
    }
    md.digest()
  }

  private val unsignedCmp = new java.util.Comparator[Array[Byte]] {
    override def compare(a: Array[Byte], b: Array[Byte]): Int =
      java.util.Arrays.compareUnsigned(a, b)
  }

  /** Distinct winnowing fingerprints of one document, sorted ascending:
    * md5 every k-gram of the NON-EMPTY tokens (short docs truncate to one
    * gram, exactly `slice` semantics), slide a w-window over the gram
    * hashes keeping each window's minimum — full windows only
    * (pos ≥ w−1), except a doc with fewer than w grams contributes its
    * single truncated window — then dedupe. Equality/order is unsigned
    * byte order of the raw digests == UTF8String order of the hex forms,
    * so min/sort agree bit-for-bit with the rows+window form
    * ([[graft.operators.Dedup.winnowSets]] pre-r16).
    */
  def winnowFpSet(tokensArr: ArrayData, k: Int, w: Int): ArrayData = {
    val md = mdLocal.get()
    val nIn = tokensArr.numElements()
    val toks = new Array[Array[Byte]](nIn)
    var nt = 0
    var i = 0
    while (i < nIn) {
      if (!tokensArr.isNullAt(i)) {
        val b = tokensArr.getUTF8String(i).getBytes
        if (b.length > 0) { toks(nt) = b; nt += 1 }
      }
      i += 1
    }
    val g = math.max(nt - k + 1, 1)
    val hashes = new Array[Array[Byte]](g)
    i = 0
    while (i < g) {
      hashes(i) = gramMd5(toks, i, math.min(i + k, nt), md)
      i += 1
    }
    val mins = new java.util.TreeSet[Array[Byte]](unsignedCmp)
    var p = math.min(w - 1, g - 1)
    while (p < g) {
      val lo = math.max(p - w + 1, 0)
      var m = hashes(lo)
      var j = lo + 1
      while (j <= p) {
        if (java.util.Arrays.compareUnsigned(hashes(j), m) < 0) m = hashes(j)
        j += 1
      }
      mins.add(m)
      p += 1
    }
    val out = new Array[Any](mins.size)
    val it = mins.iterator()
    var o = 0
    while (it.hasNext) { out(o) = hexUtf8(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** Distinct word n-grams of one document over the RAW token array (no
    * empty-token filter — `shingles`' contract), joined with ' ', in
    * first-occurrence order (`array_distinct`) or ascending UTF8 binary
    * order (`sort_array`). Null token elements are skipped inside a gram
    * exactly as `array_join` skips them.
    */
  def shinglesArr(tokensArr: ArrayData, n: Int, sort: Boolean): ArrayData = {
    val len = tokensArr.numElements()
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      toks(i) =
        if (tokensArr.isNullAt(i)) null
        else tokensArr.getUTF8String(i).getBytes
      i += 1
    }
    val g = math.max(len - n + 1, 1)
    val seen: java.util.Set[UTF8String] =
      if (sort) new java.util.TreeSet[UTF8String]()
      else new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i < g) {
      val until = math.min(i + n, len)
      var sz = 0
      var cnt = 0
      var j = i
      while (j < until) {
        if (toks(j) != null) { sz += toks(j).length; cnt += 1 }
        j += 1
      }
      val bytes = new Array[Byte](sz + math.max(cnt - 1, 0))
      var pos = 0
      var first = true
      j = i
      while (j < until) {
        if (toks(j) != null) {
          if (!first) { bytes(pos) = ' '.toByte; pos += 1 }
          System.arraycopy(toks(j), 0, bytes, pos, toks(j).length)
          pos += toks(j).length
          first = false
        }
        j += 1
      }
      seen.add(UTF8String.fromBytes(bytes))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** k-slot MinHash signature over a shingle array via
    * Kirsch–Mitzenmacher double hashing — the fused form of
    * [[TextFunctions.minhashFromShingles]]'s chained transforms. Per
    * non-null shingle: one md5; h1 = first 12 hex digits (= first 6
    * digest bytes, big-endian) mod 2^30, h2 = the next 12; slot i
    * minimizes (h1 + i·h2) mod 2^30, initialized at 2^30. Null shingle
    * elements contribute nothing (the declarative fold's `least` skips
    * the null slot vector). Exact long arithmetic — bit-identical.
    */
  def minhashSig(sh: ArrayData, k: Int): ArrayData = {
    val md = mdLocal.get()
    val M = TextFunctions.MinhashMod
    val acc = new Array[Long](k)
    java.util.Arrays.fill(acc, M)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        md.reset()
        md.update(sh.getUTF8String(i).getBytes)
        val d = md.digest()
        var h1 = 0L
        var h2 = 0L
        var j = 0
        while (j < 6) {
          h1 = (h1 << 8) | (d(j) & 0xffL)
          h2 = (h2 << 8) | (d(j + 6) & 0xffL)
          j += 1
        }
        h1 %= M
        h2 %= M
        var s = 0
        while (s < k) {
          val v = (h1 + s * h2) % M
          if (v < acc(s)) acc(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }
}

/** Native winnowing-fingerprint set: `winnow_fp_set(tokens, k, w)` →
  * sorted distinct `array<string>` of window-min md5 hexes. Replaces the
  * interpreted gram-hash transform + posexplode + per-doc window + distinct
  * pipeline with one per-row projection (plan diff in plans/r16): no
  * exchange, no sort, no window, no generate on the fingerprint path.
  * Null tokens array (null text) → EMPTY array: size 0 / null min/max /
  * nothing to explode — the exact downstream effect of the old chain's
  * single null fingerprint row.
  */
case class WinnowFpSet(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 && w >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp_set expects (array<string>, k >= 1, w >= 1), got " +
        s"${other.simpleString}, k=$k, w=$w")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "winnow_fp_set"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) GramKernels.emptyStringArray()
    else GramKernels.winnowFpSet(v.asInstanceOf[ArrayData], k, w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kern = "graft.functions.GramKernels"
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? $kern.emptyStringArray()
                    : $kern.winnowFpSet(${c.value}, $k, $w);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFpSet = copy(child = newChild)
}

/** Native distinct word n-grams: `shingles_arr(tokens, n, sorted)` →
  * `array<string>`. Value-identical to
  * `array_distinct(transform(sequence(1, greatest(size(ws)-(n-1), 1)),
  * i => array_join(slice(ws, i, n), " ")))` (plus `sort_array` when
  * sorted=true), including the null-text `[null]` form.
  */
case class ShinglesArr(child: Expression, n: Int, sorted: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles_arr expects (array<string>, n >= 1), got " +
        s"${other.simpleString}, n=$n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "shingles_arr"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) GramKernels.singleNullArray()
    else GramKernels.shinglesArr(v.asInstanceOf[ArrayData], n, sorted)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kern = "graft.functions.GramKernels"
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? $kern.singleNullArray()
                    : $kern.shinglesArr(${c.value}, $n, $sorted);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShinglesArr = copy(child = newChild)
}

/** Native MinHash signature: `minhash_sig(shingles, k)` → `array<long>`,
  * standard null propagation (null shingle ARRAY → null signature, as the
  * declarative `aggregate` over a null array).
  */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects (array<string>, k >= 1), got " +
        s"${other.simpleString}, k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any =
    GramKernels.minhashSig(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramKernels.minhashSig($c, $k);")

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSig = copy(child = newChild)
}
