package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-thread MD5 plumbing for the signature kernels: one digest
  * instance reused across rows (MessageDigest.getInstance per call measured
  * ~30% of kernel time), hex output identical to Spark's `md5()` (lowercase,
  * 32 chars over the UTF-8 bytes).
  */
object HashKernels {

  private val mdPrime = 2147483647L // 2³¹−1, Kirsch-Mitzenmacher modulus

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** md5 hex (lowercase, 32 chars) of a UTF8String's bytes — byte-identical
    * to Spark SQL `md5(CAST(x AS BINARY))`. */
  private def md5Hex(s: UTF8String): Array[Char] = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    out
  }

  /** Parse hex[from, from+len) as an unsigned base-16 long (len ≤ 15, so the
    * value fits in 60 bits) — the kernel twin of Spark
    * `conv(substring(h, from+1, len), 16, 10)`. */
  private def hexLong(hex: Array[Char], from: Int, len: Int): Long = {
    var v = 0L
    var i = from
    val end = from + len
    while (i < end) {
      val c = hex(i)
      v = (v << 4) | (if (c <= '9') c - '0' else c - 'a' + 10).toLong
      i += 1
    }
    v
  }

  /** SimHash-32 of a shingle array: bit j−1 (j = 1..32) is set iff
    * Σ_shingles (2·(ascii(hexchar j of md5(sh)) % 2) − 1) > 0.
    * Exactly the arithmetic of the SQL formulation it replaces
    * (`graft.ops.Dedup.simhash` round 1-2): hex char ASCII parity → ±1 →
    * signed sum → sign bit. Callers pass DISTINCT shingles (set semantics).
    *
    * One MD5 and one 32-step loop per shingle, zero joins/shuffles — the
    * whole signature is computed where the document row already lives. */
  def simhash32(shingles: ArrayData): Long = {
    val counts = new Array[Int](32)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val hex = md5Hex(shingles.getUTF8String(i))
      var j = 0
      while (j < 32) {
        // ascii parity: '0'..'9','a'..'f' — char code % 2, as in the SQL twin
        counts(j) += 2 * (hex(j) % 2) - 1
        j += 1
      }
      i += 1
    }
    var hash = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) hash |= 1L << j
      j += 1
    }
    hash
  }

  /** Kirsch-Mitzenmacher MinHash signature of a shingle array: base hashes
    * h1 = hex[0,15) % p, h2 = hex[16,31) % p of md5(shingle), permutation i
    * is gᵢ = (h1 + i·h2) % p, signature element i is the min over shingles.
    * Identical arithmetic to the SQL formulation (`graft.ops.Dedup`
    * round 1-2: `conv(substring(h, 1, 15), 16, 10) % p` etc.), so the LSH
    * band keys — and the DuckDB oracle — are unchanged. */
  def minhashSig(shingles: ArrayData, nSeeds: Int): ArrayData = {
    val mins = Array.fill(nSeeds)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val hex = md5Hex(shingles.getUTF8String(i))
      val h1 = hexLong(hex, 0, 15) % mdPrime
      val h2 = hexLong(hex, 16, 15) % mdPrime
      var s = 0
      while (s < nSeeds) {
        val g = (h1 + s * h2) % mdPrime
        if (g < mins(s)) mins(s) = g
        s += 1
      }
      i += 1
    }
    if (n == 0) null else new GenericArrayData(mins)
  }

  private val shingleSep = UTF8String.fromString(" ")

  /** Winnowing fingerprint set (Schleimer et al., SIGMOD'03) of a word
    * array: md5 hex over POSITIONAL 3-word shingles (duplicates kept — the
    * window minima depend on position), minimum per sliding window of 4
    * (windows shrink at the tail), distinct keeping first occurrence.
    * Byte-identical to the declarative twin
    * (`transform(sequence(1, size(words) - 2), i -> md5(concat_ws(' ',
    * slice(words, i, 3))))` then `array_distinct(transform(sequence(1,
    * size(hs)), i -> array_min(slice(hs, i, 4))))`): hex strings compare
    * bytewise in both engines, so the minima agree. Arrays shorter than 3
    * words yield an empty result. */
  def winnowFp(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val nSh = n - 2
    if (nSh <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val hs = new Array[UTF8String](nSh)
    var i = 0
    while (i < nSh) {
      hs(i) = UTF8String.fromString(new String(md5Hex(UTF8String.concatWs(shingleSep,
        words.getUTF8String(i), words.getUTF8String(i + 1), words.getUTF8String(i + 2)))))
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i < nSh) {
      var min = hs(i)
      var j = i + 1
      val end = math.min(i + 4, nSh)
      while (j < end) {
        if (hs(j).compareTo(min) < 0) min = hs(j)
        j += 1
      }
      seen.add(min)
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Count of elements of `words` that appear in `stops` — the kernel twin
    * of `size(filter(words, x -> array_contains(array(...), x)))`:
    * occurrences counted (not distinct), null elements never match (the HOF
    * twin's lambda yields null for a null word → filtered out). Linear scan
    * per word over the stoplist — for the constant 5-word lists the text
    * pack uses, a hash set costs more than it saves; byte-wise
    * `UTF8String.equals` matches SQL string equality exactly. */
  def stopwordHits(words: ArrayData, stops: Array[UTF8String]): Int = {
    val n = words.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        var j = 0
        var hit = false
        while (!hit && j < stops.length) {
          if (stops(j).equals(w)) hit = true
          j += 1
        }
        if (hit) c += 1
      }
      i += 1
    }
    c
  }

  /** Distinct 3-word shingles of a word array, first-occurrence order —
    * byte-identical to the declarative twin it replaces
    * (`array_distinct(transform(sequence(1, size(words) - 2),
    * i -> concat_ws(' ', slice(words, i, 3))))`): `UTF8String.concatWs` IS
    * `concat_ws` (null elements skipped), and the LinkedHashSet reproduces
    * `array_distinct`'s keep-first ordering. Arrays shorter than 3 words
    * yield an empty result (callers filter them out, as the SQL twin did).
    *
    * Why a kernel: the HOF twin allocates a sequence array, a lambda frame,
    * and a sliced copy PER SHINGLE, and higher-order functions evaluate
    * interpreted — outside whole-stage codegen. One fused loop per document
    * removes all of it; every shingle-family operator (MinHash/LSH, SimHash,
    * Jaccard, decontamination, dup coverage) scans through this. */
  def shingles3(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + 2 < n) {
      seen.add(UTF8String.concatWs(shingleSep,
        words.getUTF8String(i), words.getUTF8String(i + 1), words.getUTF8String(i + 2)))
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** `simhash32(shingles)`: the 32-bit SimHash of a document's distinct
  * shingle set as ONE map-side codegen'd kernel call.
  *
  * Why an Expression: the declarative twin explodes |shingles| rows and runs
  * 32 conditional sums through a hash aggregate — correct, and partial
  * aggregation keeps the exchange small, but every shingle still pays row
  * materialization plus 32 interpreted-ish expression evals, and the plan
  * carries a shuffle purely to regroup what was already per-document data.
  * This kernel keeps the computation inside the document's own
  * WholeStageCodegen span: no explode, no exchange, one fused loop
  * (`HashKernels.simhash32`). The generated code calls the static kernel —
  * same pattern as Spark's own string expressions delegating to UTF8String.
  */
case class SimHash32(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(arr: Any): Any =
    HashKernels.simhash32(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashKernels.simhash32($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** `minhash_sig(shingles)`: the 16-element Kirsch-Mitzenmacher MinHash
  * signature as one map-side kernel call (null for an empty shingle set —
  * no signature, like the aggregate formulation emitting no row). See
  * [[SimHash32]] for why a native kernel beats the explode+groupBy twin. */
case class MinHashSig(child: Expression, nSeeds: Int)
  extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(arr: Any): Any =
    HashKernels.minhashSig(arr.asInstanceOf[ArrayData], nSeeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultCode = nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.HashKernels.minhashSig($a, $nSeeds);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
    resultCode
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `shingles3(words)`: distinct 3-word shingles as one map-side kernel call
  * — the shared front stage of the whole dedup family. See
  * [[graft.functions.HashKernels.shingles3]] for the exact declarative twin
  * and why the fused loop beats it. */
case class Shingles3(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def nullSafeEval(arr: Any): Any =
    HashKernels.shingles3(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashKernels.shingles3($a)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

/** `stopword_hits(words, array('the', ...))`: occurrences of stoplist words
  * in a word array as one codegen'd kernel call — the twin of
  * `size(filter(words, x -> array_contains(array(...), x)))`, whose lambda
  * evaluates interpreted per word (outside whole-stage codegen, one closure
  * dispatch + array_contains scan per element). The language-ID / quality /
  * curation-gate hot path runs this once per language per document over
  * every word, so the constant factor is paid corpus × 4 times. The stoplist
  * folds at plan time into a constant `UTF8String[]` referenced from the
  * generated code. */
case class StopwordHits(child: Expression, stops: Seq[String])
  extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_hits"

  @transient private lazy val stopArr: Array[UTF8String] =
    stops.map(UTF8String.fromString).toArray

  override def nullSafeEval(arr: Any): Any =
    HashKernels.stopwordHits(arr.asInstanceOf[ArrayData], stopArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stops", stopArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.HashKernels.stopwordHits($a, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** `winnow_fp(words)`: the distinct winnowing-fingerprint set as one
  * map-side kernel call — see [[graft.functions.HashKernels.winnowFp]] for
  * the exact declarative twin. */
case class WinnowFp(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(arr: Any): Any =
    HashKernels.winnowFp(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashKernels.winnowFp($a)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}
