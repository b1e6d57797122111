package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind [[NormText]] and [[ZOrder2]] — see each Expression
  * for the declarative twin and why a fused loop replaces it. */
object TextKernels {

  /** Unicode NFC normalization + lowercase + whitespace collapse + trim —
    * the canonicalization pass run before hashing text for dedup (two
    * byte-different encodings of the same rendered string must dedup
    * together, or near-dup recall silently drops on non-ASCII corpora).
    *
    * Exactly `trim(regexp_replace(lower(nfc_normalize(s)), '[ \t\r\n]+', ' ',
    * 'g'))` in DuckDB terms: NFC via `java.text.Normalizer` (both engines
    * implement Unicode 15 NFC — identical output), lowercase via
    * `UTF8String.toLowerCase` (Spark SQL `lower()` itself, unicode-aware
    * like DuckDB's), and the whitespace pass collapses runs of space / tab /
    * CR / LF to one space in a single byte-level scan. ASCII fast path: if
    * no byte ≥ 0x80, NFC is the identity and the String round-trip is
    * skipped entirely — web-scale corpora are mostly-ASCII, so the common
    * row never allocates beyond the output buffer. */
  def normText(s: UTF8String): UTF8String = {
    val nfc =
      if (isAscii(s)) s
      else {
        val str = s.toString
        val n = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
        if (n.eq(str)) s else UTF8String.fromString(n)
      }
    collapseWs(nfc.toLowerCase)
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** Collapse [ \t\r\n]+ runs to a single 0x20 and trim leading/trailing
    * whitespace, byte-level (these separators are single bytes in UTF-8, so
    * multi-byte sequences pass through untouched). */
  private def collapseWs(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val b = s.getByte(i)
      if (b == ' ' || b == '\t' || b == '\r' || b == '\n') {
        if (o > 0) pendingSpace = true // leading ws drops; interior defers
      } else {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = b
        o += 1
      }
      i += 1
    }
    // deferred trailing space never emitted = trim
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  /** Morton/Z-order interleave of the low [[ZOrder2.bits]] bits of two
    * non-negative keys: bit i of `a` lands at output bit 2i, bit i of `b` at
    * 2i+1. 21 bits each (42-bit output) covers 2M distinct values per
    * dimension — the same per-column budget Delta Lake's OPTIMIZE ZORDER
    * uses; keys are masked first so out-of-range values wrap rather than
    * collide across dimensions. */
  def zorder2(a: Long, b: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val x = a & mask
    val y = b & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** `norm_text(s)`: NFC + lowercase + whitespace-collapse + trim as ONE
  * codegen'd kernel call — the canonical text-normalization stage ahead of
  * content hashing / shingling (CCNet/Dolma-style pipelines normalize before
  * dedup for exactly this reason).
  *
  * Why an Expression: the declarative twin chains `lower`, `regexp_replace`,
  * `trim` — three full string materializations per document plus a regex
  * engine pass, and Spark has no NFC builtin at all (the usual fallback is a
  * Scala UDF, which is opaque to codegen AND serializes the string to JVM
  * `String` both ways). One fused byte-scan with an ASCII fast path does the
  * whole pass inside the document's WholeStageCodegen span. */
case class NormText(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_text"

  override def nullSafeEval(s: Any): Any =
    TextKernels.normText(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.normText($a)")

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

/** `zorder2(a, b)`: Morton interleave of two long keys — the multi-dimension
  * clustering key behind data-layout optimization (Delta/Iceberg OPTIMIZE
  * ZORDER). Sorting a table by this key before writing makes EVERY
  * interleaved dimension's min/max file statistics narrow at once, so
  * point/range predicates on either column prune files — the 100 TB lever
  * that turns "scan the table" into "scan the matching 1%".
  *
  * Why an Expression: the declarative twin is a 2·bits-term
  * shift-mask-or chain (see the oracle SQL twin in
  * [[graft.ops.Relational]]) — Catalyst folds it fine but evaluates ~84
  * BinaryArithmetic nodes per row; the kernel is one fused loop, and the
  * generated code stays a single static call inside codegen. */
case class ZOrder2(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.zorder2(a.asInstanceOf[Long], b.asInstanceOf[Long], ZOrder2.bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextKernels.zorder2($a, $b, ${ZOrder2.bits})")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Bits interleaved per dimension (42-bit output) — Delta's OPTIMIZE
    * ZORDER budget; shared with the oracle SQL twin so the check cannot
    * silently diverge. */
  val bits: Int = 21
}
