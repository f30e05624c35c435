package graft.tjk.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature as ONE aggregate over a doc's grams: element j of
  * the result is `min(md5(concat('<j>:', g)))` across the group's grams —
  * exactly the value the explode(k)+builtin-md5+two-level-groupBy pipeline
  * produced, computed without ever materializing the grams×k row explosion.
  *
  * Why an aggregate and not the scalar-per-row form (SURVEY.md §4.3
  * extension 1, the [[WindowNUnique]] precedent): with k=32 the explode
  * form pushed 32× the gram count through posexplode AND a hash-aggregate
  * keyed (doc_id, j) — at bench scale 80M generated rows and 80M agg
  * probes for 2.5M grams, plus a SECOND exchange to assemble per-doc
  * arrays from the (doc_id, j) mins. Here each input row updates a
  * k×16-byte buffer in place (one thread-local MessageDigest serves all k
  * prefixes, digests stay RAW bytes), the group-by key is doc_id alone —
  * ONE exchange, carrying one k×16-byte buffer per doc instead of k hex
  * rows — and hex encoding happens once per doc at eval.
  *
  * Value identity with the explode+md5 form (and so with the frozen DuckDB
  * oracle): Spark's `min` over StringType orders by UTF8String binary
  * compare; on fixed-length lowercase-hex strings that ordering is the
  * unsigned byte order of the underlying digests ('0'<'1'<…<'9'<'a'<…<'f'
  * is monotone in nibble value), so taking the min on raw digest bytes and
  * hex-encoding the survivor yields byte-for-byte the same string as
  * hex-encoding everything and taking the string min. Pinned against the
  * literal built-in-md5 form in TextVecSuite.
  *
  * Null semantics: null grams are skipped (cannot occur from [[shingles]];
  * stated for API completeness); a group with no non-null gram evals to
  * null. k must be a foldable positive int literal ≤ 256.
  */
case class MinHashSig(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Array[Byte]]] {

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tjk_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = {
    val okG = child.dataType == StringType
    val okK = kExpr.dataType == IntegerType && kExpr.foldable
    if (okG && okK) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, literal int), " +
        s"got (${child.dataType.simpleString}, ${kExpr.dataType.simpleString})")
  }

  @transient private lazy val k: Int = {
    val v = kExpr.eval(null).asInstanceOf[Int]
    require(v > 0 && v <= 256, s"$prettyName: k must be in (0, 256], got $v")
    v
  }

  // Buffer: k raw 16-byte MD5 digests, element-wise unsigned-min so far;
  // all-null until the first gram arrives (groups are never empty in
  // practice, but merge must cope with fresh partial buffers).
  override def createAggregationBuffer(): Array[Array[Byte]] =
    new Array[Array[Byte]](k)

  override def update(
      buf: Array[Array[Byte]], input: InternalRow): Array[Array[Byte]] = {
    val g = child.eval(input)
    if (g != null)
      MinHashSig.updateWithGram(buf, g.asInstanceOf[UTF8String].getBytes, k)
    buf
  }

  override def merge(
      a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] = {
    var j = 0
    while (j < k) {
      if (a(j) == null) a(j) = b(j)
      else if (b(j) != null && MinHashSig.compareUnsigned(b(j), a(j)) < 0)
        a(j) = b(j)
      j += 1
    }
    a
  }

  override def eval(buf: Array[Array[Byte]]): Any = {
    if (buf(0) == null) return null // no non-null gram in the group
    val out = new Array[AnyRef](k)
    var j = 0
    while (j < k) { out(j) = MinHashSig.hex(buf(j)); j += 1 }
    new GenericArrayData(out)
  }

  // Fresh buffer ⇒ zero-length payload; otherwise k concatenated digests.
  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    if (buf(0) == null) return Array.emptyByteArray
    val out = new Array[Byte](k * 16)
    var j = 0
    while (j < k) { System.arraycopy(buf(j), 0, out, j * 16, 16); j += 1 }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = new Array[Array[Byte]](k)
    if (bytes.length == 0) return buf
    var j = 0
    while (j < k) {
      val d = new Array[Byte](16)
      System.arraycopy(bytes, j * 16, d, 0, 16)
      buf(j) = d
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object MinHashSig {
  private val Hex = "0123456789abcdef".getBytes("US-ASCII")

  /** "<j>:" UTF-8 prefix bytes, precomputed for every j the k-guard admits. */
  private val Prefixes: Array[Array[Byte]] =
    Array.tabulate(256)(j => s"$j:".getBytes("UTF-8"))

  private val Digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** min(buf(j), md5(prefix_j ++ gram)) for all j, in place. */
  private[expressions] def updateWithGram(
      buf: Array[Array[Byte]], gramBytes: Array[Byte], k: Int): Unit = {
    val md = Digest.get()
    var j = 0
    while (j < k) {
      md.reset()
      md.update(Prefixes(j))
      md.update(gramBytes)
      val d = md.digest()
      if (buf(j) == null || compareUnsigned(d, buf(j)) < 0) buf(j) = d
      j += 1
    }
  }

  private[expressions] def compareUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    0
  }

  private[expressions] def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
