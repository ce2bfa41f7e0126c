package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct xxhash64 values of a document's word k-gram shingles, in one
  * compiled pass — the native fusion of
  * [[graft.operators.Dedup.wordShingles]] ∘
  * [[graft.operators.Dedup.hashShingles]], and the hot path of every dedup
  * pipeline (shingling dominated the profile: the higher-order-function
  * formulation evaluates interpreted lambdas per token per gram).
  *
  * Output-set-identical to the HOF chain by construction: the same
  * tokenizer (maximal runs of non-`\s` chars — bit-matched to
  * `TextAnalysis.tokens` and [[SimHash64]]), grams joined by a single
  * space, hashed with Spark's `xxhash64` (seed 42), first-occurrence
  * distinct. A document with fewer than `k` tokens contributes its whole
  * token list as one gram (so short exact duplicates stay detectable);
  * blank documents contribute nothing.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires a string argument, got ${child.dataType.simpleString}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"shingle_hashes requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  /** Exactly Java regex `\s` (see [[SimHash64.isWs]] — shared contract). */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // tokenize: maximal non-whitespace runs (== split("\\s+") minus empties)
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    val n = text.length
    while (start < n) {
      while (start < n && isWs(text.charAt(start))) start += 1
      var end = start
      while (end < n && !isWs(text.charAt(end))) end += 1
      if (end > start) toks += text.substring(start, end)
      start = end
    }
    val nTok = toks.length
    if (nTok == 0) return new GenericArrayData(Array.emptyLongArray)
    // grams i in 0..max(nTok-k, 0): k tokens (or the whole tail when short)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    val last = math.max(nTok - k, 0)
    while (i <= last) {
      sb.setLength(0)
      var j = i
      val stop = math.min(i + k, nTok)
      while (j < stop) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.graft.Bridge
  def shingleHashes(c: Column, k: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), k))
}

/** ORDERED word k-gram shingle hashes — [[ShingleHashes]] without the
  * distinct: element `i` is the hash of the gram STARTING at token `i`,
  * so the array index doubles as the gram position. The positional form
  * exists for span SURGERY ([[graft.operators.Dedup.removeDuplicatedSpans]]):
  * removal must know WHERE a duplicated gram sits, which the set form
  * deliberately erases. Same tokenizer, same join-by-single-space, same
  * seed-42 xxhash64, same short-doc rule (fewer than `k` tokens ⇒ one
  * whole-text gram at position 0), so a hash produced here equals the
  * set form's hash for the same gram — the two expressions share the
  * dup-detection key space by construction. */
case class ShingleHashesAll(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes_all requires a string argument, got ${child.dataType.simpleString}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"shingle_hashes_all requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_all"

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    val n = text.length
    while (start < n) {
      while (start < n && isWs(text.charAt(start))) start += 1
      var end = start
      while (end < n && !isWs(text.charAt(end))) end += 1
      if (end > start) toks += text.substring(start, end)
      start = end
    }
    val nTok = toks.length
    if (nTok == 0) return new GenericArrayData(Array.emptyLongArray)
    val last = math.max(nTok - k, 0)
    val out = new Array[Long](last + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= last) {
      sb.setLength(0)
      var j = i
      val stop = math.min(i + k, nTok)
      while (j < stop) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashesAll {
  import org.apache.spark.sql.graft.Bridge
  def shingleHashesAll(c: Column, k: Int): Column =
    Bridge.column(ShingleHashesAll(Bridge.expression(c), k))
}
