package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Carmen's freq cache as a broadcast structure (SURVEY.md §2.B6/E1): a
  * sorted term array + parallel long values (df counts or quantized IDF
  * weights), binary-searched inside map-stage expressions. Replaces
  * explode→join-freq→re-group round trips (two shuffles + a per-doc window)
  * with one in-memory lookup per token.
  *
  * Size: the term dictionary of a web corpus is far smaller than the corpus
  * (~10^8 terms × ~24 B ≈ 2.4 GB at the 100 TB design point — at the
  * broadcast ceiling; beyond it the join-based path in the same operators
  * remains the fallback).
  */
final class TermStatsData(val terms: Array[UTF8String], val values: Array[Long])
    extends Serializable {

  private def lowerBound(key: UTF8String): Int = {
    var lo = 0; var hi = terms.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (terms(mid).compareTo(key) < 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Value for `term`, or 0 when absent (matches the inner-join-with-freq
    * semantics: unknown terms contribute nothing). */
  def valueOf(term: UTF8String): Long = {
    val i = lowerBound(term)
    if (i < terms.length && terms(i) == term) values(i) else 0L
  }

  def size: Int = terms.length
}

object TermStats {

  /** Build from a (term, value) frame — collected through the driver like
    * carmen's freq cache (the dictionary, not the corpus). */
  def build(df: DataFrame): TermStatsData = {
    val rows = df.collect()
    val pairs = rows.map(r => (UTF8String.fromString(r.getString(0)), r.getLong(1)))
      .sortBy(_._1)
    new TermStatsData(pairs.map(_._1), pairs.map(_._2))
  }

  /** term_weight_sum(tokens): Σ value(token) over the array (0 for unknown
    * tokens) — the one-pass replacement for explode ⋈ freq ⋈ re-group. */
  case class TermWeightSum(child: Expression, bc: Broadcast[TermStatsData])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "term_weight_sum"
    override def nullSafeEval(toks: Any): Any = {
      val arr = toks.asInstanceOf[ArrayData]
      var sum = 0L
      var i = 0
      val n = arr.numElements()
      while (i < n) { sum += bc.value.valueOf(arr.getUTF8String(i)); i += 1 }
      sum
    }
    override protected def withNewChildInternal(c: Expression): TermWeightSum = copy(child = c)
  }

  /** prefix_tokens(tokens): the AllPairs prefix — tokens ordered by
    * (value asc, token asc) (value = global df: rarest first), first
    * `n - ceil(n·t) + 1` of them. One pass per row against the broadcast
    * stats; replaces the explode→df-join→row_number window. */
  case class PrefixTokens(child: Expression, threshold: Double, bc: Broadcast[TermStatsData])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "prefix_tokens"
    override def nullSafeEval(toks: Any): Any = {
      val arr = toks.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return new GenericArrayData(Array.empty[Any])
      val keep = n - math.ceil(n * threshold).toInt + 1
      val withDf = new Array[(Long, UTF8String)](n)
      var i = 0
      while (i < n) {
        val t = arr.getUTF8String(i)
        withDf(i) = (bc.value.valueOf(t), t)
        i += 1
      }
      java.util.Arrays.sort(withDf, new java.util.Comparator[(Long, UTF8String)] {
        override def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
          val c = java.lang.Long.compare(a._1, b._1)
          if (c != 0) c else a._2.compareTo(b._2)
        }
      })
      val out = new Array[Any](math.min(keep, n))
      i = 0
      while (i < out.length) { out(i) = withDf(i)._2; i += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): PrefixTokens = copy(child = c)
  }

  /** rarest_index(tokens): position (0-based) of the token with the lowest
    * (value, position) — value = global df. The fuzzy-join blocking position:
    * joining on the RAREST token's deletion neighborhood minimizes candidate
    * fan-out, and any fixed position is loss-free for the ≤1-edit phrase
    * semantics (the edited token still shares a deletion key; every other
    * position shares the identity key). */
  case class RarestIndex(child: Expression, bc: Broadcast[TermStatsData])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "rarest_index"
    override def nullSafeEval(toks: Any): Any = {
      val arr = toks.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var best = 0
      var bestV = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = bc.value.valueOf(arr.getUTF8String(i))
        if (v < bestV) { bestV = v; best = i }
        i += 1
      }
      best
    }
    override protected def withNewChildInternal(c: Expression): RarestIndex = copy(child = c)
  }

  def termWeightSum(toks: Column, bc: Broadcast[TermStatsData]): Column =
    ColumnBridge.column(TermWeightSum(ColumnBridge.expression(toks), bc))
  def prefixTokens(toks: Column, threshold: Double, bc: Broadcast[TermStatsData]): Column =
    ColumnBridge.column(PrefixTokens(ColumnBridge.expression(toks), threshold, bc))
  def rarestIndex(toks: Column, bc: Broadcast[TermStatsData]): Column =
    ColumnBridge.column(RarestIndex(ColumnBridge.expression(toks), bc))
}
