package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** B5/A3: the phrase dictionary as a broadcast sorted array with
  * binary-search prefix ranges — carmen's dictcache/fuzzy-phrase-set
  * autocomplete lookup (prefix entries are contiguous in a lexicographically
  * sorted array, so "degen" phrases need not be materialized). */
final class PhraseDictData(val sorted: Array[String]) extends Serializable {

  private def lowerBound(key: String): Int = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid).compareTo(key) < 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** All dictionary phrases starting with `prefix` (contiguous range scan). */
  def prefixMatches(prefix: String): Array[String] = {
    var i = lowerBound(prefix)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (i < sorted.length && sorted(i).startsWith(prefix)) {
      out += sorted(i); i += 1
    }
    out.toArray
  }

  def containsExact(p: String): Boolean = {
    val i = lowerBound(p)
    i < sorted.length && sorted(i) == p
  }
}

object PhraseDict {

  def build(phrases: Seq[String]): PhraseDictData =
    new PhraseDictData(phrases.distinct.sorted.toArray)

  /** prefix_matches(prefix): dictionary phrases with that prefix, via
    * binary search against the broadcast sorted array. */
  case class PrefixLookup(child: Expression, bc: Broadcast[PhraseDictData])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "prefix_matches"
    override def nullSafeEval(p: Any): Any =
      new GenericArrayData(
        bc.value.prefixMatches(p.toString).map(UTF8String.fromString): Array[Any])
    override protected def withNewChildInternal(c: Expression): PrefixLookup = copy(child = c)
  }

  def prefixMatchesCol(prefix: Column, bc: Broadcast[PhraseDictData]): Column =
    ColumnBridge.column(PrefixLookup(ColumnBridge.expression(prefix), bc))
}
