package graft.core

import scala.collection.mutable

/** Token-level Aho–Corasick automaton over phrase token sequences (Aho &
  * Corasick '75 — public construction): one pass over a document's token
  * stream finds every gazetteer phrase occurring as a contiguous token
  * subsequence, independent of the longest name's token count. This is the
  * B8 matcher for gazetteers with long names, where window generation
  * (one window set per length 1..maxLen) multiplies the mention-stage rows
  * by maxLen; the automaton stays O(tokens + matches).
  *
  * Built driver-side from the phrase dictionary (dimension-sized, like
  * [[graft.index.PhraseDict]]) and shipped as a broadcast.
  */
final class AhoCorasickData private[core] (
    val next: Array[mutable.HashMap[String, Int]],
    val fail: Array[Int],
    val out: Array[List[String]]) extends Serializable {

  /** [[matchTokens]] plus the 1-BASED TOKEN INDEX where each phrase's FIRST
    * occurrence STARTS (= matched end index − phrase token count + 2): the
    * same (phrase, pos) pairs the positional window generator emits, feeding
    * the stack-relevance gap/order penalties. */
  def matchTokensPos(tokens: Array[String]): Array[(String, Int)] = {
    val seen = new java.util.LinkedHashMap[String, Integer]()
    var state = 0
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      var s = state
      while (s != 0 && !next(s).contains(t)) s = fail(s)
      state = next(s).getOrElse(t, 0)
      var o = state
      while (o != 0) {
        out(o).foreach { p =>
          // phrase token count from its space count (phrases are space-joined)
          var spaces = 0; var k = 0
          while (k < p.length) { if (p.charAt(k) == ' ') spaces += 1; k += 1 }
          seen.putIfAbsent(p, i - spaces + 1) // 1-based start of this match
        }
        o = fail(o)
      }
      i += 1
    }
    val res = new Array[(String, Int)](seen.size)
    val it = seen.entrySet().iterator()
    var j = 0
    while (it.hasNext) { val e = it.next(); res(j) = (e.getKey, e.getValue.intValue()); j += 1 }
    res
  }

  /** All distinct phrases matched in the token stream, in first-match order. */
  def matchTokens(tokens: Array[String]): Array[String] = {
    val seen = new java.util.LinkedHashSet[String]()
    var state = 0
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      var s = state
      while (s != 0 && !next(s).contains(t)) s = fail(s)
      state = next(s).getOrElse(t, 0)
      var o = state
      while (o != 0) {
        out(o).foreach(seen.add)
        o = fail(o)
      }
      i += 1
    }
    val it = seen.iterator()
    val res = new Array[String](seen.size)
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    res
  }
}

object AhoCorasick {

  /** Build the automaton from phrase strings (tokens = space-split). */
  def build(phrases: Seq[String]): AhoCorasickData = {
    val next = mutable.ArrayBuffer(mutable.HashMap.empty[String, Int])
    val outs = mutable.ArrayBuffer(List.empty[String])
    // trie
    phrases.distinct.foreach { p =>
      val toks = p.split(' ')
      var s = 0
      toks.foreach { t =>
        s = next(s).getOrElseUpdate(t, {
          next += mutable.HashMap.empty[String, Int]
          outs += Nil
          next.length - 1
        })
      }
      outs(s) = p :: outs(s)
    }
    // fail links (BFS)
    val fail = new Array[Int](next.length)
    val queue = mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      next(r).foreach { case (tok, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !next(f).contains(tok)) f = fail(f)
        fail(s) = next(f).getOrElse(tok, 0)
        if (fail(s) == s) fail(s) = 0
      }
    }
    new AhoCorasickData(next.toArray, fail, outs.toArray)
  }
}
