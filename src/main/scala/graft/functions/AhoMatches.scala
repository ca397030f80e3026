package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `aho_matches(text)` → the SORTED DISTINCT blocklist phrases occurring
  * in `text` as substrings, matched by one Aho-Corasick pass.
  *
  * Why an expression: the SQL spelling (`OR`-chain of `contains`, or a
  * join against an exploded pattern table) rescans the document once per
  * pattern — O(|text|·|patterns|). Real blocklists carry thousands of
  * phrases; the automaton walks the text ONCE regardless of pattern
  * count. The automaton is built on the driver at plan time, ships with
  * the serialized plan, and lands in generated code as one reference
  * object (the NearestCells pattern), so matching participates in
  * whole-stage codegen via a single static call.
  */
case class AhoMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  // Seq, not Array: case-class equality on an Array field is reference
  // equality, which would make two identical aho_matches expressions
  // never compare equal — silently defeating canonicalization, CSE and
  // plan-cache matching. The automaton build converts internally.

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "aho_matches requires at least one non-empty pattern")

  private val automaton: AhoAutomaton = AhoAutomaton.build(patterns.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "aho_matches"

  override protected def nullSafeEval(input: Any): Any =
    automaton.matchesOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ahoAutomaton", automaton,
      classOf[AhoAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.matchesOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AhoMatches =
    copy(child = newChild)
}

object AhoMatches {
  def toCol(text: org.apache.spark.sql.Column, patterns: Seq[String]): org.apache.spark.sql.Column =
    graft.internal.Cols.of(
      AhoMatches(graft.internal.Cols.expressionOf(text), patterns.toList))
}

/** Classic Aho-Corasick automaton over Java chars (UTF-16 code units —
  * surrogate pairs walk as two units on both build and match sides, so
  * matching is still exact for any pattern/text pair). States hold a
  * hash transition map; failure links and output sets are precomputed by
  * the standard BFS. Serializable: built once on the driver, shipped in
  * the plan.
  */
final class AhoAutomaton private (
    private val trans: Array[java.util.HashMap[Character, Integer]],
    private val fail: Array[Int],
    private val out: Array[Array[Int]], // pattern ids emitted at each state
    private val sortedPatterns: Array[UTF8String], // id → pattern, ids in sorted order
    private val nPatterns: Int) extends Serializable {

  /** Sorted distinct matched patterns; shared by interpreted and
    * generated code.
    */
  def matchesOf(text: UTF8String): ArrayData = {
    val s = text.toString
    val seen = new Array[Boolean](nPatterns)
    var found = 0
    var state = 0
    var i = 0
    val n = s.length
    while (i < n && found < nPatterns) {
      val c = s.charAt(i)
      var st = state
      var next = AhoAutomaton.step(trans, st, c)
      while (next < 0 && st != 0) { st = fail(st); next = AhoAutomaton.step(trans, st, c) }
      state = if (next >= 0) next else 0
      val emits = out(state)
      var j = 0
      while (j < emits.length) {
        val id = emits(j)
        if (!seen(id)) { seen(id) = true; found += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Any](found)
    var k = 0
    var id = 0
    while (id < nPatterns) { // ids are assigned in sorted-pattern order
      if (seen(id)) { res(k) = sortedPatterns(id); k += 1 }
      id += 1
    }
    new GenericArrayData(res)
  }
}

object AhoAutomaton {

  private def step(
      trans: Array[java.util.HashMap[Character, Integer]],
      state: Int, c: Char): Int = {
    val t = trans(state).get(c)
    if (t == null) -1 else t.intValue()
  }

  def build(patterns: Array[String]): AhoAutomaton = {
    val sorted = patterns.distinct.sorted
    val trans = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outSets = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Set.empty[Int])
    // trie
    sorted.zipWithIndex.foreach { case (p, id) =>
      var state = 0
      p.foreach { c =>
        val nxt = trans(state).get(c)
        if (nxt == null) {
          trans += new java.util.HashMap[Character, Integer]()
          outSets += scala.collection.mutable.Set.empty[Int]
          trans(state).put(c, trans.length - 1)
          state = trans.length - 1
        } else state = nxt.intValue()
      }
      outSets(state) += id
    }
    // failure links by BFS; output sets merge along them
    val transArr = trans.toArray
    val fail = new Array[Int](transArr.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    transArr(0).forEach { (_, s) => fail(s) = 0; queue += s.intValue() }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      transArr(r).forEach { (c, s) =>
        queue += s.intValue()
        var st = fail(r)
        var nxt = step(transArr, st, c)
        while (nxt < 0 && st != 0) { st = fail(st); nxt = step(transArr, st, c) }
        fail(s) = if (nxt >= 0 && nxt != s) nxt else 0
        outSets(s) ++= outSets(fail(s))
      }
    }
    new AhoAutomaton(
      transArr,
      fail,
      outSets.map(_.toArray.sorted).toArray,
      sorted.map(UTF8String.fromString),
      sorted.length)
  }
}
