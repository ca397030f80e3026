package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(text, n, distinct)` — word n-gram shingles as one native
  * codegen'd expression: tokenize on single spaces (empty tokens
  * dropped), emit each run of `n` consecutive tokens re-joined by single
  * spaces; fewer than `n` tokens ⇒ empty array. With `distinct`,
  * first-occurrence order (matching `array_distinct` / DuckDB
  * `list_distinct`).
  *
  * Exactly the engine-portable semantics of the higher-order-function
  * formulation `array_distinct(transform(sequence(1, size(tk) - n + 1),
  * i -> concat_ws(' ', slice(tk, i, n))))` over
  * `filter(split(text, ' '), t -> t != '')` — but those HOFs run
  * interpreted (no codegen), allocating per token and per gram; one
  * tight loop here is ~20× per row, which dominates scan-heavy shingle
  * pipelines (q52/q56/q58).
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n > 0, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(t: Any): Any =
    WordNGrams.compute(t.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNGrams.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val s = text.toString
    // single-space tokenization, empties dropped (split boundaries only —
    // no regex); token [start, end) offsets into s
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    val len = s.length
    while (i < len) {
      if (s.charAt(i) != ' ') {
        val st = i
        while (i < len && s.charAt(i) != ' ') i += 1
        starts.add(st); ends.add(i)
      } else i += 1
    }
    val nTok = starts.size()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](nTok - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var g = 0
    while (g <= nTok - n) {
      // gram = tokens g..g+n-1 joined by ' ' — rebuilt without the
      // original inter-token runs of spaces
      val sb = new java.lang.StringBuilder(ends.get(g + n - 1) - starts.get(g))
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(s, starts.get(g + k), ends.get(g + k))
        k += 1
      }
      val gram = UTF8String.fromString(sb.toString)
      if (seen == null || seen.add(gram)) out.add(gram)
      g += 1
    }
    new GenericArrayData(out.toArray)
  }
}
