package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `lang_id(text)` — marker-stopword language identification as one
  * native expression: lowercase, whitespace-tokenize, count marker hits
  * per language (with multiplicity), emit the argmax; ties go to the
  * lexicographically LAST language; zero hits ⇒ "unknown".
  *
  * Exactly the semantics of [[graft.operators.TextAnalysis.languageId]]'s
  * column formulation and its DuckDB oracle, but one fused JVM pass
  * instead of four interpreted `filter` HOFs over the token array
  * (4.3 s → ~0.3 s over 5k docs at sf0.1).
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      LangId.compute(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.LangId.compute($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {

  /** Languages in lexicographic order; ties resolve to the LAST hit.
    * SINGLE source of truth for the marker tables — the column
    * formulation ([[graft.operators.TextAnalysis.languageId]]) and the
    * q18 DuckDB oracle are both derived from this value.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "que"))

  private val markerMap: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    markers.zipWithIndex.foreach { case ((_, words), li) =>
      words.foreach { w =>
        val cur = m.get(w)
        m.put(w, if (cur == null) Array(li) else cur :+ li)
      }
    }
    m
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: String): String = {
    val counts = new Array[Int](markers.length)
    val t = text
    val len = t.length
    var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i <= len) {
      val atEnd = i == len
      val c = if (atEnd) ' ' else t.charAt(i)
      if (Character.isWhitespace(c) || atEnd) {
        if (sb.length > 0) {
          val langs = markerMap.get(sb.toString)
          if (langs != null) { var k = 0; while (k < langs.length) { counts(langs(k)) += 1; k += 1 } }
          sb.setLength(0)
        }
      } else {
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    var best = -1
    var bestScore = 0
    var li = 0
    while (li < counts.length) {
      if (counts(li) >= bestScore && counts(li) > 0) { // >= ⇒ lex-last wins ties
        best = li; bestScore = counts(li)
      }
      li += 1
    }
    if (best < 0) "unknown" else markers(best)._1
  }

  /** Register `lang_id` on an existing session (tests / REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lang_id", exprs => LangId(exprs.head), "scala_udf")
}
