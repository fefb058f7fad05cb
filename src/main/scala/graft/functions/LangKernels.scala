package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Language-ID marker lists (public stopword heads), the single source
  * of truth for the kernel below AND the oracle SQL in TextQueries.
  * Order matters: the kernel's output array is positional per this seq.
  */
object LangMarkers {
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "fr" -> Seq("le", "la", "les", "et", "un", "dans"),
    "es" -> Seq("el", "los", "las", "y", "una", "en"),
    "de" -> Seq("der", "die", "das", "und", "ein", "nicht"))
}

/** `graft_lang_counts(array<string>) -> array<int>`: per-language
  * stopword-marker counts in ONE pass over the token array. Replaces
  * the langs x markers = 24 separate interpreted `filter(tok, isin)`
  * passes (higher-order functions don't whole-stage-codegen; measured
  * 5.8 s at sf0.1 for what is one narrow map). Element k = number of
  * tokens contained in language k's marker list (LangMarkers order),
  * exactly len(list_filter(tok, x -> x IN markers_k)) — a token in
  * several lists counts for each (no such token today, but the kernel
  * must not silently assume it).
  */
case class LangMarkerCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    LangMarkerCounts.counts(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LangMarkerCounts.counts($a);")

  override protected def withNewChildInternal(
      newChild: Expression): LangMarkerCounts = copy(child = newChild)

  override def prettyName: String = "graft_lang_counts"
}

object LangMarkerCounts {
  val NumLangs: Int = LangMarkers.markers.size

  /** token -> indexes of the languages whose marker list contains it */
  private val table: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    LangMarkers.markers.zipWithIndex.foreach { case ((_, words), li) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(li) else prev :+ li)
      }
    }
    m
  }

  def counts(arr: ArrayData): ArrayData = {
    val c = new Array[Int](NumLangs)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val hit = table.get(arr.getUTF8String(i))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { c(hit(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(c)
  }

  def column(c: Column): Column =
    GraftSqlBridge.column(LangMarkerCounts(GraftSqlBridge.expression(c)))
}
