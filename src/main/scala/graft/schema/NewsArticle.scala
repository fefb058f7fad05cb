package graft.schema

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The news-article record, mirroring the reference's declared streaming
  * schema (reference streaming_pipeline.py:33–43: nine nullable strings).
  * Timestamps ride as ISO-8601 strings end-to-end, exactly like the
  * reference; parsing happens at the query edge (`to_timestamp`, null on
  * failure = pandas errors="coerce", streamlit_app.py:136,141).
  */
final case class NewsArticle(
    id: Option[String],
    title: Option[String],
    description: Option[String],
    content: Option[String],
    url: Option[String],
    image: Option[String],
    publishedAt: Option[String],
    lang: Option[String],
    fetched_at: Option[String])

object NewsArticle {
  /** Explicit source schema — supplied to both read and readStream so no
    * inference/sampling pass runs (SURVEY.md §4 "schema inference
    * avoidance").
    */
  val schema: StructType = StructType(
    Seq("id", "title", "description", "content", "url", "image",
      "publishedAt", "lang", "fetched_at")
      .map(StructField(_, StringType, nullable = true)))
}
