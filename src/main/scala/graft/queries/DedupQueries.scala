package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFns._

/** Deduplication surface for the training-data-pipeline use case: exact
  * (hash) dedup, MinHash+LSH near-dup detection, and n-gram Jaccard.
  *
  * The MinHash pipeline is the scale path: per-doc signature computation
  * is narrow (one pass, codegen'd array exprs); candidate generation
  * shuffles only (band, bandKey) pairs — O(#docs * #bands) small rows, not
  * O(n²) — and the exact-Jaccard verify join touches only candidate pairs.
  * That is the standard LSH banding argument and it survives 100 TB: no
  * stage is quadratic in corpus size.
  *
  * Hashes are hex-string MD5s (min over fixed-width hex strings ==
  * min over the underlying 64-bit values), chosen because md5 is
  * bit-identical in Spark and DuckDB — so even the LSH internals are
  * oracle-checkable, with no engine-specific hash anywhere.
  */
object DedupQueries {

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = NumHashes / Bands

  // ---- Spark side ----------------------------------------------------

  /** doc_id + token list (cleaned). */
  private def toks(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        tokens(clean(col("text"))).as("tok"))

  /** 3-token shingles; whole text as a single shingle when too short. */
  private val shingleCol: Column =
    when(size(col("tok")) >= 3,
      transform(sequence(lit(1), size(col("tok")) - 2), i =>
        concat_ws(" ", element_at(col("tok"), i),
          element_at(col("tok"), i + 1), element_at(col("tok"), i + 2))))
      .otherwise(array(array_join(col("tok"), " ")))

  /** minhash_i = min over shingles of md5("i:" ++ shingle) (first 16 hex
    * chars — fixed width, so string min == numeric min).
    */
  private def minhash(i: Int): Column =
    array_min(transform(col("sh"),
      x => substring(md5(concat(lit(s"$i:"), x)), 1, 16))).as(s"h$i")

  private def bandKey(b: Int): Column =
    md5(concat_ws("|",
      (0 until RowsPerBand).map(r => col(s"h${b * RowsPerBand + r}")): _*))

  private def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = toks(s, dir).withColumn("sh", shingleCol)
      .select(col("doc_id") +: col("sh") +:
        (0 until NumHashes).map(minhash): _*)
    val bands = (0 until Bands).map { b =>
      sh.select(col("doc_id"), lit(b).as("band"), bandKey(b).as("bk"))
    }.reduce(_.unionAll(_))
    val a = bands.as("a")
    val b = bands.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val sets = sh.select(col("doc_id"), array_distinct(col("sh")).as("st"))
    val withA = cand.join(sets.select(col("doc_id").as("a_id"),
      col("st").as("sa")), "a_id")
    val withB = withA.join(sets.select(col("doc_id").as("b_id"),
      col("st").as("sb")), "b_id")
    withB
      .withColumn("inter",
        size(filter(col("sa"), x => array_contains(col("sb"), x))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  // ---- DuckDB twin ---------------------------------------------------

  private def minhashSql: String = {
    val hashes = (0 until NumHashes).map(i =>
      s"list_aggregate(list_transform(sh, x -> substr(md5('$i:' || x), 1, 16)), 'min') AS h$i")
      .mkString(",\n    ")
    val bandSelects = (0 until Bands).map { b =>
      val parts = (0 until RowsPerBand)
        .map(r => s"h${b * RowsPerBand + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS bk FROM mh"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH cleaned AS (
       |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
       |), toksrc AS (
       |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
       |), shingled AS (
       |  SELECT doc_id,
       |    CASE WHEN len(tok) >= 3
       |      THEN list_transform(range(1, len(tok) - 1),
       |             i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])
       |      ELSE [array_to_string(tok, ' ')] END AS sh
       |  FROM toksrc
       |), mh AS (
       |  SELECT doc_id, sh,
       |    $hashes
       |  FROM shingled
       |), bands AS (
       |  $bandSelects
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
       |), sets AS (
       |  SELECT doc_id, list_distinct(sh) AS st FROM shingled
       |), j AS (
       |  SELECT c.a_id, c.b_id,
       |    len(list_filter(sa.st, x -> list_contains(sb.st, x))) AS inter,
       |    len(sa.st) AS la, len(sb.st) AS lb
       |  FROM cand c
       |  JOIN sets sa ON sa.doc_id = c.a_id
       |  JOIN sets sb ON sb.doc_id = c.b_id
       |)
       |SELECT a_id, b_id,
       |  round(CAST(inter AS DOUBLE) / (la + lb - inter), 6) AS jaccard
       |FROM j
       |WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.5
       |ORDER BY a_id, b_id""".stripMargin
  }

  // ---- SimHash -------------------------------------------------------

  /** 24-bit SimHash over the token multiset. Token hash = first 6 hex
    * chars of md5, decoded with locate/strpos arithmetic so BOTH engines
    * compute identical integers (no engine-native hash). Per-bit sums of
    * ±1 contributions reduce in one hash agg; sign => fingerprint bit.
    */
  private val SimBits = 24

  private def simhashes(s: SparkSession, dir: String): DataFrame = {
    val tv = toks(s, dir)
      .select(col("doc_id"), explode(col("tok")).as("t"))
      .withColumn("m", md5(col("t")))
      .withColumn("v", expr((1 to 6).map(k =>
        s"(locate(substring(m, $k, 1), '0123456789abcdef') - 1) * ${1 << (4 * (6 - k))}"
      ).mkString("(", " + ", ")")))
    val bitSums = (0 until SimBits).map(b =>
      sum(shiftright(col("v"), b).bitwiseAND(lit(1)) * 2 - 1).as(s"s$b"))
    tv.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash",
        (0 until SimBits).map(b =>
          when(col(s"s$b") >= 0, lit(1 << b)).otherwise(lit(0)))
          .reduce(_ + _))
      .select("doc_id", "simhash")
  }

  private val simhashCte: String = {
    val hexVal = (1 to 6).map(k =>
      s"(strpos('0123456789abcdef', substr(m, $k, 1)) - 1) * ${1 << (4 * (6 - k))}"
    ).mkString("(", " + ", ")")
    val bitSums = (0 until SimBits).map(b =>
      s"sum(((v >> $b) & 1) * 2 - 1) AS s$b").mkString(",\n    ")
    val fp = (0 until SimBits).map(b =>
      s"(CASE WHEN s$b >= 0 THEN ${1 << b} ELSE 0 END)").mkString(" + ")
    s"""WITH cleaned AS (
       |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
       |), toksrc AS (
       |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
       |), tv AS (
       |  SELECT doc_id, md5(t.t) AS m
       |  FROM toksrc, unnest(tok) AS t(t)
       |), hv AS (
       |  SELECT doc_id, $hexVal AS v FROM tv
       |), bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hv GROUP BY doc_id
       |), fp AS (
       |  SELECT doc_id, $fp AS simhash FROM bits
       |)""".stripMargin
  }

  // ---- queries -------------------------------------------------------

  val qs: Seq[Q] = Seq(
    // Exact dedup stats: corpus size vs distinct normalized content
    Q(
      "dedup_exact_stats",
      (s, d) =>
        toks(s, d)
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(md5(array_join(col("tok"), " "))).as("n_unique")),
      Some(
        s"""WITH cleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |), toksrc AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
           |)
           |SELECT count(*) AS n_docs,
           |  count(DISTINCT md5(array_to_string(tok, ' '))) AS n_unique
           |FROM toksrc""".stripMargin)),

    // MinHash + LSH banding near-dup pairs, exact-Jaccard verified
    Q("dedup_minhash_pairs", (s, d) => minhashPairs(s, d), Some(minhashSql)),

    // SimHash fingerprints (portable bit arithmetic, oracle-checked)
    Q(
      "dedup_simhash",
      (s, d) => simhashes(s, d).orderBy("doc_id"),
      Some(s"$simhashCte SELECT doc_id, simhash FROM fp ORDER BY doc_id")),

    // SimHash near-pairs: hamming distance <= 3 over the fingerprints
    Q(
      "dedup_simhash_pairs",
      (s, d) => {
        val f = simhashes(s, d)
        val a = f.select(col("doc_id").as("a_id"), col("simhash").as("fa"))
        val b = f.select(col("doc_id").as("b_id"), col("simhash").as("fb"))
        a.join(b, col("a_id") < col("b_id"))
          .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
          .filter(col("hamming") <= 2)
          .select("a_id", "b_id", "hamming")
          .orderBy("a_id", "b_id")
      },
      Some(
        s"""$simhashCte
           |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |  bit_count(xor(a.simhash, b.simhash)) AS hamming
           |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
           |ORDER BY a_id, b_id""".stripMargin)),

    // n-gram (token bigram) Jaccard over a bounded candidate block —
    // the exact quadratic baseline the LSH path approximates
    Q(
      "dedup_ngram_jaccard",
      (s, d) => {
        val grams = toks(s, d)
          .filter(col("doc_id") < 150)
          .select(col("doc_id"),
            array_distinct(when(size(col("tok")) >= 2,
              transform(sequence(lit(1), size(col("tok")) - 1), i =>
                concat_ws(" ", element_at(col("tok"), i),
                  element_at(col("tok"), i + 1))))
              .otherwise(col("tok"))).as("g"))
        val a = grams.select(col("doc_id").as("a_id"), col("g").as("ga"))
        val b = grams.select(col("doc_id").as("b_id"), col("g").as("gb"))
        a.join(b, col("a_id") < col("b_id"))
          .withColumn("inter",
            size(filter(col("ga"), x => array_contains(col("gb"), x))))
          .withColumn("jaccard",
            col("inter").cast("double") /
              (size(col("ga")) + size(col("gb")) - col("inter")))
          .filter(col("jaccard") >= 0.4)
          .select(col("a_id"), col("b_id"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("a_id", "b_id")
      },
      Some(
        s"""WITH cleaned AS (
           |  SELECT doc_id, ${cleanSql("text")} AS text_clean FROM documents
           |  WHERE doc_id < 150
           |), toksrc AS (
           |  SELECT doc_id, ${tokensSql("text_clean")} AS tok FROM cleaned
           |), grams AS (
           |  SELECT doc_id,
           |    list_distinct(CASE WHEN len(tok) >= 2
           |      THEN list_transform(range(1, len(tok)),
           |             i -> tok[i] || ' ' || tok[i+1])
           |      ELSE tok END) AS g
           |  FROM toksrc
           |), j AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |    len(list_filter(a.g, x -> list_contains(b.g, x))) AS inter,
           |    len(a.g) AS la, len(b.g) AS lb
           |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
           |)
           |SELECT a_id, b_id,
           |  round(CAST(inter AS DOUBLE) / (la + lb - inter), 6) AS jaccard
           |FROM j
           |WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.4
           |ORDER BY a_id, b_id""".stripMargin))
  )
}
