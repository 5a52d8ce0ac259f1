package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy & governance operators for a training-data pipeline: PII
  * redaction with per-type accounting, and a k-anonymity audit over
  * quasi-identifier combinations. Both are single-pass scans or one
  * aggregation — at 100 TB the redaction is embarrassingly parallel
  * (narrow map over the text column, codegen'd regexp engine, no shuffle)
  * and the k-anonymity audit is one groupBy on the quasi-identifier tuple
  * followed by an O(groups) rollup.
  *
  * Reference anchor: the reference engine only exposes arbitrary per-row
  * map functions (/root/reference/mapreduce.py:16-24); redaction/audit are
  * the governance passes its users would hand-roll there before releasing
  * a corpus.
  */
object PrivacyQueries {

  private def T(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  // The synthetic corpus is lowercase alpha+space, so deterministic
  // pseudo-PII is appended as a pure function of doc_id — the redactor is
  // then exercised on realistic full-length text with a known planted
  // ground truth (counts vary 0..2 per type and per doc). The oracle
  // replants the same strings and re-derives every count, so the gate
  // checks the regex semantics themselves (boundaries, precedence of the
  // three passes), not just plumbing.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhoneRe = "\\b555-\\d{4}\\b"

  /** text + planted PII, as a Column (Spark side). */
  private def plantPii(text: Column, docId: Column): Column = {
    val email = when(docId % 3 =!= 0,
      concat(lit(" contact user"), docId, lit("@mail.example.com"))).otherwise(lit(""))
    val email2 = when(docId % 5 === 0,
      concat(lit(" alt admin"), docId, lit("@corp.example.org"))).otherwise(lit(""))
    val ip = when(docId % 4 =!= 1,
      concat(lit(" from 10."), docId % 200, lit(".0."), docId % 250 + 1)).otherwise(lit(""))
    val phone = when(docId % 2 === 0,
      concat(lit(" call 555-0"), docId % 900 + 100)).otherwise(lit(""))
    concat(text, email, email2, ip, phone)
  }

  /** Same planting in DuckDB SQL (|| concatenation, CASE guards). */
  private val plantPiiSql: String =
    """text ||
      |  CASE WHEN doc_id % 3 <> 0
      |       THEN ' contact user' || doc_id || '@mail.example.com' ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0
      |       THEN ' alt admin' || doc_id || '@corp.example.org' ELSE '' END ||
      |  CASE WHEN doc_id % 4 <> 1
      |       THEN ' from 10.' || (doc_id % 200) || '.0.' || (doc_id % 250 + 1) ELSE '' END ||
      |  CASE WHEN doc_id % 2 = 0
      |       THEN ' call 555-0' || (doc_id % 900 + 100) ELSE '' END""".stripMargin

  /** Redact emails, IPv4s, and phone numbers from `text`, reporting per-doc
    * counts and the redacted-character delta. Pass order is fixed
    * (email → ip → phone): replacement tokens are digit-free so later
    * passes cannot match inside earlier replacements. Each type is COUNTED
    * on the text as it stands when that type's replace pass runs — n_ip
    * counts on the email-redacted text, n_phone on the email+ip-redacted
    * text — so overlapping matches (a digit-bearing email domain like
    * a@10.1.2.3.com contains an IPv4) are attributed to exactly one type
    * and the counts always reconcile with n_chars_removed; counting every
    * type on the raw text would tally such spans twice.
    */
  def piiRedact(docs: DataFrame): DataFrame = {
    val enriched = docs.select(col("doc_id"),
      plantPii(col("text"), col("doc_id")).as("t"))
    val t1 = regexp_replace(col("t"), EmailRe, "[EMAIL]")
    val t2 = regexp_replace(t1, Ipv4Re, "[IP]")
    val t3 = regexp_replace(t2, PhoneRe, "[PHONE]")
    enriched.select(
      col("doc_id"),
      regexp_count(col("t"), lit(EmailRe)).cast("bigint").as("n_email"),
      regexp_count(t1, lit(Ipv4Re)).cast("bigint").as("n_ip"),
      regexp_count(t2, lit(PhoneRe)).cast("bigint").as("n_phone"),
      (length(col("t")) - length(t3)).cast("bigint").as("n_chars_removed"))
  }

  /** k-anonymity audit: group rows by a quasi-identifier tuple
    * (market segment, nation, account-balance band) and report, per
    * segment, how many identifier groups fall below k and how many rows
    * they expose. The shape is one shuffle on the QI tuple then an
    * O(groups) rollup — the audit a corpus steward runs before release.
    */
  def kAnonymity(customer: DataFrame, k: Int): DataFrame =
    customer
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 2000).cast("bigint").as("bal_band"))
      .groupBy("c_mktsegment", "c_nationkey", "bal_band")
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).as("n_groups"),
        min(col("sz")).as("min_group_size"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("n_rows_at_risk"))
      .orderBy("segment")

  /** l-diversity audit — k-anonymity's standard companion (a group can be
    * large yet still leak if everyone in it shares the sensitive value):
    * per quasi-identifier group (segment, nation), the number of DISTINCT
    * sensitive values (balance band); rolled per segment to the achieved
    * min diversity and the groups/rows below l. Same two-aggregate shape
    * as [[kAnonymity]] — one shuffle on the QI tuple, O(groups) rollup.
    */
  def lDiversity(customer: DataFrame, l: Int): DataFrame =
    customer
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 2000).cast("bigint").as("bal_band"))
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("sz"), count_distinct(col("bal_band")).as("nsv"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).as("n_groups"),
        min(col("nsv")).as("min_diversity"),
        sum(when(col("nsv") < l, 1L).otherwise(0L)).as("n_low_groups"),
        sum(when(col("nsv") < l, col("sz")).otherwise(0L)).as("n_rows_at_risk"))
      .orderBy("segment")

  val queries: Seq[QueryDef] = Seq(

    QueryDef("tx_pii_redact",
      (s, d) => piiRedact(T(s, d, "documents")).orderBy("doc_id"),
      Some(s"""WITH enriched AS (SELECT doc_id, $plantPiiSql AS t FROM documents),
             |staged AS (SELECT doc_id, t,
             |             regexp_replace(t, '$EmailRe', '[EMAIL]', 'g') AS t1
             |           FROM enriched),
             |staged2 AS (SELECT *,
             |              regexp_replace(t1, '$Ipv4Re', '[IP]', 'g') AS t2
             |            FROM staged)
             |SELECT doc_id,
             |       CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_email,
             |       CAST(len(regexp_extract_all(t1, '$Ipv4Re')) AS BIGINT) AS n_ip,
             |       CAST(len(regexp_extract_all(t2, '$PhoneRe')) AS BIGINT) AS n_phone,
             |       CAST(length(t) - length(
             |         regexp_replace(t2, '$PhoneRe', '[PHONE]', 'g')) AS BIGINT)
             |         AS n_chars_removed
             |FROM staged2 ORDER BY doc_id""".stripMargin)),

    QueryDef("rel_kanonymity",
      (s, d) => kAnonymity(T(s, d, "customer"), k = 5),
      Some("""WITH qi AS (SELECT c_mktsegment, c_nationkey,
             |                   CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
             |                   count(*) AS sz
             |            FROM customer GROUP BY ALL)
             |SELECT c_mktsegment AS segment,
             |       count(*) AS n_groups,
             |       min(sz) AS min_group_size,
             |       CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
             |       CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk
             |FROM qi GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("rel_ldiversity",
      (s, d) => lDiversity(T(s, d, "customer"), l = 3),
      Some("""WITH qi AS (SELECT c_mktsegment, c_nationkey, count(*) AS sz,
             |                   count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) AS nsv
             |            FROM customer GROUP BY 1, 2)
             |SELECT c_mktsegment AS segment,
             |       count(*) AS n_groups,
             |       min(nsv) AS min_diversity,
             |       CAST(sum(CASE WHEN nsv < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_groups,
             |       CAST(sum(CASE WHEN nsv < 3 THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk
             |FROM qi GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
