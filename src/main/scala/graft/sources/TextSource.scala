package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity text source/sink.
  *
  * Source: the reference reads local text files line-by-line and feeds map
  * functions (file, contents) records (/root/reference/master.py:25-38,
  * mapper_node.py:81-82). `readLines` is the line-level scan
  * (`spark.read.text` + `input_file_name()`); `readDocuments` is the
  * (file, contents) record shape via `wholeTextFiles` (file-at-a-time is
  * genuinely imperative per-file I/O — one of the rare justified RDD uses).
  *
  * Sink: the reference writes `key\tvalue` lines into one consolidated text
  * file (/root/reference/reducer_node.py:25-26, master.py:166-173).
  */
object TextSource {

  /** (file, line) records. */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF("line")
      .select(input_file_name().as("file"), col("line"))

  /** (file, text) whole-document records — the reference map fn's input
    * contract (doc_id, contents).
    */
  def readDocuments(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path).toDF("file", "text")
  }

  /** Tab-separated text sink (`k\tv...` lines). `singleFile` coalesces to
    * one partition for byte-level parity with the reference's consolidated
    * output — never do that at scale; default keeps parallel part files.
    */
  def writeTsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    // coalesce each field: concat_ws SKIPS null arguments (it does not
    // emit an empty field), so an un-coalesced NULL column would shift
    // every later field left and silently misalign the TSV
    val line = concat_ws("\t",
      df.columns.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val out = df.select(line.as("value"))
    (if (singleFile) out.coalesce(1) else out)
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** Byte-parity framing of the reference's consolidated inverted-index
    * output: `word\t['./book3.txt', './myfile.txt']` — the Python list repr
    * its reducer emits (/root/reference/output/output_sample.txt:1,
    * mapreduce_inverted.py:11 `list(set(...))`). The reference's file ORDER
    * inside the brackets is Python set-iteration order (run-dependent);
    * this writer emits the sorted refinement so the bytes are reproducible.
    * Escaping matches Python str repr for the path charset (no quotes/
    * backslashes in file paths — true of the reference corpus).
    */
  def writePythonReprIndex(df: DataFrame, wordCol: String, filesCol: String,
                           path: String, singleFile: Boolean = false): Unit = {
    val repr = concat(lit("["),
      array_join(transform(array_sort(col(filesCol)),
        f => concat(lit("'"), f, lit("'"))), ", "),
      lit("]"))
    writeTsv(df.select(col(wordCol), repr.as("files_repr")), path, singleFile)
  }
}
