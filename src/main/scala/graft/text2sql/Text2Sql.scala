package graft.text2sql

import graft.ingest.{IngestResult, Json, Text2SqlSubst}
import graft.llm.{LlmCallback, Prompts}

/** Natural-language question → Spark SQL, mirroring the reference's
  * prompt assembly (reference pandasqlite/pandasqlite.py:183-250).
  *
  * Assembly is byte-compatible with the reference modulo the three
  * documented dialect deltas (SURVEY.md §3.2): DDL text comes from the
  * StructType, identifiers are backtick-quoted, and the instruction
  * says "compliant to Spark SQL". One deliberate behavior fix: the
  * reference's for/else at :211-215 appends "No documentation
  * provided." even when documentation exists; here the default appears
  * only when no ingestion carries context.
  */
object Text2Sql {

  def buildPrompt(question: String, ingestions: Seq[IngestResult]): String = {
    val sb = new StringBuilder
    sb ++= "<|begin_of_text|><|start_header_id|>user<|end_header_id|>" += '\n'

    sb ++= "[SCHEMA]" += '\n'
    ingestions.foreach(i => sb ++= i.ddl += '\n')
    sb ++= "[/SCHEMA]" ++= "\n\n"

    sb ++= "[VALUE_FORMAT]" += '\n'
    ingestions.foreach(i => sb ++= Json.write(i.valueFormat) += '\n')
    sb ++= "[/VALUE_FORMAT]" ++= "\n\n"

    sb ++= "[ENUMS]" += '\n'
    sb ++= "Descriptions of values of enum columns in the schema." ++= "\n\n"
    ingestions.foreach { i =>
      i.enumDescriptions.foreach { case (col, values) =>
        values.foreach { case (v, desc) => sb ++= s"$col.$v: $desc" += '\n' }
        sb += '\n'
      }
    }
    sb ++= "[/ENUMS]" ++= "\n\n"

    sb ++= "[DOCUMENTATION]" += '\n'
    val contexts = ingestions.flatMap(_.context)
    if (contexts.nonEmpty) contexts.foreach(c => sb ++= c += '\n')
    else sb ++= "No documentation provided.\n"
    sb ++= "[/DOCUMENTATION]" ++= "\n\n"

    sb ++= "[INSTRUCTION]" += '\n'
    sb ++= Prompts.instruction += '\n'
    sb ++= "[/INSTRUCTION]" ++= "\n\n"

    // few-shot curriculum as llama-3 chat turns (reference :229-239)
    ingestions.foreach { i =>
      i.sqlCurriculum.foreach { case (q, sql) =>
        sb ++= "[QUESTION]" += '\n'
        sb ++= q += '\n'
        sb ++= "[/QUESTION]" += '\n'
        sb ++= "<|eot_id|><|start_header_id|>assistant<|end_header_id|>" += '\n'
        sb ++= "```sql" += '\n'
        sb ++= sql += '\n'
        sb ++= "```" += '\n'
        sb ++= "<|eot_id|><|start_header_id|>user<|end_header_id|>" += '\n'
      }
    }

    sb ++= "[QUESTION]" += '\n'
    sb ++= question += '\n'
    sb ++= "[/QUESTION]" += '\n'
    sb ++= "<|eot_id|><|start_header_id|>assistant<|end_header_id|>" += '\n'
    sb.result()
  }

  /** Extract the fenced SQL body (reference :246). */
  def extractSql(raw: String): String = {
    val afterFence = raw.split("```sql", 2)
    if (afterFence.length < 2) raw.trim
    else afterFence(1).split("\n```", 2)(0).trim
  }

  /** question → SQL string. The generic identifier `table` is bound to
    * the single ingestion's hash; with multiple tables the schema block
    * already names each hash, so no substitution applies (the reference
    * always substitutes the LAST ingestion's hash — loop-variable leak
    * at :247 — which mis-binds multi-table SQL; fixed here).
    */
  def text2sql(question: String, ingestions: Seq[IngestResult],
               llm: LlmCallback,
               caseSensitiveLike: Boolean = false): String = {
    val raw = llm(buildPrompt(question, ingestions))
    // double-quoted tokens resolve as identifiers iff they name an
    // ingested column or table hash (SQLite's own resolution rule —
    // Spark would otherwise read them as string LITERALS, silently)
    val identifiers: Set[String] = ingestions
      .flatMap(i => i.columnTypes.keys ++ Seq(i.hash) ++ Seq("table")).toSet
    val sql = SqlDialect.resolveDoubleQuoted(
      SqlDialect.translate(extractSql(LlmCallback.truncateAtStop(raw)),
        caseSensitiveLike),
      identifiers)
    if (ingestions.size == 1) Text2SqlSubst.bindTable(sql, ingestions.head.hash)
    else sql
  }
}
