package graft.text2sql

import graft.ingest.IngestResult
import graft.llm.LlmCallback
import org.scalatest.funsuite.AnyFunSuite

class Text2SqlSpec extends AnyFunSuite {

  private def ing(hash: String, context: Option[String] = None) = IngestResult(
    context = context,
    columnTypes = Map("a" -> "NUMBER"),
    valueFormat = scala.collection.mutable.LinkedHashMap("a" -> Seq(1L, 2L)),
    columnDescriptions = Map("a" -> "The a column."),
    enumDescriptions = Map("sex" -> Map("m" -> "male", "f" -> "female")),
    sqlCurriculum = Seq(("How many?", s"SELECT COUNT(*) FROM `$hash`")),
    hash = hash,
    ddl = s"\nCREATE TABLE `$hash` (\n\t`a` BIGINT\n)\n\n")

  test("extractSql handles fenced, unfenced, and trailing-text responses") {
    assert(Text2Sql.extractSql("```sql\nSELECT 1\n```") == "SELECT 1")
    assert(Text2Sql.extractSql("```sql\nSELECT 1\n```\nextra") == "SELECT 1")
    assert(Text2Sql.extractSql("SELECT 2") == "SELECT 2")
  }

  test("single ingestion binds `table`; multiple ingestions leave SQL as-is") {
    val llm = LlmCallback(_ => "```sql\nSELECT * FROM table\n```")
    assert(Text2Sql.text2sql("q", Seq(ing("aaa")), llm) == "SELECT * FROM `aaa`")
    val multi = Text2Sql.text2sql("q", Seq(ing("aaa"), ing("bbb")), llm)
    assert(multi == "SELECT * FROM table") // schema block names each hash
  }

  test("prompt contains every section, few-shot turns, and enum lines") {
    val p = Text2Sql.buildPrompt("What?", Seq(ing("aaa")))
    assert(p.startsWith("<|begin_of_text|><|start_header_id|>user<|end_header_id|>"))
    assert(p.contains("[SCHEMA]") && p.contains("[/SCHEMA]"))
    assert(p.contains("sex.m: male"))
    assert(p.contains("[QUESTION]\nHow many?\n[/QUESTION]"))
    assert(p.contains("```sql\nSELECT COUNT(*) FROM `aaa`\n```"))
    assert(p.endsWith("<|eot_id|><|start_header_id|>assistant<|end_header_id|>\n"))
    assert(p.contains("No documentation provided.\n"))
  }

  test("documentation default appears only when no context exists") {
    val withCtx = Text2Sql.buildPrompt("q", Seq(ing("aaa", Some("Sales facts."))))
    assert(withCtx.contains("Sales facts.\n"))
    assert(!withCtx.contains("No documentation provided."))
  }

  test("stop-sequence truncation applies before extraction") {
    val llm = LlmCallback(_ => "```sql\nSELECT 7\n```\n\nSELECT trailing")
    assert(Text2Sql.text2sql("q", Seq(ing("h")), llm) == "SELECT 7")
  }
}
