package graft.llm

import graft.ingest.Json

/** Deterministic offline LLM stand-in (zero-egress environment).
  *
  * Recognizes each prompt family by its prefix and produces canned but
  * structurally correct responses, so the full ingest → text2sql →
  * execute pipeline runs end-to-end and assertably in tests. The
  * text2sql response comes from a caller-supplied question → SQL map
  * (the test's "model knowledge").
  */
class StubLlm(answers: Map[String, String] = Map.empty) extends LlmCallback {

  private def inputJson(prompt: String): String =
    prompt.substring(prompt.lastIndexOf("INPUT:") + "INPUT:".length)
      .stripSuffix("\nOUTPUT:")

  override def apply(prompt: String): String = {
    if (prompt.contains("write 'YES' as the next token")) "YES"
    else if (prompt.startsWith(Prompts.columnTypes.take(80))) {
      val snap = Json.parseObject(inputJson(prompt))
      val types = snap.map { case (colName, vs) =>
        val values = vs.asInstanceOf[Seq[Any]]
        val t =
          if (values.forall(v => v == null || v.isInstanceOf[Number])) "NUMBER"
          else if (values.filter(_ != null).distinct.size <= 2) "ENUM"
          else "TEXT"
        colName -> t
      }
      Json.write(types)
    }
    else if (prompt.startsWith(Prompts.columnDescriptions.take(80))) {
      val snap = Json.parseObject(inputJson(prompt))
      Json.write(snap.map { case (c, _) => c -> s"The $c column." })
    }
    else if (prompt.startsWith(Prompts.enumDescriptions.take(80))) {
      val enums = Json.parseObject(inputJson(prompt))
      Json.write(enums.map { case (c, vs) =>
        c -> vs.asInstanceOf[Seq[Any]]
          .map(v => v.toString -> s"Value ${v.toString} of $c.").toMap
      })
    }
    else if (prompt.startsWith(Prompts.sqlCurriculum.take(80))) {
      val snap = Json.parseObject(inputJson(prompt))
      val firstCol = snap.keys.head
      Json.write(Seq(
        Map("question" -> "How many rows are there?",
          "sql" -> "SELECT COUNT(*) AS n FROM table"),
        Map("question" -> s"Show the distinct values of $firstCol.",
          "sql" -> s"SELECT DISTINCT `$firstCol` FROM table ORDER BY `$firstCol` ASC")))
    }
    else if (prompt.startsWith("<|begin_of_text|>")) {
      val q = prompt.split("\\[QUESTION\\]\n").last.split("\n\\[/QUESTION\\]")(0)
      val sql = answers.getOrElse(q, "SELECT COUNT(*) AS n FROM table")
      s"```sql\n$sql\n```"
    }
    else "{}"
  }
}
