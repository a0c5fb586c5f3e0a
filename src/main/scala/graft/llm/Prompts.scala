package graft.llm

/** The reference's prompt texts, byte-for-byte (they ARE the engine's
  * behavioral contract — SURVEY.md §2A A9-A12). Citations per prompt.
  */
object Prompts {

  /** Column logical-type estimation: TEXT / NUMBER / ENUM only
    * (reference pandasqlite/pandasqlite.py:129-132).
    */
  val columnTypes: String =
    "You are a data scientists who has to estimate the data type of input tables. You respond with JSON format. You will now see a dictionary where the keys are the column names, and a few example values in an array as the value. Return a dictionary where the keys are again the column names, but put the datatype in the value. You can only select from the following data types in your response: TEXT, NUMBER or ENUM.\n\n" +
      "INPUT:{\"sex\":[\"m\",\"m\",\"f\"]}\n" +
      "OUTPUT:{\"sex\":\"ENUM\"}\n\n" +
      "INPUT:"

  /** Column descriptions; "Data must not be revealed."
    * (reference pandasqlite/pandasqlite.py:137-140).
    */
  val columnDescriptions: String =
    "You are a data scientists who has to generate descriptions for columns of input tables. You respond with JSON format. Data must not be revealed. You will now see a dictionary where the keys are the column names, and a few example values in an array as the value. Return a dictionary where the keys are again the column names, but put the generated descriptions in the value.\n\n" +
      "INPUT:{\"cst_num\":[\"14\",\"12\",\"28\"],\"sex\":[\"male\",\"female\",\"male\"]}\n" +
      "OUTPUT:{\"cst_num\":\"The number of customers.\",\"sex\":\"The gender of the customers.\"}\n\n" +
      "INPUT:"

  /** Enum value descriptions (reference pandasqlite/pandasqlite.py:145-148). */
  val enumDescriptions: String =
    "You are a data scientists who has to generate descriptions for column class/enum values of input tables. You respond with JSON format. You will now see a dictionary where the keys are the column names, and the class/enum values in an array as the value. Return a dictionary where the keys are again the column names, but add another dictionary for the generated class/enum descriptions as the value.\n\n" +
      "INPUT:{\"gender\":[\"male\",\"female\"]}\n" +
      "OUTPUT:{\"gender\":{\"male\":\"The person is of male gender.\",\"female\":\"The person is of female gender.\"}}\n\n" +
      "INPUT:"

  /** SQL few-shot curriculum, difficulty 1→5, up to 7 examples
    * (reference pandasqlite/pandasqlite.py:159-162).
    */
  val sqlCurriculum: String =
    "You are a data scientists who has to generate natural language questions and their corresponding SQLLite solutions based on a description in JSON for an input table. You respond with JSON format, an array with comma-separated objects. You will now see a dictionary where the keys are the column names, and a few example values in an array as the value. Return up to 7 examples for natural language questions and their corresponding SQLLite solution. Make sure to increase the complexity of the questions beginning from very simple (1) to very hard (5). Infer the types from the data as provided, so do not turn string values into numbers or booleans, or vice versa. For aggregation functions wrap the columns in parentheses, e.g. MIN(column_name), etc.\n\n" +
      "INPUT:{\"sex\":[\"male\",\"female\"],\"survived\":[\"0\",\"1\"]}\n" +
      "OUTPUT:[{\"question\":\"Give me the different genders of the passengers.\",\"sql\":\"SELECT DISTINCT sex FROM table WHERE survived=\\\"1\\\" ORDER BY sex ASC\"}]\n\n" +
      "INPUT:"

  /** text2sql instruction block (reference pandasqlite/pandasqlite.py:220-225).
    * Single dialect delta (SURVEY.md §3.2): "compliant to Spark SQL"
    * replaces "compliant to SQLite" — this engine executes Spark SQL.
    */
  val instruction: String =
    "Given the above schema of the database at [SCHEMA], the example of the values format of the " +
      "columns at [VALUE_FORMAT], the definitions of the enums at [ENUMS], the documentation at " +
      "[DOCUMENTATION], and the below question [QUESTION] translate the question into a valid SQL " +
      "statement compliant to Spark SQL. Format the output using the Markdown language for the SQL code. " +
      "Generate only the SQL code without any further text, i.e. COMMENTS are STRICTLY FORBIDDEN. " +
      "When computing a correlation, avoid using CORR or AVG."
}
