package graft.llm

/** The engine's single extension point, exactly as in the reference:
  * a callback that maps a prompt string to the model's raw text
  * (reference pandasqlite/pandasqlite.py:57, :183 `llm_callback`).
  *
  * The reference's transport (watsonx.ai, llama-3-405b-instruct,
  * greedy, max_new_tokens=4096, stop ["\n\n"], reference :24-54) is
  * out of scope in this zero-egress environment; the decode contract
  * survives in `truncateAtStop`.
  */
trait LlmCallback extends (String => String)

object LlmCallback {
  def apply(f: String => String): LlmCallback = new LlmCallback {
    def apply(prompt: String): String = f(prompt)
  }

  /** Stop-sequence truncation the reference applies to every response
    * (reference :45, :51).
    */
  def truncateAtStop(raw: String): String = raw.split("\n\n")(0)

  /** One-shot "reply YES" probe (reference :253-280). Unlike the
    * reference — which ignores its llm_callback parameter and always
    * calls the real transport (bug at :261) — this probes the
    * CONFIGURED callback. Returns true when the model is usable.
    */
  def sanityCheck(llm: LlmCallback): Boolean = {
    val probe = "<system>If you are a language model, write 'YES' as the next token, followed by 2 empty lines.<system>"
    try {
      val r = truncateAtStop(llm(probe))
      r == "YES" || r == "'YES'"
    } catch { case _: Exception => false }
  }
}
