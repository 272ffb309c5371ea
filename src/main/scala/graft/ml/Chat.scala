package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversation (instruction/chat) data preparation: parse JSON
  * message arrays, validate the role protocol, and render the
  * training text — the step that turns raw assistant-log exports into
  * SFT training rows. Everything is a per-row Column program over
  * `from_json` (codegen'd, no UDF, no shuffle); malformed rows are
  * CLASSIFIED, not dropped, so the reject stream is auditable.
  */
object Chat {

  /** The minimal chat schema: an array of (role, content) messages.
    * Extra JSON fields per message are ignored by `from_json` — logs
    * routinely carry ids/timestamps alongside.
    */
  val messageSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType),
    StructField("content", StringType))))

  /** Parse + validate + render one conversation per row.
    *
    * Protocol: an optional single leading `system` turn, then strict
    * `user`/`assistant` alternation starting at `user`, at least one
    * non-system turn, every content non-empty. Returns
    * (id, n_turns, valid, reason, text) with reason one of
    * `ok | parse | empty | content | role` (first failure wins in
    * that order) and `text` the rendered `<|role|> content` lines
    * (newline-joined) — NULL unless valid.
    */
  def flattenChat(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val msgs = from_json(col(jsonCol), messageSchema)
    val n = size(msgs)
    val role = (m: Column) => m.getField("role")
    val content = (m: Column) => m.getField("content")
    val offset = when(role(element_at(msgs, 1)) === "system", 1).otherwise(0)
    val contentOk = coalesce(
      forall(msgs, m => content(m).isNotNull && length(content(m)) > 0),
      lit(false))
    val roleChecks = transform(msgs, (m, i) =>
      when(i < offset, role(m) === "system")
        .otherwise(role(m) ===
          when(((i - offset) % 2) === 0, "user").otherwise("assistant")))
    val rolesOk = coalesce(
      aggregate(roleChecks, lit(true), (acc, x) => acc && coalesce(x,
        lit(false))),
      lit(false)) && n > offset
    val valid = msgs.isNotNull && n > 0 && contentOk && rolesOk
    val reason = when(msgs.isNull, "parse")
      .when(n === 0, "empty")
      .when(!contentOk, "content")
      .when(!rolesOk, "role")
      .otherwise("ok")
    df.select(col(idCol).as("id"),
      greatest(n, lit(0)).cast("long").as("n_turns"), // size(null) = -1
      valid.as("valid"), reason.as("reason"),
      when(valid, array_join(transform(msgs, m =>
        concat(lit("<|"), role(m), lit("|> "), content(m))), "\n"))
        .as("text"))
  }
}
