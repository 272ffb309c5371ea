package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversation (instruction/chat) data preparation: parse JSON
  * message arrays, validate the role protocol, and render the
  * training text — the step that turns raw assistant-log exports into
  * SFT training rows. Everything is a per-row Column program over
  * `from_json` — no UDF and no shuffle, but NOT codegen'd:
  * `from_json` and the higher-order array functions are
  * CodegenFallback in Spark (interpreted per row). To bound that
  * cost the validation+render is a SINGLE `aggregate` fold over the
  * message array (one interpreted pass, struct accumulator), not a
  * chain of forall/transform/aggregate passes. Malformed rows are
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
    // one fold computes content validity, role-protocol validity and
    // the rendered text together: acc = (index, contentOk, rolesOk,
    // text). role/content nulls are coalesced so one bad turn can't
    // nullify the running flags; the rendered text for an invalid row
    // is masked to NULL at the end regardless.
    val folded = aggregate(
      msgs,
      struct(lit(0).as("i"), lit(true).as("c"), lit(true).as("r"),
        lit("").as("t")),
      (acc, m) => {
        val i = acc.getField("i")
        struct(
          (i + 1).as("i"),
          (acc.getField("c") &&
            coalesce(length(content(m)) > 0, lit(false))).as("c"),
          (acc.getField("r") && coalesce(
            when(i < offset, role(m) === "system")
              .otherwise(role(m) === when(((i - offset) % 2) === 0, "user")
                .otherwise("assistant")),
            lit(false))).as("r"),
          concat(acc.getField("t"),
            when(i > 0, lit("\n")).otherwise(lit("")),
            lit("<|"), coalesce(role(m), lit("")), lit("|> "),
            coalesce(content(m), lit(""))).as("t"))
      })
    val contentOk = coalesce(folded.getField("c"), lit(false))
    val rolesOk = coalesce(folded.getField("r"), lit(false)) && n > offset
    val valid = msgs.isNotNull && n > 0 && contentOk && rolesOk
    val reason = when(msgs.isNull, "parse")
      .when(n === 0, "empty")
      .when(!contentOk, "content")
      .when(!rolesOk, "role")
      .otherwise("ok")
    df.select(col(idCol).as("id"),
      greatest(n, lit(0)).cast("long").as("n_turns"), // size(null) = -1
      valid.as("valid"), reason.as("reason"),
      when(valid, folded.getField("t")).as("text"))
  }
}
