package graft.conditions

import org.json4s.JsonDSL._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Export a [[FilterSchema]] as a JSON field catalogue for UIs
  * (reference: core/ui_schema.py `export_model_fields` — the reference
  * introspects pydantic json_schema_extra; here FieldSpec carries the same
  * metadata explicitly). */
object UiSchema {

  def exportFields(schema: FilterSchema, onlyPrefilterable: Boolean = false): String = {
    val fields = schema.fields
      .filter(f => !onlyPrefilterable || f.allowedOps.nonEmpty)
      .map { f =>
        val base: JObject =
          ("name" -> f.name) ~
          ("prefilter" -> ("operators" -> f.allowedOps.map(_.name).toSeq.sorted))
        val withCursor = f.cursorTag.fold(base)(t => base ~ ("cursor" -> t))
        f.searchBinding.fold(withCursor) { sb =>
          withCursor ~ ("search_binding" ->
            (("search_field" -> sb.searchField) ~
             ("field_join" -> sb.fieldJoin.name) ~
             ("value_join" -> sb.valueJoin.name)))
        }
      }
    JsonMethods.compact(JsonMethods.render(JArray(fields.toList.map(identity[JValue]))))
  }
}
