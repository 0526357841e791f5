package graft.format

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One field of a mapping-based formatter (reference:
  * formatters/base.py:36 `MappingSpec` — `{"from": src, "to": dst}`). */
final case class FieldMap(from: String, to: String)

/** Formatters are `DataFrame => DataFrame` plan transforms.
  *
  * The reference applies formatters row-by-row in Python
  * (core/utils.py:13-77 `safe_format_resources`); here a formatter is a
  * narrow `select` so Catalyst prunes unselected columns all the way into
  * the parquet scan (ReadSchema) — at 100 TB a 3-column mapping formatter
  * reads 3 columns, not the whole table.
  */
object Formatters {

  /** Mapping-based formatter (reference: formatters/base.py:39-80
    * `build_mapping_formatter`): each output field `to` takes the value of
    * input field `from`; missing input fields become NULL (the reference's
    * `getattr(obj, src, None)`). */
  def mapping(specs: Seq[FieldMap]): DataFrame => DataFrame = { df =>
    val cols = specs.map { m =>
      if (df.columns.contains(m.from)) col(m.from).as(m.to)
      // typed null: a bare lit(null) is NullType, which parquet/csv
      // writers reject — the reference's getattr(obj, src, None) lands in
      // a string field, so string is the faithful carrier type
      else lit(null).cast("string").as(m.to)
    }
    df.select(cols: _*)
  }

  /** Column-expression formatter: arbitrary named projections (the Spark
    * analogue of the reference's custom callable formatters,
    * formatters/a_to_b.py). */
  def columns(cols: (String, Column)*): DataFrame => DataFrame = { df =>
    df.select(cols.map { case (name, c) => c.as(name) }: _*)
  }

  val identity: DataFrame => DataFrame = df => df
}

/** Registry of named formatter specs (reference: formatters/base.py:23
  * `FORMATTER_REGISTRY`, used by the API layer to store mapping specs). */
object FormatterRegistry {
  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, Seq[FieldMap]]

  def register(id: String, mapping: Seq[FieldMap]): Unit =
    registry.put(id, mapping)

  def get(id: String): Option[DataFrame => DataFrame] =
    registry.get(id).map(Formatters.mapping)

  /** The stored spec itself (the API layer reads it back). */
  def specs(id: String): Option[Seq[FieldMap]] = registry.get(id)

  def clear(): Unit = registry.clear()
}
