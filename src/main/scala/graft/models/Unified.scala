package graft.models

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed unified layer (reference: core/models.py — UnifiedJob:160,
  * UnifiedProfile:427, with nested Location/Skill/Entity structs). Dates
  * stay ISO-8601 strings exactly as in the reference's pydantic models.
  * A representative subset of fields is modeled; `payload` carries the
  * rest as a JSON string (the reference keeps a Dict payload). */
final case class Location(text: Option[String], lat: Option[Double], lng: Option[Double])
final case class Entity(name: String, value: Option[String])

final case class UnifiedJob(
    id: String,
    origin: String,
    key: String,
    reference: Option[String],
    board_key: Option[String],
    created_at: Option[String],
    updated_at: Option[String],
    name: String,
    summary: Option[String],
    location: Option[Location],
    text: String,
    skills: Seq[Entity],
    tags: Seq[Entity],
    payload: Option[String])

final case class Experience(
    title: Option[String], company: Option[String],
    date_start: Option[String], date_end: Option[String])

final case class Education(
    school: Option[String], degree: Option[String],
    date_start: Option[String], date_end: Option[String])

final case class UnifiedProfile(
    id: String,
    origin: String,
    key: String,
    source_key: Option[String],
    created_at: Option[String],
    updated_at: Option[String],
    full_name: Option[String],
    email: Option[String],
    location: Option[Location],
    text: String,
    experiences: Seq[Experience],
    experiences_duration: Option[Double],
    educations: Seq[Education],
    educations_duration: Option[Double],
    skills: Seq[Entity],
    tags: Seq[Entity],
    payload: Option[String])

/** Column bindings for building the typed unified layer from any native
  * frame — the Spark analogue of a connector's `to_unified_job`
  * (reference: core/connector.py:53). Unbound fields default to NULL /
  * empty, mirroring optional pydantic fields. */
final case class JobColumns(
    id: Column, origin: Column, key: Column, name: Column, text: Column,
    reference: Column = lit(null).cast("string"),
    boardKey: Column = lit(null).cast("string"),
    createdAt: Column = lit(null).cast("string"),
    updatedAt: Column = lit(null).cast("string"),
    summary: Column = lit(null).cast("string"),
    locationText: Column = lit(null).cast("string"),
    lat: Column = lit(null).cast("double"),
    lng: Column = lit(null).cast("double"),
    skills: Column = array().cast("array<struct<name:string,value:string>>"),
    tags: Column = array().cast("array<struct<name:string,value:string>>"),
    payload: Column = lit(null).cast("string"))

/** Column bindings for the unified profile (reference: to_unified_profile,
  * core/connector.py:108; UnifiedProfile fields incl. experiences/
  * educations and their durations, core/models.py:495-520). */
final case class ProfileColumns(
    id: Column, origin: Column, key: Column, text: Column,
    sourceKey: Column = lit(null).cast("string"),
    createdAt: Column = lit(null).cast("string"),
    updatedAt: Column = lit(null).cast("string"),
    fullName: Column = lit(null).cast("string"),
    email: Column = lit(null).cast("string"),
    locationText: Column = lit(null).cast("string"),
    lat: Column = lit(null).cast("double"),
    lng: Column = lit(null).cast("double"),
    experiences: Column =
      array().cast("array<struct<title:string,company:string,date_start:string,date_end:string>>"),
    experiencesDuration: Column = lit(null).cast("double"),
    educations: Column =
      array().cast("array<struct<school:string,degree:string,date_start:string,date_end:string>>"),
    educationsDuration: Column = lit(null).cast("double"),
    skills: Column = array().cast("array<struct<name:string,value:string>>"),
    tags: Column = array().cast("array<struct<name:string,value:string>>"),
    payload: Column = lit(null).cast("string"))

object Unified {

  /** Native frame → Dataset[UnifiedJob]: a narrow select into the unified
    * schema, then a typed view. Catalyst prunes unused native columns; the
    * Encoder gives compile-time field safety downstream. */
  def jobs(df: DataFrame, c: JobColumns): Dataset[UnifiedJob] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      c.id.cast("string").as("id"),
      c.origin.cast("string").as("origin"),
      c.key.cast("string").as("key"),
      c.reference.as("reference"),
      c.boardKey.as("board_key"),
      c.createdAt.as("created_at"),
      c.updatedAt.as("updated_at"),
      c.name.cast("string").as("name"),
      c.summary.as("summary"),
      struct(c.locationText.as("text"), c.lat.as("lat"), c.lng.as("lng")).as("location"),
      c.text.cast("string").as("text"),
      c.skills.as("skills"),
      c.tags.as("tags"),
      c.payload.as("payload")).as[UnifiedJob]
  }

  /** Native frame → Dataset[UnifiedProfile] (to_unified_profile analogue,
    * core/connector.py:108). */
  def profiles(df: DataFrame, c: ProfileColumns): Dataset[UnifiedProfile] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      c.id.cast("string").as("id"),
      c.origin.cast("string").as("origin"),
      c.key.cast("string").as("key"),
      c.sourceKey.as("source_key"),
      c.createdAt.as("created_at"),
      c.updatedAt.as("updated_at"),
      c.fullName.as("full_name"),
      c.email.as("email"),
      struct(c.locationText.as("text"), c.lat.as("lat"), c.lng.as("lng")).as("location"),
      c.text.cast("string").as("text"),
      c.experiences.as("experiences"),
      c.experiencesDuration.as("experiences_duration"),
      c.educations.as("educations"),
      c.educationsDuration.as("educations_duration"),
      c.skills.as("skills"),
      c.tags.as("tags"),
      c.payload.as("payload")).as[UnifiedProfile]
  }

  /** REVERSE path (from_unified_job / from_unified_profile,
    * core/connector.py:58,113): project a unified frame back into a
    * native layout. Each native column is an expression over the unified
    * schema — use [[entityValue]] to pull values back out of the Entity
    * collections, `col("location.text")` etc. for the nested structs.
    * The reference runs this per-object in Python before every write;
    * here it is one narrow projection Catalyst folds into the write. */
  def toNative(unified: DataFrame, fields: Seq[(String, Column)]): DataFrame =
    unified.select(fields.map { case (n, e) => e.as(n) }: _*)

  /** Value of the first Entity named `name` in a skills/tags collection
    * (null when absent) — the common reverse-mapping accessor. `get` (not
    * element_at) so an empty filter result is null under ANSI. */
  def entityValue(collection: Column, name: String): Column =
    get(filter(collection, e => e.getField("name") === lit(name)), lit(0))
      .getField("value")

  /** Total years spanned by (date_start, date_end) ISO-date ranges: the
    * experiences_duration / educations_duration computation
    * (core/models.py:505-510). Open-ended ranges contribute 0. */
  def durationYears(ranges: Column): Column =
    round(aggregate(ranges, lit(0.0), (acc, r) =>
      acc + coalesce(
        datediff(to_date(r.getField("date_end")), to_date(r.getField("date_start"))) / 365.25,
        lit(0.0))), 2)
}
