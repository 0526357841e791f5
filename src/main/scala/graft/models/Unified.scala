package graft.models

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed unified layer (reference: core/models.py — UnifiedJob:160,
  * UnifiedProfile:427, with nested Location/Skill/Entity structs plus
  * Section:104, RangesFloat:117, RangesDate:130, Board:146, Url:310,
  * Attachment:413). Dates stay ISO-8601 strings exactly as in the
  * reference's pydantic models. The reference's ProfileInfo sub-object
  * (core/models.py:315) is flattened into the profile (full_name,
  * first_name, ..., urls) — its fields are 1:1 with profile identity and
  * a flat layout keeps Catalyst pruning and the reverse projection
  * simple. `payload` carries anything else as a JSON string (the
  * reference keeps a Dict payload). */
final case class Location(text: Option[String], lat: Option[Double], lng: Option[Double])
final case class Entity(name: String, value: Option[String])

/** Named free-text block of a job posting (core/models.py:104 Section —
  * e.g. name=culture, title="Corporate Culture", description=...). */
final case class Section(
    name: Option[String], title: Option[String], description: Option[String])

/** Named numeric range attached to a job (core/models.py:117 RangesFloat —
  * e.g. name=salary, 40000..60000 euros). */
final case class RangesFloat(
    name: Option[String], value_min: Option[Double],
    value_max: Option[Double], unit: Option[String])

/** Named ISO-8601 date range (core/models.py:130 RangesDate —
  * e.g. name=availability). */
final case class RangesDate(
    name: Option[String], value_min: Option[String], value_max: Option[String])

/** Board the job is published on (core/models.py:146 Board). */
final case class Board(
    key: String, name: String, `type`: String,
    subtype: String, environment: String)

/** Social/profile link (core/models.py:310 Url — type is one of
  * from_resume/linkedin/twitter/facebook/github in the reference's
  * Literal; kept an open string here, the origin vocabulary varies). */
final case class Url(`type`: Option[String], url: Option[String])

/** Document attached to a profile (core/models.py:413 Attachment). */
final case class Attachment(
    created_at: Option[String], updated_at: Option[String],
    original_file_name: Option[String], extension: Option[String],
    `type`: Option[String], alt: Option[String], file_size: Option[String],
    file_name: Option[String], public_url: Option[String])

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
    payload: Option[String],
    // breadth fields past the representative core, in the reference's
    // declaration order (core/models.py:160-305)
    archived_at: Option[String] = None,
    url: Option[String] = None,
    board: Option[Board] = None,
    sections: Seq[Section] = Nil,
    culture: Option[String] = None,
    benefits: Option[String] = None,
    responsibilities: Option[String] = None,
    requirements: Option[String] = None,
    interviews: Option[String] = None,
    languages: Seq[Entity] = Nil,
    tasks: Seq[Entity] = Nil,
    certifications: Seq[Entity] = Nil,
    courses: Seq[Entity] = Nil,
    metadatas: Seq[Entity] = Nil,
    ranges_float: Seq[RangesFloat] = Nil,
    ranges_date: Seq[RangesDate] = Nil)

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
    payload: Option[String],
    // breadth fields (core/models.py:415-560: ProfileInfo flattened with
    // the reference's info.* names, plus urls/attachments/entity lists)
    reference: Option[String] = None,
    archived_at: Option[String] = None,
    first_name: Option[String] = None,
    last_name: Option[String] = None,
    phone: Option[String] = None,
    date_birth: Option[String] = None,
    gender: Option[String] = None,
    picture: Option[String] = None,
    summary: Option[String] = None,
    text_language: Option[String] = None,
    urls: Seq[Url] = Nil,
    attachments: Seq[Attachment] = Nil,
    languages: Seq[Entity] = Nil,
    tasks: Seq[Entity] = Nil,
    certifications: Seq[Entity] = Nil,
    courses: Seq[Entity] = Nil,
    interests: Seq[Entity] = Nil,
    metadatas: Seq[Entity] = Nil,
    labels: Seq[Entity] = Nil)

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
    skills: Column = array().cast(Unified.entitiesType),
    tags: Column = array().cast(Unified.entitiesType),
    payload: Column = lit(null).cast("string"),
    archivedAt: Column = lit(null).cast("string"),
    url: Column = lit(null).cast("string"),
    board: Column = lit(null).cast(Unified.boardType),
    sections: Column = array().cast(Unified.sectionsType),
    culture: Column = lit(null).cast("string"),
    benefits: Column = lit(null).cast("string"),
    responsibilities: Column = lit(null).cast("string"),
    requirements: Column = lit(null).cast("string"),
    interviews: Column = lit(null).cast("string"),
    languages: Column = array().cast(Unified.entitiesType),
    tasks: Column = array().cast(Unified.entitiesType),
    certifications: Column = array().cast(Unified.entitiesType),
    courses: Column = array().cast(Unified.entitiesType),
    metadatas: Column = array().cast(Unified.entitiesType),
    rangesFloat: Column = array().cast(Unified.rangesFloatType),
    rangesDate: Column = array().cast(Unified.rangesDateType))

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
    skills: Column = array().cast(Unified.entitiesType),
    tags: Column = array().cast(Unified.entitiesType),
    payload: Column = lit(null).cast("string"),
    reference: Column = lit(null).cast("string"),
    archivedAt: Column = lit(null).cast("string"),
    firstName: Column = lit(null).cast("string"),
    lastName: Column = lit(null).cast("string"),
    phone: Column = lit(null).cast("string"),
    dateBirth: Column = lit(null).cast("string"),
    gender: Column = lit(null).cast("string"),
    picture: Column = lit(null).cast("string"),
    summary: Column = lit(null).cast("string"),
    textLanguage: Column = lit(null).cast("string"),
    urls: Column = array().cast(Unified.urlsType),
    attachments: Column = array().cast(Unified.attachmentsType),
    languages: Column = array().cast(Unified.entitiesType),
    tasks: Column = array().cast(Unified.entitiesType),
    certifications: Column = array().cast(Unified.entitiesType),
    courses: Column = array().cast(Unified.entitiesType),
    interests: Column = array().cast(Unified.entitiesType),
    metadatas: Column = array().cast(Unified.entitiesType),
    labels: Column = array().cast(Unified.entitiesType))

object Unified {

  /** DDL fragments for the nested collection defaults — single source of
    * truth for the unified layer's struct shapes. */
  val entitiesType = "array<struct<name:string,value:string>>"
  val sectionsType = "array<struct<name:string,title:string,description:string>>"
  val rangesFloatType =
    "array<struct<name:string,value_min:double,value_max:double,unit:string>>"
  val rangesDateType = "array<struct<name:string,value_min:string,value_max:string>>"
  val boardType =
    "struct<key:string,name:string,type:string,subtype:string,environment:string>"
  val urlsType = "array<struct<type:string,url:string>>"
  val attachmentsType =
    "array<struct<created_at:string,updated_at:string,original_file_name:string," +
      "extension:string,type:string,alt:string,file_size:string,file_name:string," +
      "public_url:string>>"

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
      c.payload.as("payload"),
      c.archivedAt.as("archived_at"),
      c.url.as("url"),
      c.board.as("board"),
      c.sections.as("sections"),
      c.culture.as("culture"),
      c.benefits.as("benefits"),
      c.responsibilities.as("responsibilities"),
      c.requirements.as("requirements"),
      c.interviews.as("interviews"),
      c.languages.as("languages"),
      c.tasks.as("tasks"),
      c.certifications.as("certifications"),
      c.courses.as("courses"),
      c.metadatas.as("metadatas"),
      c.rangesFloat.as("ranges_float"),
      c.rangesDate.as("ranges_date")).as[UnifiedJob]
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
      c.payload.as("payload"),
      c.reference.as("reference"),
      c.archivedAt.as("archived_at"),
      c.firstName.as("first_name"),
      c.lastName.as("last_name"),
      c.phone.as("phone"),
      c.dateBirth.as("date_birth"),
      c.gender.as("gender"),
      c.picture.as("picture"),
      c.summary.as("summary"),
      c.textLanguage.as("text_language"),
      c.urls.as("urls"),
      c.attachments.as("attachments"),
      c.languages.as("languages"),
      c.tasks.as("tasks"),
      c.certifications.as("certifications"),
      c.courses.as("courses"),
      c.interests.as("interests"),
      c.metadatas.as("metadatas"),
      c.labels.as("labels")).as[UnifiedProfile]
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

  /** First range struct named `name` in a ranges_float/ranges_date
    * collection (null when absent) — reverse-map salary/availability
    * windows back to native min/max columns via `.getField("value_min")`
    * etc. */
  def rangeNamed(ranges: Column, name: String): Column =
    get(filter(ranges, r => r.getField("name") === lit(name)), lit(0))

  /** First url of a given type in a urls collection (null when absent) —
    * e.g. `urlOf(col("urls"), "linkedin")`. */
  def urlOf(urls: Column, urlType: String): Column =
    get(filter(urls, u => u.getField("type") === lit(urlType)), lit(0))
      .getField("url")

  /** Total years spanned by (date_start, date_end) ISO-date ranges: the
    * experiences_duration / educations_duration computation
    * (core/models.py:505-510). Open-ended ranges contribute 0. */
  def durationYears(ranges: Column): Column =
    round(aggregate(ranges, lit(0.0), (acc, r) =>
      acc + coalesce(
        datediff(to_date(r.getField("date_end")), to_date(r.getField("date_start"))) / 365.25,
        lit(0.0))), 2)
}
