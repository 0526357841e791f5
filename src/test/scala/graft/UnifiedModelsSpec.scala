package graft

import graft.models._
import org.apache.spark.sql.functions._

class UnifiedModelsSpec extends SparkSpecBase {

  test("native orders+customer normalize into a typed Dataset[UnifiedJob]") {
    val native = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "customer"), col("o_custkey") === col("c_custkey"))
    val jobs = Unified.jobs(native, JobColumns(
      id = concat(lit("order-"), col("o_orderkey")),
      origin = lit("warehouse_orders"),
      key = col("o_orderkey"),
      name = col("c_name"),
      text = col("o_orderstatus"),
      createdAt = date_format(col("o_orderdate"), "yyyy-MM-dd"),
      tags = array(struct(lit("segment").as("name"), col("c_mktsegment").as("value")))))

    assert(jobs.count() == 1500)
    // typed operations through the Encoder
    val one = jobs.filter(_.key == "1").head()
    assert(one.id == "order-1" && one.origin == "warehouse_orders")
    assert(one.created_at.exists(_.startsWith("19")) || one.created_at.exists(_.startsWith("20")))
    assert(one.tags.head.name == "segment" && one.tags.head.value.isDefined)
    assert(one.reference.isEmpty && one.skills.isEmpty)
    // unified frame round-trips through parquet with the nested schema
    val tmp = java.nio.file.Files.createTempDirectory("graft-uj-").toString
    jobs.write.mode("overwrite").parquet(s"$tmp/jobs")
    import spark.implicits._
    val back = spark.read.parquet(s"$tmp/jobs").as[UnifiedJob]
    assert(back.count() == 1500)
  }

  test("reverse path: native -> unified -> native round-trips modeled fields") {
    val native = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("c_mktsegment"))
    val unified = Unified.jobs(native, JobColumns(
      id = concat(lit("order-"), col("o_orderkey")),
      origin = lit("warehouse_orders"),
      key = col("o_orderkey"),
      name = col("c_name"),
      text = col("o_orderstatus"),
      createdAt = col("order_date"),
      tags = array(struct(lit("segment").as("name"), col("c_mktsegment").as("value")))))
    val back = Unified.toNative(unified.toDF(), Seq(
      "o_orderkey" -> col("key").cast("long"),
      "c_name" -> col("name"),
      "o_orderstatus" -> col("text"),
      "order_date" -> col("created_at"),
      "c_mktsegment" -> Unified.entityValue(col("tags"), "segment")))
    assert(back.except(native).isEmpty && native.except(back).isEmpty)
  }

  test("job breadth structs round-trip: sections/ranges/board/url + entity lists") {
    import spark.implicits._
    val native = Seq(
      (1L, "backend dev", "great team", 40000.0, 60000.0,
        "2024-01-01", "2024-03-01", "board-a", "en"),
      (2L, "data eng", null, 50000.0, 90000.0,
        null, null, "board-b", "fr")
    ).toDF("jid", "title", "culture_text", "sal_min", "sal_max",
      "avail_from", "avail_to", "bkey", "lang")
    val jobs = Unified.jobs(native, JobColumns(
      id = concat(lit("job-"), col("jid")),
      origin = lit("origin_x"),
      key = col("jid"),
      name = col("title"),
      text = col("title"),
      url = concat(lit("https://x.example/"), col("jid")),
      board = struct(col("bkey").as("key"), lit("Board").as("name"),
        lit("api").as("type"), lit("scala").as("subtype"),
        lit("test").as("environment")),
      sections = array(struct(lit("culture").as("name"),
        lit("Culture").as("title"), col("culture_text").as("description"))),
      culture = col("culture_text"),
      languages = array(struct(lit("lang").as("name"), col("lang").as("value"))),
      certifications = array(struct(lit("cert").as("name"), lit("aws").as("value"))),
      courses = array(struct(lit("course").as("name"), lit("ml101").as("value"))),
      metadatas = array(struct(lit("src").as("name"), lit("test").as("value"))),
      rangesFloat = array(struct(lit("salary").as("name"),
        col("sal_min").as("value_min"), col("sal_max").as("value_max"),
        lit("eur").as("unit"))),
      rangesDate = array(struct(lit("availability").as("name"),
        col("avail_from").as("value_min"), col("avail_to").as("value_max")))))

    val j1 = jobs.filter(_.key == "1").head()
    assert(j1.board.exists(b => b.key == "board-a" && b.`type` == "api"))
    assert(j1.sections.head.name.contains("culture") &&
      j1.sections.head.description.contains("great team"))
    assert(j1.culture.contains("great team"))
    assert(j1.ranges_float.head.value_min.contains(40000.0) &&
      j1.ranges_float.head.unit.contains("eur"))
    assert(j1.ranges_date.head.value_max.contains("2024-03-01"))
    assert(j1.languages.head.value.contains("en"))
    assert(j1.certifications.head.value.contains("aws"))
    assert(j1.courses.head.value.contains("ml101"))
    assert(j1.metadatas.head.value.contains("test"))
    assert(j1.url.contains("https://x.example/1"))
    val j2 = jobs.filter(_.key == "2").head()
    assert(j2.sections.head.description.isEmpty && j2.culture.isEmpty)
    assert(j2.ranges_date.head.value_min.isEmpty)

    // reverse: the range/section accessors pull natives back out
    val back = Unified.toNative(jobs.toDF(), Seq(
      "jid" -> col("key").cast("long"),
      "title" -> col("name"),
      "culture_text" -> col("culture"),
      "sal_min" -> Unified.rangeNamed(col("ranges_float"), "salary").getField("value_min"),
      "sal_max" -> Unified.rangeNamed(col("ranges_float"), "salary").getField("value_max"),
      "avail_from" -> Unified.rangeNamed(col("ranges_date"), "availability").getField("value_min"),
      "avail_to" -> Unified.rangeNamed(col("ranges_date"), "availability").getField("value_max"),
      "bkey" -> col("board").getField("key"),
      "lang" -> Unified.entityValue(col("languages"), "lang")))
    assert(back.except(native).isEmpty && native.except(back).isEmpty)
    // unified frame round-trips through parquet with the nested schema
    val tmp = java.nio.file.Files.createTempDirectory("graft-ujb-").toString
    jobs.write.mode("overwrite").parquet(s"$tmp/jobs")
    assert(spark.read.parquet(s"$tmp/jobs").as[UnifiedJob]
      .filter(_.board.exists(_.key == "board-a")).count() == 1)
  }

  test("profile breadth: info fields, urls, attachments, labels round-trip") {
    import spark.implicits._
    val native = Seq(
      (1L, "Ada Lovelace", "Ada", "Lovelace", "+441234", "1815-12-10",
        "https://linkedin.example/ada", "cv.pdf", "en"),
      (2L, "Bob", "Bob", null, null, null, null, null, "fr")
    ).toDF("pid", "full", "first", "last", "phone", "birth", "li", "cv", "lang")
    val profiles = Unified.profiles(native, ProfileColumns(
      id = concat(lit("p-"), col("pid")),
      origin = lit("origin_y"),
      key = col("pid"),
      text = col("full"),
      fullName = col("full"),
      firstName = col("first"),
      lastName = col("last"),
      phone = col("phone"),
      dateBirth = col("birth"),
      textLanguage = col("lang"),
      urls = array(struct(lit("linkedin").as("type"), col("li").as("url"))),
      attachments = array(struct(
        lit("2024-01-01").as("created_at"), lit(null).cast("string").as("updated_at"),
        col("cv").as("original_file_name"), lit("pdf").as("extension"),
        lit("resume").as("type"), lit(null).cast("string").as("alt"),
        lit("1024").as("file_size"), col("cv").as("file_name"),
        lit(null).cast("string").as("public_url"))),
      interests = array(struct(lit("interest").as("name"), lit("maths").as("value"))),
      labels = array(struct(lit("stage").as("name"), lit("sourced").as("value")))))

    val ada = profiles.filter(_.key == "1").head()
    assert(ada.first_name.contains("Ada") && ada.last_name.contains("Lovelace"))
    assert(ada.phone.contains("+441234") && ada.date_birth.contains("1815-12-10"))
    assert(ada.text_language.contains("en"))
    assert(ada.urls.head.`type`.contains("linkedin") &&
      ada.urls.head.url.contains("https://linkedin.example/ada"))
    assert(ada.attachments.head.extension.contains("pdf") &&
      ada.attachments.head.file_name.contains("cv.pdf"))
    assert(ada.interests.head.value.contains("maths"))
    assert(ada.labels.head.value.contains("sourced"))
    val bob = profiles.filter(_.key == "2").head()
    assert(bob.last_name.isEmpty && bob.urls.head.url.isEmpty)

    val back = Unified.toNative(profiles.toDF(), Seq(
      "pid" -> col("key").cast("long"),
      "full" -> col("full_name"),
      "first" -> col("first_name"),
      "last" -> col("last_name"),
      "phone" -> col("phone"),
      "birth" -> col("date_birth"),
      "li" -> Unified.urlOf(col("urls"), "linkedin"),
      "cv" -> col("attachments")(0).getField("file_name"),
      "lang" -> col("text_language")))
    assert(back.except(native).isEmpty && native.except(back).isEmpty)
  }

  test("profiles: educations/experiences with computed durations") {
    import spark.implicits._
    val native = Seq(
      (1L, "ada", "ada@x.io", "2018-01-01", "2020-01-01", "2010-09-01", "2013-08-31"),
      (2L, "bob", null, null, null, null, null)
    ).toDF("pid", "pname", "pmail", "exp_start", "exp_end", "edu_start", "edu_end")
    val profiles = Unified.profiles(native, ProfileColumns(
      id = concat(lit("profile-"), col("pid")),
      origin = lit("warehouse_people"),
      key = col("pid"),
      text = coalesce(col("pname"), lit("")),
      fullName = col("pname"),
      email = col("pmail"),
      experiences = array(struct(
        lit("engineer").as("title"), lit(null).cast("string").as("company"),
        col("exp_start").as("date_start"), col("exp_end").as("date_end"))),
      experiencesDuration = Unified.durationYears(array(struct(
        lit("engineer").as("title"), lit(null).cast("string").as("company"),
        col("exp_start").as("date_start"), col("exp_end").as("date_end")))),
      educations = array(struct(
        lit("uni").as("school"), lit("bsc").as("degree"),
        col("edu_start").as("date_start"), col("edu_end").as("date_end"))),
      educationsDuration = Unified.durationYears(array(struct(
        lit("uni").as("school"), lit("bsc").as("degree"),
        col("edu_start").as("date_start"), col("edu_end").as("date_end"))))))
    val ada = profiles.filter(_.key == "1").head()
    assert(ada.full_name.contains("ada") && ada.experiences.head.title.contains("engineer"))
    assert(ada.experiences_duration.exists(d => d > 1.9 && d < 2.1))
    assert(ada.educations_duration.exists(d => d > 2.9 && d < 3.1))
    assert(ada.educations.head.degree.contains("bsc"))
    val bob = profiles.filter(_.key == "2").head()
    assert(bob.email.isEmpty && bob.experiences_duration.contains(0.0))
    // reverse: unified -> native on the modeled fields
    val back = Unified.toNative(profiles.toDF(), Seq(
      "pid" -> col("key").cast("long"),
      "pname" -> col("full_name"),
      "pmail" -> col("email"),
      "exp_start" -> col("experiences")(0).getField("date_start"),
      "exp_end" -> col("experiences")(0).getField("date_end"),
      "edu_start" -> col("educations")(0).getField("date_start"),
      "edu_end" -> col("educations")(0).getField("date_end")))
    val orig = native
    assert(back.except(orig).isEmpty && orig.except(back).isEmpty)
  }
}
