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
