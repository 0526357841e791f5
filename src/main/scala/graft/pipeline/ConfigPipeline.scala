package graft.pipeline

import graft.conditions.{Condition, Conditions, Op}
import graft.cursor.{Cursor, CursorMode}
import graft.format.{FieldMap, Formatters}
import graft.sources.WarehouseRegistry
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Config-driven pull (reference: core/pipeline.py:227-265
  * `ResourcePullConfig` / `run_resource_pull_from_config`): a JSON document
  * names origin/target warehouses (resolved through the registry), the
  * cursor, WHERE/HAVING condition lists, and an optional mapping formatter;
  * running it composes the declarative pull plan and (unless dry_run)
  * writes to the target. */
final case class PullConfig(
    resource: String,
    origin: String,
    target: String,
    cursorMode: CursorMode,
    cursorField: String,
    cursorStart: Option[String],
    cursorEnd: Option[String],
    ascending: Boolean,
    where: Seq[Condition],
    having: Seq[Condition],
    mapping: Seq[FieldMap],
    dryRun: Boolean,
    // TIMESTAMP AS OF (epoch millis): pull from the origin table's
    // snapshot at that wall time — reproducibility for "rerun
    // yesterday's pipeline against yesterday's table". Requires a
    // manifest-warehouse origin (time travel needs versions).
    asOf: Option[Long] = None)

object ConfigPipeline {

  private def jValueToAny(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     => if (i.isValidLong) i.toLong else i
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JBool(b)    => b
    case JArray(xs)  => xs.map(jValueToAny)
    case JNull       => null
    case other       => throw new IllegalArgumentException(s"unsupported condition value: $other")
  }

  private[graft] def parseConditions(v: JValue): Seq[Condition] = v match {
    case JArray(items) => items.map { item =>
      Condition(
        field = (item \ "field") match { case JString(s) => s
          case _ => throw new IllegalArgumentException("condition.field must be a string") },
        op = Op.fromName((item \ "op") match { case JString(s) => s
          case _ => throw new IllegalArgumentException("condition.op must be a string") }),
        value = jValueToAny(item \ "value"))
    }
    case JNothing => Nil
    case other    => throw new IllegalArgumentException(s"conditions must be an array, got $other")
  }

  private def parseMapping(v: JValue): Seq[FieldMap] = v match {
    case JArray(items) => items.map { item =>
      ((item \ "from"), (item \ "to")) match {
        case (JString(f), JString(t)) => FieldMap(f, t)
        case _ => throw new IllegalArgumentException("mapping entries need string from/to")
      }
    }
    case JNothing => Nil
    case other    => throw new IllegalArgumentException(s"mapping must be an array, got $other")
  }

  private def str(v: JValue, what: String): String = v match {
    case JString(s) => s
    case _ => throw new IllegalArgumentException(s"$what must be a string")
  }

  /** `formatter_id` resolves a REGISTERED mapping from FormatterRegistry
    * so one run call carries the formatter by reference — the reference's
    * run_pull_with_formatter / run_push_with_formatter (app/api.py:226,
    * 277) folded into the ordinary run config. Mutually exclusive with an
    * inline `mapping` (ambiguous otherwise); unknown ids fail loudly
    * (the reference 404s). */
  private def resolveMapping(j: JValue): Seq[graft.format.FieldMap] = {
    val inline = parseMapping(j \ "mapping")
    (j \ "formatter_id") match {
      case JString(id) =>
        require(inline.isEmpty,
          "config carries both 'mapping' and 'formatter_id' — pick one")
        graft.format.FormatterRegistry.specs(id).getOrElse(
          throw new NoSuchElementException(s"no formatter '$id' registered"))
      case _ => inline
    }
  }

  def parsePull(json: String): PullConfig = {
    val j = JsonMethods.parse(json)
    val modeName = (j \ "cursor" \ "mode") match {
      case JString(s) => s; case _ => "updated_at"
    }
    val mode = Seq(CursorMode.Uid, CursorMode.CreatedAt, CursorMode.UpdatedAt)
      .find(_.name == modeName)
      .getOrElse(throw new IllegalArgumentException(s"unknown cursor mode: $modeName"))
    PullConfig(
      resource = str(j \ "resource", "resource"),
      origin = str(j \ "origin", "origin"),
      target = str(j \ "target", "target"),
      cursorMode = mode,
      cursorField = str(j \ "cursor" \ "field", "cursor.field"),
      cursorStart = (j \ "cursor" \ "start") match { case JString(s) => Some(s); case _ => None },
      cursorEnd = (j \ "cursor" \ "end") match { case JString(s) => Some(s); case _ => None },
      ascending = (j \ "cursor" \ "sort_by") match { case JString("desc") => false; case _ => true },
      where = parseConditions(j \ "where"),
      having = parseConditions(j \ "having"),
      mapping = resolveMapping(j),
      dryRun = (j \ "dry_run") match { case JBool(b) => b; case _ => false },
      asOf = (j \ "as_of") match {
        case JInt(i) => Some(i.toLong)
        case JLong(l) => Some(l)
        case JNothing => None
        case other => throw new IllegalArgumentException(
          s"as_of must be epoch millis, got $other")
      })
  }

  /** Run a parsed pull config: origin → slice/where/having/format →
    * target (unless dryRun). Returns the output frame and the advanced
    * cursor (reference pull() returns Cursor(start, end=last)). */
  def runPull(spark: SparkSession, cfg: PullConfig): (DataFrame, Cursor) = {
    val origin = WarehouseRegistry.instance(cfg.origin)
    val cursor = Cursor(cfg.cursorMode, cfg.cursorStart, cfg.cursorEnd, cfg.ascending)
    val format =
      if (cfg.mapping.nonEmpty) Formatters.mapping(cfg.mapping) else Formatters.identity
    // a stats/metadata-pruning origin gets the cursor window + WHERE
    // handed down so it can skip files before Spark plans the scan; the
    // pipeline still applies the same predicates row-level (idempotent),
    // so the result is identical either way — only the scan cost moves
    val source = (origin, cfg.asOf) match {
      case (mw: graft.sources.ManifestWarehouse, Some(ts)) =>
        // snapshot read: resolves the newest version committed at or
        // before ts; predicates still apply row-level below (the
        // stats-pruned path reads the LATEST version, so it does not
        // compose with time travel)
        graft.sources.ManifestTable.readAsOf(spark,
          s"${mw.baseDir}/${cfg.resource}", ts)
      case (_, Some(_)) => throw new IllegalArgumentException(
        "as_of requires a manifest-warehouse origin (time travel needs versions)")
      case (pr: graft.sources.PrunedReads, None) =>
        pr.readWhere(spark, cfg.resource,
          cursor.conditions(cfg.cursorField) ++ cfg.where)
      case _ => origin.read(spark, cfg.resource)
    }
    val (out, advanced) = Pipeline.pullWithCursor(
      source, cfg.cursorField, cursor,
      cfg.where, cfg.having, format)
    if (!cfg.dryRun)
      WarehouseRegistry.instance(cfg.target).write(out, cfg.resource, SaveMode.Overwrite)
    (out, advanced)
  }

  def runPull(spark: SparkSession, json: String): (DataFrame, Cursor) =
    runPull(spark, parsePull(json))

  /** Config-driven push (reference: core/pipeline.py:269-309
    * `ResourcePushConfig` / `run_resource_push_from_config`). EVENTS mode
    * reads the event stream from `eventsResource` on the origin and joins
    * it to the origin's `resource` table (the fetch-by-id); RESOURCES mode
    * pushes the origin resource directly. `required` names formatted
    * output columns that must be non-null — rows failing it are counted
    * as `errors` and skipped, not written (the safe_format_resources
    * behavior, core/utils.py:13). Returns the pushed frame and the
    * PushResult counters frame. */
  final case class PushConfig(
      resource: String,
      origin: String,
      target: String,
      mode: String, // "events" | "resources"
      eventsResource: Option[String],
      eventIdCol: Option[String],
      resourceIdCol: Option[String],
      having: Seq[Condition],
      mapping: Seq[FieldMap],
      required: Seq[String],
      dryRun: Boolean,
      // events often land in a lake while the resources live in the SaaS
      // origin — None means the events come from `origin` itself
      eventsOrigin: Option[String] = None,
      // target SaveMode: "overwrite" (default), "append", or "merge" —
      // for a REST target with updateIdField configured, overwrite
      // routes through the PUT-update verb and append through
      // POST-create; "merge" requires a manifest (transactional) target
      // and `merge_keys`, and runs the copy-on-write MERGE INTO commit
      // (push-as-upsert onto a versioned sink)
      saveMode: String = "overwrite",
      mergeKeys: Seq[String] = Nil,
      // declarative tombstone rule for merge: rows where column == value
      // DELETE their match instead of upserting
      deleteWhenColumn: Option[String] = None,
      deleteWhenValue: Option[String] = None,
      // "cow" (default) rewrites the files a batch's keys touch;
      // "mor" commits O(batch) delete+upsert bytes and rewrites nothing
      // (ManifestTable.mergeMoR) — the high-frequency-sync cost model;
      // fold the delete ledger with compaction
      mergeStrategy: String = "cow")

  private def parseStrings(v: JValue, what: String): Seq[String] = v match {
    case JArray(items) => items.map {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"$what entries must be strings, got $other")
    }
    case JNothing => Nil
    case other => throw new IllegalArgumentException(s"$what must be an array, got $other")
  }

  def parsePush(json: String): PushConfig = {
    val j = JsonMethods.parse(json)
    def opt(v: JValue): Option[String] = v match { case JString(s) => Some(s); case _ => None }
    PushConfig(
      resource = str(j \ "resource", "resource"),
      origin = str(j \ "origin", "origin"),
      target = str(j \ "target", "target"),
      mode = opt(j \ "mode").getOrElse("resources"),
      eventsResource = opt(j \ "events_resource"),
      eventIdCol = opt(j \ "event_id_col"),
      resourceIdCol = opt(j \ "resource_id_col"),
      having = parseConditions(j \ "having"),
      mapping = resolveMapping(j),
      required = parseStrings(j \ "required", "required"),
      dryRun = (j \ "dry_run") match { case JBool(b) => b; case _ => false },
      eventsOrigin = opt(j \ "events_origin"),
      saveMode = opt(j \ "save_mode").getOrElse("overwrite"),
      mergeKeys = parseStrings(j \ "merge_keys", "merge_keys"),
      deleteWhenColumn = opt(j \ "delete_when" \ "column"),
      deleteWhenValue = opt(j \ "delete_when" \ "value"),
      mergeStrategy = opt(j \ "merge_strategy").getOrElse("cow"))
  }

  def runPush(spark: SparkSession, cfg: PushConfig): (DataFrame, Option[DataFrame]) = {
    val origin = WarehouseRegistry.instance(cfg.origin)
    val format =
      if (cfg.mapping.nonEmpty) Formatters.mapping(cfg.mapping) else Formatters.identity
    val (out, counters) = cfg.mode match {
      case "events" =>
        val eventsRes = cfg.eventsResource.getOrElse(
          throw new IllegalArgumentException("push mode 'events' needs events_resource"))
        val evIdCol = cfg.eventIdCol.getOrElse(
          throw new IllegalArgumentException("push mode 'events' needs event_id_col"))
        val resIdCol = cfg.resourceIdCol.getOrElse(
          throw new IllegalArgumentException("push mode 'events' needs resource_id_col"))
        val events = WarehouseRegistry
          .instance(cfg.eventsOrigin.getOrElse(cfg.origin))
          .read(spark, eventsRes)
        // a REST origin hydrates ONLY the ids the events name (the
        // reference's fetch-by-id, actions.py:69) — an events push must
        // never pull the origin's whole table
        val resources = origin match {
          case r: graft.sources.RestWarehouse =>
            r.fetchByIds(events.select(org.apache.spark.sql.functions.col(evIdCol)),
              cfg.resource, resIdCol)
          case _ => origin.read(spark, cfg.resource)
        }
        (Pipeline.pushEvents(events, evIdCol, resources, resIdCol, cfg.having, format),
          Some(Pipeline.pushEventsResult(events, evIdCol, resources, resIdCol, cfg.having)))
      case "resources" =>
        // one split builds both the written rows and the counters that
        // describe them — they cannot desynchronize
        val (counters, pushed, _) = Pipeline.pushResourcesResultWithOutput(
          origin.read(spark, cfg.resource), cfg.having, format, cfg.required)
        (pushed, Some(counters))
      case other =>
        throw new IllegalArgumentException(s"unknown push mode: $other")
    }
    // the write ACTION resolves and validates even under dry_run — a dry
    // run exists to catch config errors (unknown save_mode, merge onto a
    // non-manifest target, missing merge_keys) BEFORE a real deploy; only
    // the side effect is skipped
    val write: () => Unit = cfg.saveMode match {
      case "overwrite" => () =>
        WarehouseRegistry.instance(cfg.target).write(out, cfg.resource, SaveMode.Overwrite)
      case "append" => () =>
        WarehouseRegistry.instance(cfg.target).write(out, cfg.resource, SaveMode.Append)
      case "merge" =>
        val mw = WarehouseRegistry.instance(cfg.target) match {
          case m: graft.sources.ManifestWarehouse => m
          case other => throw new IllegalArgumentException(
            s"save_mode 'merge' needs a manifest target, got '${other.name}'")
        }
        if (cfg.mergeKeys.isEmpty) throw new IllegalArgumentException(
          "save_mode 'merge' needs merge_keys")
        val mor = cfg.mergeStrategy match {
          case "mor" => true
          case "cow" => false
          case other => throw new IllegalArgumentException(
            s"unknown merge_strategy: $other (cow|mor)")
        }
        val deleteWhen = for {
          c <- cfg.deleteWhenColumn; v <- cfg.deleteWhenValue
        } yield org.apache.spark.sql.functions.col(c) === v
        () => {
          val path = s"${mw.baseDir}/${cfg.resource}"
          if (mor) graft.sources.ManifestTable.mergeMoR(
            spark, path, out, cfg.mergeKeys, deleteWhen)
          else graft.sources.ManifestTable.merge(
            spark, path, out, cfg.mergeKeys, deleteWhen)
          ()
        }
      case other => throw new IllegalArgumentException(
        s"unknown save_mode: $other (overwrite|append|merge)")
    }
    if (!cfg.dryRun) write()
    (out, counters)
  }

  def runPush(spark: SparkSession, json: String): (DataFrame, Option[DataFrame]) =
    runPush(spark, parsePush(json))
}
