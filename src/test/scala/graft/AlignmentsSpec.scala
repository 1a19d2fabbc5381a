package graft

import org.apache.spark.sql.functions._
import graft.ops.{AlignmentsPipeline, Reconcile}
import graft.sources.graphql.{CapturingSender, MutationSender, MutationSenders}

/** End-to-end coverage of the reference's whole weekly-alignments
  * flow: the composed transform phases on small frames, the load
  * phase through the capturing sink, and the delete → create →
  * fetch → compare resync cycle against an in-memory mutation store.
  */
class AlignmentsSpec extends SparkSpec {
  import spark.implicits._

  private def inputs = {
    val file = Seq(
      ("East", "East-D1", 101.5, "Store A", " ALICE@CORP.COM"),
      ("East", "East-D1", 102.5, "Store B", "BOB@corp.com "),
      ("East", "East-D2", 103.5, "Store C", "carol@corp.com"),
      ("West", "West-D1", 104.5, "Store D", "DAN@CORP.COM"),
      ("West", null, 105.5, "Store E", "eve@corp.com") // dropped by dropna
    ).toDF("region", "district", "unit", "location_name", "manager_email")
    // 101,102 matched; 103 file-only; 999 api-only; one blank remoteId
    val apiLocations = Seq(
      ("101", "store a"), ("102", "store b"), ("999", "store z"), ("", "store c")
    ).toDF("remote_id", "loc_name")
    val equityUsers = Seq(" EQ@CORP.COM ").toDF("equity_email")
    val corporateUsers = Seq("ALICE@CORP.COM", "ZED@CORP.COM").toDF("corporate_email")
    val apiUsers = Seq("alice@corp.com", "zed@corp.com", "other@corp.com")
      .toDF("user_email")
    (file, apiLocations, equityUsers, corporateUsers, apiUsers)
  }

  test("pipeline phases compose: clean, hierarchy, reconcile, stack, corporate, validation") {
    val (file, apiLocations, equityUsers, corporateUsers, apiUsers) = inputs
    val r = AlignmentsPipeline.run(
      file, apiLocations, equityUsers, corporateUsers, apiUsers)

    // hierarchy: 2 regions + 3 (region, district) pairs, E row dropped
    val groups = r.groups.collect()
    assert(groups.count(_.getString(1) == "Region") == 2)
    assert(groups.count(_.getString(1) == "District") == 3)

    // reconcile took the PRIMARY branch (non-blank remoteIds exist):
    // 101/102 both; 103/104 left_only; 999 and "" right_only
    val v = r.validation.as[(String, Long)].collect().toMap
    assert(v == Map("both" -> 2L, "left_only" -> 2L, "right_only" -> 2L))

    // assignments: matched locations per district, sorted
    val asg = r.assignments.as[(String, String, Long)].collect()
      .map { case (d, s, _) => d -> s }.toMap
    assert(asg == Map("East-D1" -> "Store A,Store B"))

    // stack: manager rows normalized + equity user fanned to BOTH regions
    val stack = r.managerStack.as[(String, String, String)].collect().toSet
    assert(stack.contains(("East", "alice@corp.com", "Region")))
    assert(stack.contains(("East-D1", "bob@corp.com", "District")))
    assert(stack.contains(("East", "eq@corp.com", "Region")))
    assert(stack.contains(("West", "eq@corp.com", "Region")))
    assert(!stack.exists(_._2 == "eve@corp.com"), "dropna row leaked into stack")

    // corporate: alice (in api + corporate list) × {East, West} minus
    // the already-assigned (East, alice) pair; zed is corporate but
    // fans out to both (never pre-assigned); other is not corporate
    val corp = r.corporate.as[(String, String, String)].collect().toSet
    assert(corp == Set(
      ("West", "alice@corp.com", "Region"),
      ("East", "zed@corp.com", "Region"),
      ("West", "zed@corp.com", "Region")))
  }

  test("writeReports emits the reference's orphan CSV artifacts") {
    val (file, apiLocations, equityUsers, corporateUsers, apiUsers) = inputs
    val r = AlignmentsPipeline.run(
      file, apiLocations, equityUsers, corporateUsers, apiUsers)
    val apiDistricts = Seq("East-D1", "Old-D9").toDF("api_district")
    val fileUsers = file.select(col("manager_email").as("email"))
    val out = java.nio.file.Files.createTempDirectory("graft-reports").toString
    val paths = AlignmentsPipeline.writeReports(
      r, apiDistricts, fileUsers, apiUsers, out)

    def readBack(name: String) = {
      val p = paths(name)
      assert(new java.io.File(p).isDirectory, s"missing report $p")
      spark.read.option("header", "true").csv(p)
    }
    // ref 430: units 103/104 exist only in the file
    assert(readBack("new_locations_found_in_the_file_and_not_in_API")
      .select("unit").as[String].collect().toSet == Set("103", "104"))
    // ref 520: remote ids 999 and "" exist only in the API (the blank
    // id round-trips through CSV as null — count is the contract)
    assert(readBack("api_locations_not_found_in_the_file").count() == 2)
    // ref 557: Old-D9 is on the API but absent from the new file
    assert(readBack("districts_not_found_in_file_present_on_API")
      .as[String].collect().toSeq == Seq("Old-D9"))
    // ref 823-836: both sides of the user e-mail reconcile
    assert(readBack("new_users_found_in_file_that_does_not_have_match_on_API")
      .as[String].collect().toSet ==
      Set("bob@corp.com", "carol@corp.com", "dan@corp.com", "eve@corp.com"))
    assert(readBack("users_on_API_with_no_match_on_file")
      .as[String].collect().toSet == Set("zed@corp.com", "other@corp.com"))
  }

  test("CSV ingestion applies the reference's cleaning") {
    val df = graft.sources.AlignmentsFile.readCleaned(
      spark, "/root/repo/data/alignments_sample.csv")
    val rows = df.as[(String, String, String, String, String, String)]
      .collect().map(r => r._4 -> r).toMap
    // 40 rows minus 3 empty districts (i%11==7) minus 3 empty units (i%17==3)
    assert(rows.size == 34)
    val r0 = rows("Location 0")
    assert(r0 == (("Region 0", "R0/D0", "1000", "Location 0", "10000", "mgr0@corp.com")))
    val r1 = rows("Location 1") // dash-less zip passes through whole
    assert(r1._5 == "20001" && r1._6 == "mgr1@corp.com")
    assert(!rows.contains("Location 3") && !rows.contains("Location 7"))
  }

  test("JSONL ingestion quarantines malformed lines, parses the rest") {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
    val df = graft.sources.JsonLines.readWithQuarantine(
      spark, "/root/repo/data/events_sample.jsonl",
      StructType(Seq(
        StructField("id", LongType),
        StructField("kind", StringType),
        StructField("amount", DoubleType))))
    val rows = df.collect()
    assert(rows.length == 14, "every input line must be accounted for")
    val bad = rows.filter(!_.getAs[Boolean]("valid"))
    assert(bad.length == 2, "exactly the two malformed lines quarantine")
    assert(bad.forall(r => r.getAs[String]("raw") != null && r.isNullAt(0)),
      "quarantined rows carry the verbatim line and no parsed fields")
    val good = rows.filter(_.getAs[Boolean]("valid"))
    assert(good.forall(_.getAs[String]("raw") == null))
    // missing field parses to null without quarantining the row
    val r8 = good.find(_.getAs[Long]("id") == 8L).get
    assert(r8.isNullAt(2) && r8.getAs[String]("kind") == "view")
  }

  test("plan shapes: fan-outs broadcast, reconcile is one full-outer join") {
    val (file, apiLocations, equityUsers, corporateUsers, apiUsers) = inputs
    val r = AlignmentsPipeline.run(
      file, apiLocations, equityUsers, corporateUsers, apiUsers)
    // the equity and corporate cross joins must be broadcast nested-
    // loop joins against the tiny frames — at scale the fact-sized
    // side must never shuffle for a fan-out
    val corpPlan = r.corporate.queryExecution.sparkPlan.toString
    assert(corpPlan.contains("BroadcastNestedLoopJoin"),
      s"corporate fan-out is not broadcast:\n$corpPlan")
    val stackPlan = r.managerStack.queryExecution.sparkPlan.toString
    assert(stackPlan.contains("BroadcastNestedLoopJoin"),
      s"equity fan-out is not broadcast:\n$stackPlan")
    // reconcile: exactly one join, and it is the full-outer merge
    val mergePlan = r.locationMerge.queryExecution.sparkPlan.toString
    assert("FullOuter".r.findAllIn(mergePlan).size == 1,
      s"expected exactly one full-outer join:\n$mergePlan")
  }

  test("load phase: every stacked row lands in exactly one mutation batch") {
    val (file, apiLocations, equityUsers, corporateUsers, apiUsers) = inputs
    val r = AlignmentsPipeline.run(
      file, apiLocations, equityUsers, corporateUsers, apiUsers)
    val sender = new CapturingSender
    MutationSenders.register("align-load", sender)
    AlignmentsPipeline.load(r.managerStack, "align-load", batchSize = 3)
    val sent = sender.captured
    assert(sent.nonEmpty)
    assert(sent.forall(_.startsWith("mutation { assignPermissions(input: [")))
    val stackRows = r.managerStack.collect()
    stackRows.foreach { row =>
      val needle =
        "\"group_name\": \"" + row.getString(0) + "\", \"email\": \"" + row.getString(1)
      assert(sent.count(_.contains(needle)) == 1, s"row $row not sent exactly once")
    }
  }

  test("delete + reload + resync: store converges to the file's groups; mismatch raises") {
    val (file, apiLocations, equityUsers, corporateUsers, apiUsers) = inputs
    val r = AlignmentsPipeline.run(
      file, apiLocations, equityUsers, corporateUsers, apiUsers)

    val store = AlignmentsSpecFixtures.store
    store.clear()
    store.addAll(Seq("stale-1", "stale-2")) // pre-existing API groups
    MutationSenders.register("align-store", AlignmentsSpecFixtures.StoreSender)

    // 1. delete the existing groups (ref 19-23, 224-246)
    val existing = store.snapshot.toSeq.toDF("group_name")
    AlignmentsPipeline.deletePhase(existing, "align-store")
    assert(store.snapshot.isEmpty, "hard delete left groups behind")

    // 2. create the new groups from the file
    AlignmentsPipeline.load(
      r.groups.select(col("group_name")), "align-store",
      mutation = "createHierarchyGroups")

    // 3. fetch back + compare counts (ref 33-42): strict passes
    val fetched = store.snapshot.toSeq.toDF("group_name")
    val report = AlignmentsPipeline.resyncCheck(fetched, r.groups).head()
    assert(report.getAs[Boolean]("ok") && report.getAs[Long]("loaded_n") == 5L)
    // and the round-tripped NAMES are the file's, not just the count
    assert(store.snapshot ==
      r.groups.select(col("group_name")).as[String].collect().toSet)

    // a short load must raise in strict mode, like the reference
    intercept[IllegalStateException] {
      AlignmentsPipeline.resyncCheck(fetched.limit(3), r.groups)
    }
  }
}

/** JVM-static mutation store: the sink's writer tasks deserialize
  * their sender even in local mode, so shared state must live behind
  * a static reference (same pattern as GraphQLSpecFixtures).
  */
object AlignmentsSpecFixtures {

  final class Store {
    private val set =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def clear(): Unit = set.clear()
    def addAll(xs: Seq[String]): Unit = xs.foreach(set.add)
    def snapshot: Set[String] = {
      import scala.jdk.CollectionConverters._
      set.asScala.toSet
    }
    def apply(mutation: String): Unit = {
      val names = "\"group_name\": \"([^\"]*)\"".r
        .findAllMatchIn(mutation).map(_.group(1)).toSeq
      if (mutation.startsWith("mutation { droppingExistingHierarchyGroups"))
        names.foreach(set.remove)
      else names.foreach(set.add)
    }
  }

  val store = new Store

  case object StoreSender extends MutationSender {
    override def send(mutation: String): Unit = store.apply(mutation)
  }
}
