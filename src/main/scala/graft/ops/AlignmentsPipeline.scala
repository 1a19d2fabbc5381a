package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's COMPLETE weekly-alignments synchronization
  * (`weekly alignments GQL API.py`, all eight phases) composed from
  * the library's operators — this is the "switch from the reference"
  * entry point: extract the API tables (GraphQL DSv2 source), clean
  * the alignments file, build the hierarchy, reconcile file↔API with
  * the dynamic fallback key, derive assignments, stack the manager
  * permission frame, fan corporate users across the top hierarchies
  * (minus already-assigned pairs), produce validation counts, and
  * load/delete mutations (GraphQL DSv2 sink).
  *
  * Every phase is a declarative DataFrame transform, so the whole
  * pipeline is ONE Catalyst plan per output: cleaning is a
  * projection over the scan; the hierarchy is two distinct
  * aggregations; reconciliation is a single full-outer join; the
  * equity and corporate fan-outs are broadcast cross joins against
  * tiny frames (distinct regions / top groups). Nothing materializes
  * on the driver (the pandas original holds every frame in RAM).
  *
  * Column contract (mirroring the reference's cleaned sheet,
  * ref 249-353): `file(region, district, unit, location_name,
  * manager_email)`, `apiLocations(remote_id, loc_name)`,
  * `equityUsers(equity_email)`, `corporateUsers(corporate_email)`
  * (ref 935: the corporate-managers CSV column), `apiUsers
  * (user_email)` (ref 67-69: the users query).
  */
object AlignmentsPipeline {

  final case class Result(
      groups: DataFrame,        // (group_name, level_name, parent_name)
      locationMerge: DataFrame, // reconciled file↔API with merge_status
      assignments: DataFrame,   // district → sorted matched locations
      managerStack: DataFrame,  // (group_name, email, level_name)
      corporate: DataFrame,     // corporate fan-out minus already-assigned
      validation: DataFrame)    // phase → count report

  def run(
      file: DataFrame,
      apiLocations: DataFrame,
      equityUsers: DataFrame,
      corporateUsers: DataFrame,
      apiUsers: DataFrame): Result = {

    // 1. Clean (ref 249-273, 325-353, 602-666): dropna on the key
    //    columns, float unit → int → string (astype(int).astype(str)),
    //    e-mail normalization.
    val cleaned = file
      .na.drop(Seq("region", "district", "unit"))
      .select(
        col("region"), col("district"),
        Normalize.floorLong(col("unit")).cast("string").as("unit"),
        col("location_name"),
        Normalize.normEmail(col("manager_email")).as("email"))

    // 2. Hierarchy build (ref 276-322): Region tops + (Region,
    //    District) pairs, identity by name (no file-order dependence).
    val groups = Hierarchy.buildGroups(
      cleaned, "region", "district", "Region", "District")

    // 3. Reconcile locations file↔API (ref 371-574) with the
    //    reference's dynamic key (ref 390-415): unit = remoteId while
    //    any API remoteId escapes `(remoteId == "").all()`, else the
    //    normalized-name fallback. One full-outer join either way.
    val locationMerge = Reconcile.mergeIndicatorWithFallback(
      cleaned.select(col("unit"), col("location_name"), col("district")).distinct(),
      apiLocations.select(col("remote_id"), col("loc_name")),
      col("remote_id"),
      col("unit") === col("remote_id"),
      Normalize.normEmail(col("location_name")) === Normalize.normEmail(col("loc_name")))

    // 4. Assignments (ref 563-574): district → sorted distinct
    //    matched locations.
    val assignments = Collect.groupCollect(
      locationMerge.filter(col(Reconcile.IndicatorCol) === "both"),
      col("district"), col("location_name"))

    // 5. Stack (ref 773-801) + equity fan-out (ref 877-886): region-
    //    and district-level manager rows, plus every equity user ×
    //    every region (broadcast cross join — the regions frame is a
    //    handful of rows at any corpus size).
    val regionFrame = cleaned.select(
      col("region").as("group_name"), col("email"),
      lit("Region").as("level_name"))
    val districtFrame = cleaned.select(
      col("district").as("group_name"), col("email"),
      lit("District").as("level_name"))
    val equityFrame = equityUsers
      .crossJoin(broadcast(cleaned.select(col("region")).distinct()))
      .select(
        col("region").as("group_name"),
        Normalize.normEmail(col("equity_email")).as("email"),
        lit("Region").as("level_name"))
    val managerStack = Collect.stackDistinct(
      Collect.stackDistinct(regionFrame, districtFrame), equityFrame)

    // 6. Corporate users (ref 915-967): API users whose lowercased
    //    e-mail appears in the corporate list, fanned across every
    //    TOP hierarchy group, minus (user, group) pairs the normal
    //    stack already assigned. The corporate list and the top
    //    groups are control-plane-sized → both sides of the fan-out
    //    broadcast; the anti join is the only shuffle.
    val corporate = corporateAssignments(
      corporateUsers, apiUsers,
      groups.filter(col("level_name") === "Region").select(col("group_name")),
      managerStack)

    // 7. Validation counts (ref 38-42, 422-436): loaded-vs-expected
    //    report from the same indicator frame — no extra scans.
    val validation = locationMerge
      .groupBy(col(Reconcile.IndicatorCol).as("phase"))
      .agg(count(lit(1)).as("n"))

    Result(groups, locationMerge, assignments, managerStack, corporate, validation)
  }

  /** Corporate fan-out (ref 915-967): `apiUsers` members of the
    * corporate e-mail list × `topGroups`, minus pairs already present
    * in `alreadyAssigned` (the reference's `users_already_assigned`
    * filter). E-mails compare lowercased on both sides (ref 936-946).
    */
  def corporateAssignments(
      corporateUsers: DataFrame,
      apiUsers: DataFrame,
      topGroups: DataFrame,
      alreadyAssigned: DataFrame): DataFrame = {
    val corpEmails = corporateUsers
      .select(Normalize.normEmail(col("corporate_email")).as("__cem"))
      .distinct()
    val corpApiUsers = apiUsers
      .select(lower(col("user_email")).as("email"))
      .distinct()
      .join(broadcast(corpEmails), col("email") === col("__cem"), "left_semi")
    val fanned = corpApiUsers
      .crossJoin(broadcast(topGroups))
      .select(col("group_name"), col("email"), lit("Region").as("level_name"))
    fanned.join(
      alreadyAssigned.select(col("group_name"), col("email")),
      Seq("group_name", "email"), "left_anti")
  }

  /** 7b. Side-output report files — the reference's "Outs (results of
    * the script)" orphan CSVs, one artifact per reconciliation
    * mismatch class:
    *
    *  - `new_locations_found_in_the_file_and_not_in_API` (ref 430):
    *    location rows only in the alignments file (`left_only`).
    *  - `api_locations_not_found_in_the_file` (ref 520): location
    *    rows only in the API (`right_only` — deprecated records).
    *  - `districts_not_found_in_file_present_on_API` (ref 557): API
    *    districts the new file no longer mentions.
    *  - `new_users_found_in_file_that_does_not_have_match_on_API` and
    *    `users_on_API_with_no_match_on_file` (ref 823-836): the two
    *    sides of the user e-mail reconcile.
    *
    * Each report is header'd CSV under `outDir/<name>`. Orphan
    * reports are mismatch tails — control-plane-sized at any corpus
    * scale — so `coalesce(1)` for a single-file artifact is safe and
    * mirrors the reference's one-CSV-per-report layout; the frames
    * stay lazy until the write. Returns report name → path.
    */
  def writeReports(
      result: Result,
      apiDistricts: DataFrame, // (api_district) — the API's district groups
      fileUsers: DataFrame,    // (email) — cleaned file manager e-mails
      apiUsers: DataFrame,     // (user_email)
      outDir: String): Map[String, String] = {
    val fileOnlyLocs = result.locationMerge
      .filter(col(Reconcile.IndicatorCol) === "left_only")
      .drop(Reconcile.IndicatorCol)
    val apiOnlyLocs = result.locationMerge
      .filter(col(Reconcile.IndicatorCol) === "right_only")
      .drop(Reconcile.IndicatorCol)
    val fileDistricts = result.locationMerge
      .select(col("district")).na.drop().distinct()
    val apiOnlyDistricts = apiDistricts.join(
      fileDistricts, col("api_district") === col("district"), "left_anti")
    val fileU = fileUsers.select(Normalize.normEmail(col("email")).as("email")).distinct()
    val apiU = apiUsers.select(lower(col("user_email")).as("user_email")).distinct()
    val fileOnlyUsers = fileU.join(apiU, col("email") === col("user_email"), "left_anti")
    val apiOnlyUsers = apiU.join(fileU, col("user_email") === col("email"), "left_anti")
    val reports = Seq(
      "new_locations_found_in_the_file_and_not_in_API" -> fileOnlyLocs,
      "api_locations_not_found_in_the_file" -> apiOnlyLocs,
      "districts_not_found_in_file_present_on_API" -> apiOnlyDistricts,
      "new_users_found_in_file_that_does_not_have_match_on_API" -> fileOnlyUsers,
      "users_on_API_with_no_match_on_file" -> apiOnlyUsers)
    reports.map { case (name, df) =>
      val path = s"$outDir/$name"
      df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
      name -> path
    }.toMap
  }

  /** 8a. Delete phase (ref 19-42, 224-246): hard-delete the existing
    * hierarchy groups by id through the sink before reloading — the
    * reference's `delete_existing_hierarchy_groups`, batched exactly
    * like the create mutations.
    */
  def deletePhase(
      existingGroupIds: DataFrame,
      senderName: String,
      mutation: String = "droppingExistingHierarchyGroups",
      batchSize: Int = 256): Unit =
    existingGroupIds.write
      .format("graft.sources.graphql.GraphQLSinkProvider")
      .option("sender", senderName)
      .option("mutation", mutation)
      .option("batchSize", batchSize.toString)
      .mode("append")
      .save()

  /** 8b. Load (ref create/assign mutations): write the stacked
    * permission rows as batched GraphQL list mutations through the
    * DSv2 sink (at-least-once, executor-parallel).
    */
  def load(
      managerStack: DataFrame,
      senderName: String,
      mutation: String = "assignPermissions",
      batchSize: Int = 64): Unit =
    managerStack.write
      .format("graft.sources.graphql.GraphQLSinkProvider")
      .option("sender", senderName)
      .option("mutation", mutation)
      .option("batchSize", batchSize.toString)
      .mode("append")
      .save()

  /** 8c. Resync validation (ref 38-42): the just-loaded group count
    * must equal what the file asked for; `strict` raises on mismatch
    * exactly like the reference's `raise Exception`.
    */
  def resyncCheck(
      justLoaded: DataFrame,
      expected: DataFrame,
      strict: Boolean = true): DataFrame =
    Reconcile.loadedCountCheck(justLoaded, expected, strict)
}
