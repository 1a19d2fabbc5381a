package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's COMPLETE weekly-alignments synchronization
  * (`weekly alignments GQL API.py`, all eight phases) composed from
  * the library's operators — this is the "switch from the reference"
  * entry point: extract the API tables (GraphQL DSv2 source), clean
  * the alignments file, build the hierarchy, reconcile file↔API,
  * derive assignments, stack the manager permission frame, produce
  * validation counts, and load mutations (GraphQL DSv2 sink).
  *
  * Every phase is a declarative DataFrame transform, so the whole
  * pipeline is ONE Catalyst plan per output: cleaning is a
  * projection over the scan; the hierarchy is two distinct
  * aggregations; reconciliation is a single full-outer join; the
  * equity fan-out is a broadcast cross join against the (tiny)
  * distinct-regions frame. Nothing materializes on the driver
  * (the pandas original holds every frame in RAM).
  *
  * Column contract (mirroring the reference's cleaned sheet,
  * ref 249-353): `file(region, district, unit, location_name,
  * manager_email)`, `apiLocations(remote_id, loc_name)`,
  * `equityUsers(equity_email)`.
  */
object AlignmentsPipeline {

  final case class Result(
      groups: DataFrame,        // (group_name, level_name, parent_name)
      locationMerge: DataFrame, // reconciled file↔API with merge_status
      assignments: DataFrame,   // district → sorted matched locations
      managerStack: DataFrame,  // (group_name, email, level_name)
      validation: DataFrame)    // phase → count report

  def run(
      file: DataFrame,
      apiLocations: DataFrame,
      equityUsers: DataFrame): Result = {

    // 1. Clean (ref 249-273, 325-353, 602-666): dropna on the key
    //    columns, float-unit → long, name tail, e-mail normalization.
    val cleaned = file
      .na.drop(Seq("region", "district", "unit"))
      .select(
        col("region"), col("district"),
        Normalize.floorLong(col("unit")).as("unit"),
        Normalize.nameTail(col("location_name")).as("location_name"),
        Normalize.normEmail(col("manager_email")).as("email"))

    // 2. Hierarchy build (ref 276-322): Region tops + (Region,
    //    District) pairs, identity by name (no file-order dependence).
    val groups = Hierarchy.buildGroups(
      cleaned, "region", "district", "Region", "District")

    // 3. Reconcile locations file↔API by unit = remoteId
    //    (ref 371-574): one full-outer join with indicator.
    val locationMerge = Reconcile.mergeIndicator(
      cleaned.select(col("unit"), col("location_name"), col("district")).distinct(),
      apiLocations.select(col("remote_id"), col("loc_name")),
      col("unit") === col("remote_id"))

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

    // 6. Validation counts (ref 38-42, 422-436): loaded-vs-expected
    //    report from the same indicator frame — no extra scans.
    val validation = locationMerge
      .groupBy(col(Reconcile.IndicatorCol).as("phase"))
      .agg(count(lit(1)).as("n"))

    Result(groups, locationMerge, assignments, managerStack, validation)
  }

  /** 7. Load (ref create/assign mutations): write the stacked
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
}
