package graft.transform

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The nested-JSON clinical pipeline (SURVEY §3 E3, the reference's
  * hardest dataflow): GDC cases JSON → flat per-sample clinicalMatrix.
  *
  * Re-expresses `gdc.get_samples_clinical` (`gdc.py:462-612`) +
  * `GDCPhenoset.transform` (`xena_dataset.py:1378-1415`):
  *  - explode chains over `annotations`, `diagnoses`,
  *    `diagnoses.pathology_details`, `diagnoses.treatments` (V4/S5)
  *  - per-column collect-list with canonical rendering
  *    (`format_multiple_data`, `gdc.py:156-173`): values null-filled
  *    to '', collected, sorted, '; '-joined; singleton lists collapse
  *    to the scalar automatically; all-empty groups render ''
  *    (A1/A2/P18)
  *  - derived `age_at_earliest_diagnosis[_in_years]` = min over
  *    per-case ages with lenient parsing (P13: `try_cast`, unparseable
  *    ages ignored; a case with no parseable age gets null)
  *  - 4 successive left joins on case id (J1), then samples explode +
  *    inner join (J2) fanning case rows out to sample rows
  *  - drop of GDC bookkeeping fields (P4, `gdc.py:102-154`)
  *  - reverse-dotted column rename (P3, `xena_dataset.py:1397-1402`)
  *
  * Schema note: arrays are declared explicitly (ArrayType everywhere)
  * rather than inferred — the reference burns ~60 LoC renormalizing
  * scalar-vs-array instability (`utils.py:164-184`, `gdc.py:522-540`);
  * a declared permissive schema makes that a non-problem (SURVEY §7
  * risk 3).
  */
object Clinical {

  val casesSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("submitter_id", StringType),
    StructField("disease_type", StringType),
    StructField("state", StringType),
    StructField("created_datetime", StringType),
    StructField("project", StructType(Seq(
      StructField("project_id", StringType)))),
    StructField("demographic", StructType(Seq(
      StructField("gender", StringType),
      StructField("vital_status", StringType),
      StructField("year_of_birth", LongType)))),
    StructField("annotations", ArrayType(StructType(Seq(
      StructField("category", StringType),
      StructField("classification", StringType))))),
    StructField("diagnoses", ArrayType(StructType(Seq(
      StructField("age_at_diagnosis", StringType),
      StructField("tumor_grade", StringType),
      StructField("treatments", ArrayType(StructType(Seq(
        StructField("therapeutic_agents", StringType),
        StructField("treatment_type", StringType))))),
      StructField("pathology_details", ArrayType(StructType(Seq(
        StructField("lymph_nodes_tested", StringType))))))))),
    StructField("samples", ArrayType(StructType(Seq(
      StructField("submitter_id", StringType),
      StructField("sample_type", StringType),
      StructField("tissue_type", StringType)))))))

  /** GDC bookkeeping fields dropped from the final matrix
    * (`gdc.py:102-154` GDC_DROPPED_FIELDS — subset present in this
    * schema). */
  val droppedFields: Seq[String] = Seq("state", "created_datetime")

  /** `format_multiple_data`: canonical multi-value cell rendering. */
  private def formatMulti(c: Column): Column = {
    val vals = collect_list(coalesce(c.cast("string"), lit("")))
    val sorted = array_sort(vals)
    when(forall(sorted, v => v === ""), lit(""))
      .otherwise(array_join(sorted, "; "))
  }

  /** Reverse dotted column names: `a.b.c` -> `c.b.a` (P3). */
  def reverseDotted(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.split('.').reverse.mkString(".")): _*)

  def clinicalMatrix(spark: SparkSession, casesJson: String): DataFrame = {
    val cases = spark.read.schema(casesSchema).json(casesJson)

    val base = cases.select(
      col("id"),
      col("submitter_id"),
      col("disease_type"),
      col("state"),
      col("created_datetime"),
      col("project.project_id").as("project.project_id"),
      col("demographic.gender").as("demographic.gender"),
      col("demographic.vital_status").as("demographic.vital_status"),
      col("demographic.year_of_birth").as("demographic.year_of_birth"))

    val annotations = cases
      .select(col("id"), explode(col("annotations")).as("a"))
      .groupBy(col("id"))
      .agg(
        formatMulti(col("a.category")).as("annotations.category"),
        formatMulti(col("a.classification")).as("annotations.classification"))

    val diagRows = cases.select(col("id"), explode(col("diagnoses")).as("d"))

    val diagnoses = diagRows
      .groupBy(col("id"))
      .agg(
        formatMulti(col("d.age_at_diagnosis")).as("diagnoses.age_at_diagnosis"),
        formatMulti(col("d.tumor_grade")).as("diagnoses.tumor_grade"),
        min(expr("try_cast(d.age_at_diagnosis AS DOUBLE)"))
          .as("xena_derived.diagnoses.age_at_earliest_diagnosis"))
      .withColumn(
        "xena_derived.diagnoses.age_at_earliest_diagnosis_in_years",
        round(col("`xena_derived.diagnoses.age_at_earliest_diagnosis`") / 365.0, 6))
      .withColumn(
        "xena_derived.diagnoses.age_at_earliest_diagnosis",
        round(col("`xena_derived.diagnoses.age_at_earliest_diagnosis`"), 6))

    val pathology = diagRows
      .select(col("id"), explode(col("d.pathology_details")).as("p"))
      .groupBy(col("id"))
      .agg(formatMulti(col("p.lymph_nodes_tested"))
        .as("diagnoses.pathology_details.lymph_nodes_tested"))

    val treatments = diagRows
      .select(col("id"), explode(col("d.treatments")).as("t"))
      .groupBy(col("id"))
      .agg(
        formatMulti(col("t.therapeutic_agents")).as("diagnoses.treatments.therapeutic_agents"),
        formatMulti(col("t.treatment_type")).as("diagnoses.treatments.treatment_type"))

    val samples = cases
      .select(col("id"), explode(col("samples")).as("s"))
      .select(
        col("id"),
        col("s.submitter_id").as("samples.submitter_id"),
        col("s.sample_type").as("samples.sample_type"),
        col("s.tissue_type").as("samples.tissue_type"))

    // Per-project sub-frames are case-count sized — broadcast left
    // joins; the sample fan-out is the only row-multiplying join.
    val joined = base
      .join(broadcast(annotations), Seq("id"), "left")
      .join(broadcast(diagnoses), Seq("id"), "left")
      .join(broadcast(pathology), Seq("id"), "left")
      .join(broadcast(treatments), Seq("id"), "left")
      .join(samples, Seq("id"), "inner")

    val kept = joined.drop(droppedFields: _*)
    reverseDotted(kept)
      .withColumnRenamed("submitter_id.samples", "sample")
  }
}
