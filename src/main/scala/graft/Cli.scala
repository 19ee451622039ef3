package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.{XenaMetadata, XenaTsv}
import graft.model.DTypes
import graft.ops.XenaOps
import graft.transform.{Clinical, GdcTransforms}

/** CLI surface mirroring the reference `xge` entry point
  * (`main.py:44-116`): `etl`, `merge-xena`, `metadata`, `xena-eql`.
  * Argument shapes follow the reference subcommands; execution is the
  * Spark engine. The GDC download step (network) is out of scope —
  * `etl` transforms an already-downloaded raw directory.
  */
object Cli {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def opts(args: List[String]): Map[String, List[String]] = {
    val (m, _) = args.foldLeft((Map.empty[String, List[String]], "")) {
      case ((acc, _), a) if a.startsWith("-") => (acc.updated(a, Nil), a)
      case ((acc, key), a) => (acc.updated(key, acc.getOrElse(key, Nil) :+ a), key)
    }
    m
  }

  private def one(m: Map[String, List[String]], keys: String*): String =
    keys.flatMap(k => m.getOrElse(k, Nil)).headOption.getOrElse(
      sys.error(s"missing required option ${keys.mkString("/")}"))

  /** Long-shape dtypes merge vertically; matrix dtypes horizontally
    * (reference `utils.py:92-112`). */
  private def isLongShape(dtype: String): Boolean =
    DTypes.registry.get(dtype).exists(c =>
      c.kind == DTypes.MatrixKind.GenomicSegment || c.kind == DTypes.MatrixKind.MutationVector)

  def run(args: Array[String]): Int = args.toList match {
    case "etl" :: rest =>
      val m = opts(rest)
      val dtype = one(m, "-t", "--datatype")
      val rawDir = one(m, "-r", "--root")
      val out = one(m, "-o", "--output")
      val cohort = m.get("-c").flatMap(_.headOption).getOrElse("GDC " + dtype)
      val spark = session()
      val matrix: DataFrame = dtype match {
        case "clinical" => Clinical.clinicalMatrix(spark, rawDir)
        case "survival" =>
          GdcTransforms.survivalMatrix(spark, s"$rawDir/survival.tsv", s"$rawDir/case_samples.json")
        case d => GdcTransforms.transform(spark, d, rawDir)
      }
      XenaTsv.write(matrix, out, rowKey = Some(matrix.columns.head))
      val vars0 = XenaMetadata.Vars(
        xenaCohort = cohort,
        date = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ofPattern("MM-dd-yyyy")))
      val vars = XenaMetadata.dtypeVariables.get(dtype).map(_(vars0)).getOrElse(vars0)
      XenaMetadata.write(out, DTypes.registry(dtype).metadataKind, vars)
      println(s"matrix + metadata written to $out")
      0

    case "merge-xena" :: rest =>
      val m = opts(rest)
      val files = m.getOrElse("-f", m.getOrElse("--files", Nil))
      val dtype = one(m, "-t", "--datatype")
      val out = one(m, "-o", "--output")
      require(files.nonEmpty, "merge-xena needs -f <files...>")
      val spark = session()
      val dfs = files.map(f => XenaTsv.read(spark, f, None))
      val merged =
        if (isLongShape(dtype)) XenaOps.mergeVertical(dfs)
        else XenaOps.mergeHorizontal(dfs, dfs.head.columns.head)
      XenaTsv.write(merged, out, rowKey = Some(merged.columns.head))
      println(s"merged ${files.size} matrices to $out")
      0

    case "metadata" :: rest =>
      val m = opts(rest)
      val dtype = one(m, "-t", "--datatype")
      val matrix = one(m, "-p", "--path")
      val cohort = m.get("-c").flatMap(_.headOption).getOrElse("GDC " + dtype)
      val vars0 = XenaMetadata.Vars(
        xenaCohort = cohort,
        date = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ofPattern("MM-dd-yyyy")))
      val vars = XenaMetadata.dtypeVariables.get(dtype).map(_(vars0)).getOrElse(vars0)
      val out = XenaMetadata.write(matrix, DTypes.registry(dtype).metadataKind, vars)
      println(s"metadata written to $out")
      0

    case "xena-eql" :: a :: b :: Nil =>
      val spark = session()
      val equal = XenaOps.canonicalEqual(
        XenaTsv.read(spark, a, None), XenaTsv.read(spark, b, None))
      println(if (equal) "Equal matrices." else "Matrices differ.")
      if (equal) 0 else 1

    case other =>
      System.err.println(
        s"""usage: graft.Cli <subcommand> [options]
           |  etl        -t <dtype> -r <raw-dir> -o <out-matrix> [-c <cohort>]
           |  merge-xena -f <files...> -t <dtype> -o <out-matrix>
           |  metadata   -t <dtype> -p <matrix-path> [-c <cohort>]
           |  xena-eql   <matrix-a> <matrix-b>
           |got: ${other.mkString(" ")}""".stripMargin)
      2
  }

  def main(args: Array[String]): Unit = sys.exit(run(args))
}
