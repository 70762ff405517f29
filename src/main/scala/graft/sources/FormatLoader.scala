package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic table loader — the reference's extension-dispatch idiom
  * (`LR_Model_train/LR_Advanced.py:384`, `Other_Models/Catboost_1.py:58-62`:
  * read_csv-or-read_excel by suffix) generalized to Spark's source API.
  *
  * xlsx is out of scope (no such reader offline); csv gets the headerless
  * imposed-schema treatment the reference applies to the raw log
  * (`Preprocess/dataset_for_prediction.py:11-16`).
  */
object FormatLoader {

  def load(spark: SparkSession, path: String, schema: Option[StructType] = None,
           header: Boolean = true): DataFrame = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    ext match {
      case "parquet" => spark.read.parquet(path)
      case "json" => schema.fold(spark.read.json(path))(s => spark.read.schema(s).json(path))
      case "csv" =>
        val r = spark.read.option("header", header.toString)
        schema.fold(r.option("inferSchema", "true").csv(path))(s => r.schema(s).csv(path))
      case "orc" => spark.read.orc(path)
      case other => throw new IllegalArgumentException(s"unsupported format: .$other ($path)")
    }
  }
}
