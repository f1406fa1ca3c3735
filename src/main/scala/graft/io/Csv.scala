package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink with the reference's exact options, plus the
  * explicit-schema fast path this engine prefers.
  *
  * Reference source (ref `controller/script.py:22-27`): header=true,
  * inferSchema=true, sep=",". Inference costs a full extra scan of the
  * input — tolerable at 6.5k rows, not at 100 TB — so production paths
  * pass a declared [[StructType]] and skip it.
  *
  * Reference sink (ref `controller/script.py:52-65`): coalesce(1),
  * mode=overwrite, header=true — single part file by contract (the
  * reference's controller errors on >1 part file,
  * ref `controller/app.py:479-480`). [[writeSingle]] preserves that;
  * [[write]] is the scale path (one file per partition, parallel).
  */
object Csv {

  /** Parity reader: schema inference, exactly the reference's options. */
  def readInferred(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    spark.read.format("csv")
      .option("header", true).option("inferSchema", true).option("sep", sep)
      .load(path)

  /** Fast path: declared schema, no inference scan. */
  def read(spark: SparkSession, path: String, schema: StructType,
           sep: String = ","): DataFrame =
    spark.read.format("csv")
      .option("header", true).option("sep", sep)
      .schema(schema).load(path)

  /** Parity sink: exactly one part file (single-task write — small data
    * only, by design). */
  def writeSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", true).csv(path)

  /** Scale sink: parallel write, one file per partition. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", true).csv(path)
}
