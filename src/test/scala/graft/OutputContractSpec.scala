package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The driver's oracle comparator loads every query output into a tabular
  * frame and sorts by every column — nested types (array/map/struct)
  * crash that sort (round 1 lost 4 queries to exactly this). This spec
  * pins the contract: every registry query's OUTPUT schema is flat
  * scalars. Nested values must be serialized (array_join / to_json) or
  * decomposed before they leave a query. */
class OutputContractSpec extends SparkSuite {

  test("every registry query emits flat scalar columns only") {
    val d = sf("sf0.001")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, d).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
                    f.dataType.isInstanceOf[MapType] ||
                    f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"nested-typed output columns crash the driver comparator: $offenders")
  }

  test("every oracle-checked query has a deterministic column set") {
    val d = sf("sf0.001")
    SparkEntry.oracleSql.keys.foreach { name =>
      val cols = SparkEntry.queries(name)(spark, d).columns
      assert(cols.distinct.length == cols.length,
        s"$name has duplicate output column names: ${cols.mkString(",")}")
    }
  }
}
