package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Coverage audit: given a file of reference function names (one per
  * line, extracted from apache/pinot `TransformFunctionType.java`,
  * `AggregationFunctionType.java` and the `@ScalarFunction` scalar
  * surface), print the names that resolve neither in the graft registry
  * nor in Spark's builtin FunctionRegistry. Run:
  *   java -cp classes:jars graft.tools.FnGapProbe names.txt
  */
object FnGapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.PinotFunctions.registerAll(spark)
    val names = scala.io.Source.fromFile(args(0)).getLines().filter(_.nonEmpty).toList
    val reg = spark.sessionState.functionRegistry
    val missing = names.filterNot(n => reg.functionExists(FunctionIdentifier(n)))
    println(s"TRULY_MISSING ${missing.size} of ${names.size}")
    missing.foreach(println)
    spark.stop()
  }
}
