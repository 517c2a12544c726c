package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Session extension point — the Spark-native analogue of the reference's
  * `tEnv.createTemporaryFunction` registrations (sql-functions README).
  * Function injections are added as operators land. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registry.foreach(ext.injectFunction)
  }
}
