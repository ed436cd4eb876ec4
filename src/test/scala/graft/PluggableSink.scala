package graft

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister}
import org.apache.spark.sql.types.StructType

/** Test-scope external sink registered through the SAME mechanism as
  * the MongoDB connector: a `DataSourceRegister` short name discovered
  * by `ServiceLoader` (see `src/test/resources/META-INF/services/
  * org.apache.spark.sql.sources.DataSourceRegister`). Its existence
  * proves `Formats.write`'s format-string dispatch is a real plug
  * point — a provider NOT in `Formats.Supported` and NOT shipped with
  * Spark receives the frame — which is exactly the documented
  * `format("mongodb")` swap (reference mongodb.js:26-53) minus the
  * connector jar this image lacks. */
class PluggableSink extends CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "graftsink"

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    PluggableSink.received.set(
      (parameters.get("path"), data.count(), mode))
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }
}

object PluggableSink {
  /** (save path, row count, save mode) of the last write routed here. */
  val received =
    new java.util.concurrent.atomic.AtomicReference[(Option[String], Long, SaveMode)]
}
