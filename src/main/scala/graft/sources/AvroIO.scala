package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Avro object-container files through the stock `avro-mapred` formats —
  * the row-oriented, schema-evolving interchange format every ingestion
  * bus speaks. No Spark connector is involved: records go through
  * `AvroKeyOutputFormat`/`AvroKeyInputFormat` exactly as a MapReduce job
  * would write them, so the files are byte-level interchangeable with any
  * Avro tooling (the same stock-library interop contract as
  * [[SequenceFileIO]]/[[TFileIO]]/[[HarIO]]).
  *
  * Container files carry their writer schema in the header and sync
  * markers between blocks — self-describing AND splittable, which is what
  * made Avro the de-facto landing format before columnar compaction; the
  * scale-shaped pipeline is avro-in (this reader) → parquet-out
  * ([[graft.catalog.IoCatalog]]'s compaction queries).
  *
  * Schema objects are NOT serializable, so only the schema JSON string
  * crosses the closure boundary and each partition re-parses it — the
  * standard Avro-on-Spark idiom.
  */
object AvroIO {

  /** (long, string, long) rows — enough structure to prove real field
    * access on both sides of the format boundary.
    */
  val SchemaJson: String =
    """{"type": "record", "name": "GraftDoc", "fields": [
      |  {"name": "id", "type": "long"},
      |  {"name": "source", "type": "string"},
      |  {"name": "n_chars", "type": "long"}
      |]}""".stripMargin

  /** Write the first three columns (long, string, long) as an Avro
    * container-file directory.
    */
  def write(df: DataFrame, path: String): Unit = {
    val sc = df.sparkSession.sparkContext
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(sc.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val job = Job.getInstance(sc.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(SchemaJson))
    val schemaJson = SchemaJson
    df.rdd
      .mapPartitions { rows =>
        val schema = new Schema.Parser().parse(schemaJson)
        rows.map { r: Row =>
          val rec: GenericRecord = new GenericData.Record(schema)
          rec.put("id", r.getLong(0))
          rec.put("source", r.getString(1))
          rec.put("n_chars", r.getLong(2))
          (new AvroKey[GenericRecord](rec), NullWritable.get())
        }
      }
      .saveAsNewAPIHadoopFile(path,
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Read a container-file directory back to (id, source, n_chars). The
    * record's writer schema rides in each file header — the reader needs
    * no schema configuration at all (Avro's self-describing contract).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .newAPIHadoopFile(path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable])
      .map { case (k, _) =>
        val r = k.datum()
        (r.get("id").asInstanceOf[Long],
          r.get("source").toString,
          r.get("n_chars").asInstanceOf[Long])
      }
      .toDF("id", "source", "n_chars")
  }
}
