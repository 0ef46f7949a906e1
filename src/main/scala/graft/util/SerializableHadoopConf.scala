package graft.util

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop [[Configuration]] (which is
  * `Writable` but not `Serializable`). Capture the driver's
  * `sparkContext.hadoopConfiguration` into one of these BEFORE a closure
  * ships, so executor-side `FileSystem` lookups see the session's
  * `spark.hadoop.*` settings (s3a credentials, endpoints, hdfs
  * nameservices) instead of bare classpath defaults.
  *
  * Same shape as Spark's own internal wrapper; re-implemented here because
  * that one is `private[spark]` at the Scala level.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
