package graft.io

import org.apache.hadoop.conf.Configuration

/** Ship a Hadoop Configuration to executors (it is not
  * java-serializable itself — it IS writable): the standard broadcast
  * wrapper every executor-side FileSystem access needs, e.g.
  * [[graft.operators.MaintainedComponents]]'s per-partition bloom
  * sidecar writers. Spark has an internal equivalent
  * (`org.apache.spark.util.SerializableConfiguration`), but it is
  * `private[spark]` at the Scala level — this is the same three-line
  * idiom on the public Writable API.
  */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
