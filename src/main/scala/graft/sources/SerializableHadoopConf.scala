package graft.sources

import org.apache.hadoop.conf.Configuration

/** Java-serializable carrier for the SESSION Hadoop configuration —
  * reader/writer factories ship one to executors so file access there
  * resolves the same filesystem the driver planned against.
  *
  * Readers and writers previously opened files with a bare
  * `new Configuration()`, which drops every `spark.hadoop.*` override
  * (s3a credentials, defaultFS, timeouts): planning listed files
  * under `sessionState.newHadoopConf()` on the driver, then executors
  * re-resolved paths under defaults — fine on local disk, wrong on
  * any configured store (the failure mode
  * [[graft.exchange.BatchExchange]]'s readManifest documents).
  * `Configuration` itself is `Writable` but not `Serializable`; this
  * wrapper write/reads it through Java serialization exactly the way
  * Spark's own (package-private) `SerializableConfiguration` does.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
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
