package graft

import com.esotericsoftware.kryo.Kryo
import org.apache.spark.serializer.KryoRegistrator

/** Kryo registrations for the RDD-path classes the engine actually
  * serializes (ref: util/FlashMLKryoRegistrator.scala, wired in
  * FlashML.scala:62-63). DataFrame ops stay in Tungsten's own format; this
  * covers the deliberate RDD uses (exact stratified sampling) and the typed
  * streaming/multimodal datasets when they spill. */
class GraftKryoRegistrator extends KryoRegistrator {
  override def registerClasses(kryo: Kryo): Unit = {
    kryo.register(classOf[streaming.Event])
    kryo.register(classOf[streaming.SessionState])
    kryo.register(classOf[streaming.SessionUpdate])
    kryo.register(classOf[multimodal.MediaFile])
    kryo.register(classOf[multimodal.MediaMeta])
    kryo.register(classOf[multimodal.MediaFeatures])
    kryo.register(classOf[multimodal.Frame])
    kryo.register(classOf[Array[Byte]])
    kryo.register(classOf[Array[Float]])
    kryo.register(classOf[Array[Double]])
    kryo.register(classOf[Array[String]])
  }
}
