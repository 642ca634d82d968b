package graft.core

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Mapbox Vector Tile (vector_tile.proto v2.1) container assembly —
  * layers / features / key-value dedup maps — with a hand-rolled protobuf
  * wire writer (varint + length-delimited only; the whole schema needs
  * nothing else). Semantics from /root/reference/encoding/mvt/
  * {layer,tile}.go and feature.go:360-702 (keyvalMapsFromFeatures:
  * keys/values deduped ACROSS features within a layer, tag indices refer
  * into those maps).
  */
object MvtTile {

  final case class Feature(id: Long, geomType: Int, geometry: IndexedSeq[Long],
                           properties: IndexedSeq[(String, String)] = Vector.empty)
  final case class Layer(name: String, features: IndexedSeq[Feature],
                         extent: Int = 4096, version: Int = 2)

  // ---- protobuf wire primitives ----

  private final class Writer {
    val buf = new ArrayBuffer[Byte](256)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) {
        buf += ((v & 0x7F) | 0x80).toByte
        v >>>= 7
      }
      buf += (v & 0x7F).toByte
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length); buf ++= b
    }
    def stringField(field: Int, s: String): Unit =
      bytesField(field, s.getBytes("UTF-8"))
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def packedField(field: Int, vs: IndexedSeq[Long]): Unit = {
      if (vs.isEmpty) return
      val inner = new Writer
      vs.foreach(inner.varint)
      bytesField(field, inner.result())
    }
    def result(): Array[Byte] = buf.toArray
  }

  /** Value message holding a string (field 1). */
  private def encodeValue(s: String): Array[Byte] = {
    val w = new Writer
    w.stringField(1, s)
    w.result()
  }

  private def encodeFeature(f: Feature, tags: IndexedSeq[Long]): Array[Byte] = {
    val w = new Writer
    if (f.id != 0) w.varintField(1, f.id)
    w.packedField(2, tags)
    w.varintField(3, f.geomType.toLong)
    w.packedField(4, f.geometry)
    w.result()
  }

  /** layer encode with cross-feature key/value dedup
    * (reference feature.go keyvalMapsFromFeatures + tags).
    */
  def encodeLayer(layer: Layer): Array[Byte] = {
    val keyIdx = mutable.LinkedHashMap[String, Int]()
    val valIdx = mutable.LinkedHashMap[String, Int]()
    val featureTags = layer.features.map { f =>
      f.properties.flatMap { case (k, v) =>
        val ki = keyIdx.getOrElseUpdate(k, keyIdx.size)
        val vi = valIdx.getOrElseUpdate(v, valIdx.size)
        Seq(ki.toLong, vi.toLong)
      }
    }
    val w = new Writer
    w.varintField(15, layer.version.toLong)
    w.stringField(1, layer.name)
    layer.features.zip(featureTags).foreach { case (f, tags) =>
      w.bytesField(2, encodeFeature(f, tags))
    }
    keyIdx.keys.foreach(k => w.stringField(3, k))
    valIdx.keys.foreach(v => w.bytesField(4, encodeValue(v)))
    w.varintField(5, layer.extent.toLong)
    w.result()
  }

  /** Tile: repeated Layer layers = 3. */
  def encodeTile(layers: IndexedSeq[Layer]): Array[Byte] = {
    val w = new Writer
    layers.foreach(l => w.bytesField(3, encodeLayer(l)))
    w.result()
  }

  /** Single-pass layer encode: features are consumed from an ITERATOR and
    * each is serialized immediately, so a pathological hot tile (dense
    * urban cell at low zoom) holds only the growing OUTPUT bytes and the
    * key/value dedup maps in memory — never the decoded feature list.
    * Byte-identical to `encodeLayer` (same field order, same incremental
    * key/value map construction).
    */
  def encodeLayerStream(name: String, features: Iterator[Feature],
                        extent: Int = 4096, version: Int = 2): Array[Byte] = {
    val keyIdx = mutable.LinkedHashMap[String, Int]()
    val valIdx = mutable.LinkedHashMap[String, Int]()
    val w = new Writer
    w.varintField(15, version.toLong)
    w.stringField(1, name)
    features.foreach { f =>
      val tags = f.properties.flatMap { case (k, v) =>
        val ki = keyIdx.getOrElseUpdate(k, keyIdx.size)
        val vi = valIdx.getOrElseUpdate(v, valIdx.size)
        Seq(ki.toLong, vi.toLong)
      }
      w.bytesField(2, encodeFeature(f, tags))
    }
    keyIdx.keys.foreach(k => w.stringField(3, k))
    valIdx.keys.foreach(v => w.bytesField(4, encodeValue(v)))
    w.varintField(5, extent.toLong)
    w.result()
  }

  /** Tile assembly from pre-encoded layer bytes (streaming path). */
  def encodeTileFromLayerBytes(layerBytes: IndexedSeq[Array[Byte]]): Array[Byte] = {
    val w = new Writer
    layerBytes.foreach(b => w.bytesField(3, b))
    w.result()
  }

  // ---- decode (reference encoding/mvt/decode.go:29-84) ----

  private final class Reader(bytes: Array[Byte], var i: Int, val end: Int) {
    def hasNext: Boolean = i < end
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        b = bytes(i) & 0xFF; i += 1
        v |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def lengthDelim(): (Int, Int) = { // (start, end)
      val len = varint().toInt
      val s = i
      i += len
      (s, i)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 2 => lengthDelim()
      case 5 => i += 4
      case 1 => i += 8
      case w => sys.error(s"unsupported wire type $w")
    }
  }

  /** Full tile decode — inverse of encodeTile for the schema subset this
    * engine writes (string Values; reference decode.go ignores tile-level
    * tags too). Feature tags are resolved back into (key, value) pairs.
    */
  def decodeTile(bytes: Array[Byte]): IndexedSeq[Layer] = {
    val layers = Vector.newBuilder[Layer]
    val r = new Reader(bytes, 0, bytes.length)
    while (r.hasNext) {
      val t = r.varint()
      if ((t >> 3).toInt == 3 && (t & 7) == 2) {
        val (s, e) = r.lengthDelim()
        layers += decodeLayer(bytes, s, e)
      } else r.skip((t & 7).toInt)
    }
    layers.result()
  }

  private def decodeLayer(bytes: Array[Byte], start: Int, end: Int): Layer = {
    var name = ""
    var extent = 4096
    var version = 2
    val keys = ArrayBuffer[String]()
    val values = ArrayBuffer[String]()
    val rawFeatures = ArrayBuffer[(Long, Int, IndexedSeq[Long], IndexedSeq[Int])]()
    val r = new Reader(bytes, start, end)
    while (r.hasNext) {
      val t = r.varint()
      val field = (t >> 3).toInt
      val wire = (t & 7).toInt
      (field, wire) match {
        case (1, 2)  => val (s, e) = r.lengthDelim(); name = new String(bytes, s, e - s, "UTF-8")
        case (2, 2)  => val (s, e) = r.lengthDelim(); rawFeatures += decodeFeature(bytes, s, e)
        case (3, 2)  => val (s, e) = r.lengthDelim(); keys += new String(bytes, s, e - s, "UTF-8")
        case (4, 2)  => val (s, e) = r.lengthDelim(); values += decodeValue(bytes, s, e)
        case (5, 0)  => extent = r.varint().toInt
        case (15, 0) => version = r.varint().toInt
        case _       => r.skip(wire)
      }
    }
    val features = rawFeatures.map { case (id, gtype, geometry, tags) =>
      val props = tags.grouped(2).collect {
        case IndexedSeq(ki, vi) if ki < keys.length && vi < values.length =>
          (keys(ki), values(vi))
      }.toIndexedSeq
      Feature(id, gtype, geometry, props)
    }
    Layer(name, features.toIndexedSeq, extent, version)
  }

  private def decodeFeature(bytes: Array[Byte], start: Int, end: Int)
      : (Long, Int, IndexedSeq[Long], IndexedSeq[Int]) = {
    var id = 0L
    var gtype = 0
    var geometry: IndexedSeq[Long] = Vector.empty
    var tags: IndexedSeq[Int] = Vector.empty
    val r = new Reader(bytes, start, end)
    while (r.hasNext) {
      val t = r.varint()
      val field = (t >> 3).toInt
      val wire = (t & 7).toInt
      (field, wire) match {
        case (1, 0) => id = r.varint()
        case (2, 2) => // packed tags
          val (s, e) = r.lengthDelim()
          val pr = new Reader(bytes, s, e)
          val b = Vector.newBuilder[Int]
          while (pr.hasNext) b += pr.varint().toInt
          tags = b.result()
        case (3, 0) => gtype = r.varint().toInt
        case (4, 2) => // packed geometry
          val (s, e) = r.lengthDelim()
          val pr = new Reader(bytes, s, e)
          val b = Vector.newBuilder[Long]
          while (pr.hasNext) b += pr.varint()
          geometry = b.result()
        case _ => r.skip(wire)
      }
    }
    (id, gtype, geometry, tags)
  }

  /** Value message: this engine writes string values only (field 1);
    * other Value variants are rendered via toString for robustness.
    */
  private def decodeValue(bytes: Array[Byte], start: Int, end: Int): String = {
    val r = new Reader(bytes, start, end)
    var out = ""
    while (r.hasNext) {
      val t = r.varint()
      val field = (t >> 3).toInt
      val wire = (t & 7).toInt
      (field, wire) match {
        case (1, 2) => val (s, e) = r.lengthDelim(); out = new String(bytes, s, e - s, "UTF-8")
        case (4, 0) | (5, 0) | (6, 0) => out = r.varint().toString
        case (7, 0) => out = (r.varint() != 0).toString
        case _      => r.skip(wire)
      }
    }
    out
  }

  // ---- minimal decode (round-trip testing only) ----

  def decodeTileLayerNames(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      var b = 0
      do {
        b = bytes(i) & 0xFF; i += 1
        v |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    while (i < bytes.length) {
      val t = varint()
      val field = (t >> 3).toInt
      val wire = (t & 7).toInt
      if (field == 3 && wire == 2) {
        val len = varint().toInt
        val layerBytes = bytes.slice(i, i + len)
        i += len
        // scan the layer for its name (field 1)
        var j = 0
        def lvarint(): Long = {
          var shift = 0; var v = 0L; var b = 0
          do { b = layerBytes(j) & 0xFF; j += 1; v |= (b & 0x7FL) << shift; shift += 7 }
          while ((b & 0x80) != 0)
          v
        }
        var found = false
        while (j < layerBytes.length && !found) {
          val lt = lvarint()
          val lf = (lt >> 3).toInt; val lw = (lt & 7).toInt
          if (lf == 1 && lw == 2) {
            val l = lvarint().toInt
            out += new String(layerBytes.slice(j, j + l), "UTF-8")
            found = true
          } else if (lw == 0) lvarint()
          else if (lw == 2) { val l = lvarint().toInt; j += l }
        }
      } else if (wire == 0) varint()
      else if (wire == 2) { val len = varint().toInt; i += len }
    }
    out.result()
  }
}
