package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Serialization operators (SURVEY.md §2.3).
  *
  * Z1/Z2 — Avro encode/decode of the email record. The reference declares
  * the schema in code on both sides (no registry) and serializes with
  * `avsc` (`Producer/kafkaProducer.js:58-69`, `Consumer/kafkaConsumer.js:
  * 38-45,61`). The spark-avro connector isn't on this classpath, so the
  * codec is built directly on avro-core (same jar family Spark itself
  * ships) as deterministic UDFs — binary encoding of a record this simple
  * is byte-identical to avsc's.
  *
  * Z2's error path is faithful: a corrupt buffer decodes to null and the
  * caller filters it out (drop-with-log, `kafkaConsumer.js:67-69`) rather
  * than failing the batch.
  *
  * Z3 — quoted-printable decode (`kafkaProducer.js:3,127-128`): =XX hex
  * bytes, =\n / =\r\n soft line breaks, then UTF-8.
  */
object Serde {
  /** Schema from `Producer/kafkaProducer.js:58-65` (the reference omits
    * the record name; Avro requires one — documented deviation). */
  val EmailSchemaJson: String =
    """{"type":"record","name":"email","fields":[
      |{"name":"seqno","type":"int"},
      |{"name":"subject","type":"string"},
      |{"name":"body","type":"string"}]}""".stripMargin

  case class EmailRecord(seqno: Int, subject: String, body: String)

  // Schema is not serializable — parse lazily per executor.
  @transient private lazy val schema: Schema = new Schema.Parser().parse(EmailSchemaJson)

  def encodeEmail(seqno: Int, subject: String, body: String): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("seqno", seqno)
    rec.put("subject", subject)
    rec.put("body", body)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** null on corrupt input (drop semantics, Z2). */
  def decodeEmail(bytes: Array[Byte]): EmailRecord = {
    if (bytes == null) return null
    try {
      val dec = DecoderFactory.get().binaryDecoder(bytes, null)
      val rec = new GenericDatumReader[GenericRecord](schema).read(null, dec)
      EmailRecord(
        rec.get("seqno").asInstanceOf[Int],
        rec.get("subject").toString,
        rec.get("body").toString)
    } catch { case _: Exception => null }
  }

  val encodeEmailUdf: UserDefinedFunction = udf(encodeEmail _)
  val decodeEmailUdf: UserDefinedFunction = udf(decodeEmail _)

  def toAvroEmail(seqno: Column, subject: Column, body: Column): Column =
    encodeEmailUdf(seqno, subject, body)
  def fromAvroEmail(bytes: Column): Column = decodeEmailUdf(bytes)

  /** Z3 — quoted-printable decode to UTF-8 text. */
  def qpDecode(s: String): String = {
    if (s == null) return null
    val out = new ByteArrayOutputStream(s.length)
    var i = 0
    def hex(c: Char): Int = Character.digit(c, 16)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2            // soft break LF
      else if (c == '=' && i + 2 < s.length && s.charAt(i + 1) == '\r' && s.charAt(i + 2) == '\n') i += 3 // soft break CRLF
      else if (c == '=' && i + 2 < s.length && hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        out.write((hex(s.charAt(i + 1)) << 4) | hex(s.charAt(i + 2))); i += 3
      } else if (c < 0x80) { out.write(c.toInt); i += 1 }
      else {
        // passthrough of a non-ASCII char (technically invalid QP, but
        // never corrupt it): emit its UTF-8 bytes, not a truncated low
        // byte that would decode as U+FFFD / a wrong character
        val cp = Character.codePointAt(s, i)
        out.write(new String(Character.toChars(cp)).getBytes(StandardCharsets.UTF_8))
        i += Character.charCount(cp)
      }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  val qpDecodeUdf: UserDefinedFunction = udf(qpDecode _)
  def quotedPrintableDecode(c: Column): Column = qpDecodeUdf(c)
}
