package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-process UDF surface — the capability of "Hadoop Streaming"
  * (hadoop-tools/hadoop-streaming/.../StreamJob.java, PipeMapper.java:89,
  * PipeReducer.java:82, PipeMapRed.java): fork a user executable per
  * task, feed records as `key<sep>value` lines on stdin, parse stdout
  * lines back into records.
  *
  * Built on `RDD.pipe` (Spark's native fork/exec operator — one child
  * process per partition, streaming both directions, so memory stays
  * O(pipe buffer) regardless of partition size).
  *
  *  - map-side (`pipeMap`): no shuffle at all.
  *  - reduce-side (`pipeReduce`): `repartition(key)` +
  *    `sortWithinPartitions(key, …)` first, so every key group arrives
  *    contiguous on the child's stdin — the PipeReducer contract —
  *    with exactly one shuffle.
  */
object Pipe {

  /** Pipe selected columns (tab-joined by default) through `cmd`;
    * result is one string column `line` per stdout line. */
  def pipeMap(df: DataFrame, cmd: Seq[String],
              cols: Seq[Column] = Nil, sep: String = "\t",
              env: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val selected = if (cols.isEmpty) df.columns.toSeq.map(col) else cols
    // concat_ws silently DROPS null fields, shifting the record layout;
    // nulls must serialize as empty fields so the child sees a stable
    // column count (the reference always emits one separator per field)
    val fields = selected.map(c => coalesce(c.cast("string"), lit("")))
    val lines = df.select(concat_ws(sep, fields: _*).as("line"))
      .as[String]
    lines.rdd.pipe(cmd, env).toDF("line")
  }

  /** Reduce-side pipe: co-locate and sort by `keyCols` (plus
    * `sortCols`) before forking, so the child sees each key group
    * contiguously, mirroring PipeReducer.java:82. */
  def pipeReduce(df: DataFrame, cmd: Seq[String],
                 keyCols: Seq[String], sortCols: Seq[Column] = Nil,
                 numPartitions: Int = 32, sep: String = "\t",
                 env: Map[String, String] = Map.empty): DataFrame = {
    val arranged = df
      .repartition(numPartitions, keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col) ++ sortCols: _*)
    pipeMap(arranged, cmd, Nil, sep, env)
  }

  /** Parse piped `line` output back into (key, value) on first `sep`,
    * the KeyValueTextInputFormat convention
    * (.../lib/input/KeyValueTextInputFormat.java:47). */
  def parseKV(lines: DataFrame, sep: String = "\t"): DataFrame = {
    val p = java.util.regex.Pattern.quote(sep)
    lines.select(
      split(col("line"), p, 2).getItem(0).as("key"),
      coalesce(get(split(col("line"), p, 2), lit(1)), lit("")).as("value"))
  }

  /** Typed pipe framing — the modern stand-in for Hadoop Streaming's
    * typed-bytes protocol (hadoop-tools/hadoop-streaming/.../typedbytes/
    * Type.java:24-43, TypedBytesInput.java): instead of a binary
    * tag-length-value stream, each record crosses the pipe as ONE
    * JSON-LINES object, so the child sees types (numbers, booleans,
    * nulls, nested arrays/structs) rather than pre-flattened tab text,
    * and tab/newline-bearing strings survive (JSON escapes them — the
    * tab-joined line idiom's documented corruption case).
    *
    * `to_json` emits one `{"col": value, …}` object per row; any tool
    * that speaks JSON-lines (jq, python, a streaming model scorer) is a
    * valid child. */
  def pipeMapJson(df: DataFrame, cmd: Seq[String],
                  env: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("line")).as[String]
    lines.rdd.pipe(cmd, env).toDF("line")
  }

  /** Parse a JSON-lines pipe output back into typed columns against an
    * explicit schema — the read side of [[pipeMapJson]]'s framing.
    * Rows the child emits that don't parse become null columns
    * (from_json semantics), mirroring typed-bytes' lenient reader. */
  def parseJson(lines: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame =
    lines.select(from_json(col("line"), schema).as("r")).select(col("r.*"))

  /** Binary pipe with the real typed-bytes wire format
    * (hadoop-tools/hadoop-streaming/.../typedbytes/TypedBytesInput.java,
    * `-io typedbytes`): each input row crosses the child's stdin as one
    * typed-bytes VECTOR; the child's stdout is parsed as a stream of
    * typed-bytes records coerced to `outSchema`. See [[TypedBytes]] for
    * the wire spec. Unlike the line pipes above this carries types,
    * nested arrays/maps/structs and raw binary — nothing is flattened
    * to text, and separator-bearing strings can't corrupt framing.
    *
    * One child per non-empty partition, a writer thread feeding stdin
    * while the task thread streams stdout — memory O(pipe buffer), the
    * same posture as `RDD.pipe`. A non-zero child exit fails the task
    * (PipeMapRed.java's waitOutputThreads contract).
    */
  def pipeTypedBytes(df: DataFrame, cmd: Seq[String],
                     outSchema: org.apache.spark.sql.types.StructType,
                     env: Map[String, String] = Map.empty): DataFrame =
    pipeFramed(df, cmd, outSchema, env, "typed-bytes")(
      TypedBytes.writeRow, TypedBytes.readRow(_, outSchema))

  /** Binary pipe with the RAW length-prefixed framing (`-io rawbytes`,
    * hadoop-tools/hadoop-streaming/.../io/RawBytesInputWriter.java:30,
    * RawBytesOutputReader.java): each record crosses the pipe as
    * `[4-byte big-endian length][bytes]` for the key then the value —
    * no type tags at all, the child sees exactly the payload bytes.
    * This is the framing a binary mapper over opaque payloads (images,
    * packed features — the multimodal case) speaks: unlike the text
    * pipes nothing is escaped or flattened, and unlike typed-bytes the
    * child needs no protocol library, just read-length/read-bytes.
    *
    * Input: the first two columns, cast to binary. Output: (key,
    * value) binary columns parsed with the same framing. Null cells
    * write as zero-length (BytesWritable has no null either). Process
    * management — writer thread, early-stdin-close tolerance, child
    * exit checks — is [[pipeTypedBytes]]'s, shared via `pipeFramed`. */
  def pipeRawBytes(df: DataFrame, cmd: Seq[String],
                   env: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.types._
    require(df.schema.length >= 2,
      s"pipeRawBytes: need key and value columns, got ${df.schema.fieldNames.mkString(", ")}")
    val Seq(k, v) = df.columns.take(2).toSeq
    val in = df.select(coalesce(col(k).cast("binary"), lit(Array.empty[Byte])).as("key"),
      coalesce(col(v).cast("binary"), lit(Array.empty[Byte])).as("value"))
    val outSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType)))
    def writeBlob(os: java.io.DataOutputStream, b: Array[Byte]): Unit = {
      os.writeInt(b.length); os.write(b)
    }
    def readBlob(is: java.io.DataInputStream): Array[Byte] = {
      val b = new Array[Byte](is.readInt()); is.readFully(b); b
    }
    pipeFramed(in, cmd, outSchema, env, "rawbytes")(
      (os, r) => {
        writeBlob(os, r.getAs[Array[Byte]](0)); writeBlob(os, r.getAs[Array[Byte]](1))
      },
      is => {
        // clean EOF is only legal BEFORE a record's key length; a
        // truncated record (EOF mid-frame, including inside the key's
        // own payload) propagates as the error it is
        val len = try Some(is.readInt()) catch { case _: java.io.EOFException => None }
        len.map { n =>
          val kb = new Array[Byte](n); is.readFully(kb)
          org.apache.spark.sql.Row(kb, readBlob(is))
        }
      })
  }

  /** Shared child-process scaffold for the binary pipe framings: one
    * child per non-empty partition, a writer thread feeding stdin
    * while the task thread streams stdout — memory O(pipe buffer), the
    * same posture as `RDD.pipe`. A non-zero child exit fails the task
    * (PipeMapRed.java's waitOutputThreads contract). */
  private def pipeFramed(df: DataFrame, cmd: Seq[String],
                         outSchema: org.apache.spark.sql.types.StructType,
                         env: Map[String, String], proto: String)(
      writeRow: (java.io.DataOutputStream, org.apache.spark.sql.Row) => Unit,
      readRow: java.io.DataInputStream => Option[org.apache.spark.sql.Row]): DataFrame = {
    import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
    val spark = df.sparkSession
    val out = df.rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pb = new ProcessBuilder(cmd: _*)
        val pe = pb.environment(); env.foreach { case (k, v) => pe.put(k, v) }
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val proc = pb.start()
        // if the task dies or stops early (limit/take, downstream
        // failure, kill), reap the child and unblock the writer — the
        // same completion hook PipedRDD registers
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => proc.destroy())
        @volatile var writeErr: Throwable = null
        val writer = new Thread(() => {
          // upstream expressions evaluate on THIS thread while it pulls
          // `it`; they need the task's thread-locals (see
          // TaskContextBridge)
          if (tc != null) org.apache.spark.graft.TaskContextBridge.set(tc)
          val os = new DataOutputStream(new BufferedOutputStream(proc.getOutputStream, 1 << 16))
          try { it.foreach(writeRow(os, _)); os.flush() }
          catch { case t: Throwable => writeErr = t }
          finally { try os.close() catch { case _: Throwable => () } }
        }, s"$proto-stdin-writer")
        writer.setDaemon(true)
        writer.start()
        val is = new DataInputStream(new BufferedInputStream(proc.getInputStream, 1 << 16))
        new Iterator[org.apache.spark.sql.Row] {
          private var nextRow = readRow(is)
          override def hasNext: Boolean = nextRow.isDefined || { finish(); false }
          override def next(): org.apache.spark.sql.Row = {
            val r = nextRow.get
            nextRow = readRow(is)
            r
          }
          private def finish(): Unit = {
            writer.join()
            val code = proc.waitFor()
            // an UPSTREAM failure on the writer thread must fail the
            // task even when the child exited 0 — otherwise a crashed
            // input silently truncates the output. The one tolerated
            // case: the child closed stdin early on purpose (broken
            // pipe, e.g. `head`) and still exited clean.
            val earlyStdinClose =
              writeErr.isInstanceOf[java.io.IOException] && code == 0
            if (writeErr != null && !earlyStdinClose)
              throw new java.io.IOException(
                s"$proto upstream failed while feeding ${cmd.head}", writeErr)
            if (code != 0)
              throw new java.io.IOException(s"$proto child ${cmd.head} exited with $code")
          }
        }
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
