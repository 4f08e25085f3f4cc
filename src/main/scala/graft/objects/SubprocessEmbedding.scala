package graft.objects

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.collection.concurrent.TrieMap

/** Model-backed embedding via an external encoder PROCESS — the adapter
  * that takes the object pipeline beyond hash stubs without shipping a
  * model runtime in this library (reference analogue: the model-backed
  * embeddings under embeddings/ — sentence_transformers_embedding.py loads
  * a model once per worker in load(); here init() starts the encoder
  * process once per executor and every partition on that executor reuses
  * it).
  *
  * Protocol (line-oriented, deadlock-free by strict request/response):
  *   stdin:  one base64(UTF-8 text) line per object
  *   stdout: `dimensions` space-separated floats per line
  * Any command obeying it works — an ONNX runner, a python model server, a
  * GPU sidecar. The command is user-supplied and typically a vendored
  * script; the process is long-lived (model load cost paid once per
  * executor, not per task) and torn down with the executor JVM.
  *
  * At the 100 TB design point this is the right shape: embedding cost
  * dominates, so the model must live beside the data — one process per
  * executor, partitions streamed through it, no driver round-trips.
  */
class SubprocessEmbedding(
    command: Seq[String],
    val dimensions: Int,
    override val contentColumn: String = "text") extends ObjectEmbedding {

  override def init(): Unit = SubprocessEmbedding.ensure(command)

  override def embed(objects: Iterator[(Long, String)])
      : Iterator[(Long, Int, Array[Float])] = {
    val proc = SubprocessEmbedding.ensure(command)
    objects.map { case (id, text) =>
      val v = proc.encode(text)
      require(v.length == dimensions,
        s"graft: encoder emitted ${v.length} dims, expected $dimensions")
      (id, 0, v)
    }
  }
}

object SubprocessEmbedding {

  /** One live encoder per (executor JVM, command). Synchronized per process:
    * Spark task threads on one executor share the encoder sequentially —
    * parallelism comes from executors, matching the reference's
    * one-model-per-worker layout. */
  private val procs = TrieMap.empty[Seq[String], Encoder]

  /** Dead encoders are evicted so a Spark task RETRY restarts the process
    * instead of re-failing against the corpse. Creation is under a lock:
    * `TrieMap.getOrElseUpdate` may evaluate the thunk concurrently, and a
    * losing thread would have already spawned a full model process that
    * nothing ever uses or stops. */
  private[objects] def ensure(command: Seq[String]): Encoder = synchronized {
    procs.get(command).filter(_.alive).getOrElse {
      val e = new Encoder(command)
      procs.put(command, e)
      e
    }
  }

  // ONE shutdown hook for every encoder the JVM ever starts — a hook per
  // Encoder would accumulate (and retain dead encoders) across restarts of
  // a flaky command on a long-lived executor
  sys.addShutdownHook { procs.values.foreach(_.destroy()) }

  private[objects] final class Encoder(command: Seq[String]) {
    private val p = {
      val pb = new ProcessBuilder(command: _*)
      // stderr flows to the executor's own stderr (visible in task logs).
      // Leaving it an un-drained pipe would deadlock a chatty encoder: the
      // ~64 KB pipe buffer fills, the child blocks on its next stderr
      // write, and encode()'s readLine() below waits forever.
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      pb.start()
    }
    private val in = new BufferedWriter(
      new OutputStreamWriter(p.getOutputStream, StandardCharsets.UTF_8))
    private val out = new BufferedReader(
      new InputStreamReader(p.getInputStream, StandardCharsets.UTF_8))
    def alive: Boolean = p.isAlive

    private[SubprocessEmbedding] def destroy(): Unit = p.destroy()

    def encode(text: String): Array[Float] = synchronized {
      require(p.isAlive, s"graft: encoder process died: ${command.mkString(" ")}")
      in.write(Base64.getEncoder.encodeToString(
        text.getBytes(StandardCharsets.UTF_8)))
      in.newLine()
      in.flush()
      val line = out.readLine()
      require(line != null,
        s"graft: encoder closed stdout: ${command.mkString(" ")}")
      line.trim.split("\\s+").map(_.toFloat)
    }
  }
}
