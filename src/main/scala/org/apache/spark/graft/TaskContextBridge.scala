package org.apache.spark.graft

import org.apache.spark.TaskContext

/** Bridge to the `private[spark]` TaskContext setter. Spark's own
  * `PipedRDD` sets the task context on its stdin-writer thread before
  * consuming the parent iterator (core/.../rdd/PipedRDD.scala) —
  * upstream expressions evaluated during that consumption read
  * thread-local state (SQLConf, metrics, block manager callbacks)
  * keyed off `TaskContext.get`. `graft.ops.Pipe.pipeTypedBytes` forks
  * the same shape of writer thread and needs the same call; this is
  * the minimal exposure of it, nothing else from the internal API.
  */
object TaskContextBridge {
  def set(tc: TaskContext): Unit = TaskContext.setTaskContext(tc)
}
